package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sentence-embedding operator (SURVEY M1; reference
  * /root/reference/code/embeddings.py:60,113-123 — SentenceTransformer
  * all-MiniLM-L6-v2, batched encode, L2-normalized float32 output).
  *
  * Model inference is pluggable: the operator contract is
  * `Dataset[(id, text)] → DataFrame(id, embedding: Array[Float])` with
  * batched per-partition execution and unit-norm output. Offline (no model
  * runtime in this environment) the default encoder is a deterministic
  * feature-hashing embedder — same shape, same normalization invariant,
  * swappable for an ONNX/JNI session by replacing `encodeBatch` (the swap
  * point is the single ???-free function below; a real model loads once per
  * partition exactly where the comment marks it).
  *
  * Scale: mapPartitions is narrow — no shuffle; batch size bounds peak
  * memory exactly like the reference's adaptive batching
  * (embeddings.py:47-56); model state loads once per partition, not per row.
  */
object Embed {

  val Dim = 64

  /** Deterministic stand-in encoder: token feature-hashing into Dim buckets
    * with a sign hash, then L2 normalization — the classic hashing-trick
    * embedding. Replace this function (only) to plug a real model; it
    * receives a full batch so a model runtime can amortize per-call cost. */
  def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](Dim)
    val toks = Option(t).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)
    toks.foreach { tok =>
      val h = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
      val idx = math.floorMod(h, Dim)
      val sign = if (math.floorMod(h >> 16, 2) == 0) 1.0f else -1.0f
      v(idx) += sign
    }
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (n > 0) v.map(x => (x / n).toFloat) else v
  }

  /** The M1 operator: batched per-partition embedding. */
  def embed(ds: Dataset[(Long, String)], batchSize: Int = 256): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      // a real model is instantiated HERE, once per partition
      it.grouped(batchSize).flatMap { batch =>
        val vecs = encodeBatch(batch.map(_._2))
        batch.map(_._1).zip(vecs)
      }
    }.toDF("doc_id", "embedding")
  }

  /** Convenience: embed the documents table. The table feeds q49 AND the
    * topic pipeline, so it is computed ONCE per (session, dataset) and
    * PERSISTED AS PARQUET (the reference's memmap'd embedding matrix,
    * embeddings.py:82-87, and the same artifact contract as the q45 IVF /
    * q93 inverted index); every consumer serves from the scan. A pinned
    * `.cache()` here would hold a corpus-sized block set for the session's
    * life — at 100 TB the parquet artifact is the right shape (prunes
    * columns, evicts for free, survives executor loss). */
  def embedDocuments(spark: SparkSession, dir: String): DataFrame = {
    val p = graft.ops.SessionArtifacts.dir("embed", spark, dir) { t =>
      import spark.implicits._
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)]
      embed(docs).write.mode("overwrite").parquet(s"$t/embeddings")
    }
    spark.read.parquet(s"$p/embeddings")
  }
}
