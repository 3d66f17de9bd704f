package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable perceptual-hash index — the media twin of [[MinHashIndex]]
  * and the PRODUCTION shape of image near-dup at 100 TB: the corpus hash
  * table is computed once (decode + aHash, the expensive pass), stored as
  * plain Parquet, and every new ingest batch is matched AGAINST it without
  * re-decoding history — decode cost follows the ingest, never the corpus.
  *
  * Same construction as q139/q140 ([[Multimodal.imageAHash]]: per-pixel
  * bits ≤ 64 px, 8×8 average-pool above; [[Multimodal.phashBandScheme]]:
  * 4 exact bands at 16-bit, 3 exact bands + a ≤2-flip multi-probe query
  * side at 64-bit — generalized pigeonhole at the q229-priced radius 8),
  * so an index built today keeps matching batches hashed tomorrow, and
  * the recall guarantee (a within-radius pair always has a band the
  * probe variants cover) carries over unchanged.
  *
  * Scale shape: the index is (doc_id, ahash) — corpus-linear, 16 bytes a
  * row; query() is candidates (band equi-join, broadcast-able batch side)
  * → verify (`bit_count(xor)` on candidates only). Partition the saved
  * Parquet by band-bucket prefix for co-located candidate joins at
  * cluster scale. The streaming twin
  * ([[graft.streaming.Incremental.continuousMediaNearDup]]) probes each
  * micro-batch with the same band layout.
  */
object PhashIndex {

  /** Hash table (doc_id, ahash) for a (doc_id, media: binary) corpus —
    * undecodable blobs are dropped here (they have no perceptual
    * identity; the ingest quarantine flag lives on the q139 tier). */
  def build(media: DataFrame): DataFrame =
    Multimodal.imageAHash(media).filter(col("decoded"))
      .select(col("doc_id"), col("ahash"))

  /** Persist the index — with the same pointer-management guard as
    * [[MinHashIndex.save]]: a dir that generic Compaction has since
    * migrated must be re-saved through the pointer, or resolving
    * loaders would silently serve the stale pre-rebuild version. */
  def save(index: DataFrame, dir: String): Unit = {
    import graft.sources.SwapProtocol
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(index.sparkSession.sessionState.newHadoopConf())
    if (SwapProtocol.isPointerManaged(fs, dst))
      SwapProtocol.writePointed(fs, dst)(v => index.write.parquet(v.toString))
    else index.write.mode("overwrite").parquet(dir)
  }

  /** Load a saved index; resolves through
    * [[graft.sources.SwapProtocol.resolve]] so a dir maintained by
    * [[graft.sources.Compaction.compact]] loads transparently — a plain
    * dir resolves to itself. */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(graft.sources.SwapProtocol.resolve(spark, dir))

  /** Near-duplicate pairs between a NEW media batch (doc_id, media) and
    * the indexed corpus: (batch_id, corpus_id, hamming) with hamming ≤
    * `hamMax` — default: the lattice's own priced radius
    * ([[Multimodal.phashHamMax]]: 3 on 16-bit, 8 on the 64-bit pooled
    * lattice per q229). The BATCH side multi-probes
    * ([[Multimodal.withPhashProbes]]) against the index's exact band
    * rows, so recall is exact by the scheme's pigeonhole for any radius
    * up to the lattice default — a larger radius would need a wider
    * flip budget and must be an explicit scheme decision, not a silent
    * recall hole (the pre-lattice require, restored). Batch ids
    * matching their own corpus entry (re-ingest) are excluded by id
    * equality, the same excludeSelf discipline as the ANN serve. */
  def query(index: DataFrame, batch: DataFrame, hashBits: Int,
      hamMax: Int = -1): DataFrame = {
    // ONLY the documented sentinel (-1) selects the lattice default; any
    // other negative is a caller bug and fails loudly instead of silently
    // resolving to the default radius (r20 ADVICE)
    require(hamMax >= -1,
      s"hamMax=$hamMax: pass -1 for the lattice default or a radius >= 0")
    val radius = if (hamMax == -1) Multimodal.phashHamMax(hashBits) else hamMax
    require(radius <= Multimodal.phashHamMax(hashBits),
      s"hamming radius $radius exceeds the ${Multimodal.phashHamMax(hashBits)}" +
        s"-radius recall guarantee of the $hashBits-bit band scheme")
    // an ALREADY-cached index belongs to the CALLER (who loads once and
    // probes many batches — the module's whole point); unpersisting it
    // here would evict that shared cache after the first probe. An
    // uncached (derived) index is cached for the two reads below and
    // released — we clean up only what we cached.
    val indexWasCached = index.storageLevel.useMemory || index.storageLevel.useDisk
    val corpus = if (indexWasCached) index else index.cache()
    val fresh = build(batch).cache()
    val cand = Multimodal.withPhashProbes(fresh, hashBits)
      .select(col("doc_id").as("batch_id"), col("band"), col("bhash"))
      .join(Multimodal.withPhashBands(corpus, hashBits)
        .select(col("doc_id").as("corpus_id"), col("band"), col("bhash")),
        Seq("band", "bhash"))
      .filter(col("batch_id") =!= col("corpus_id"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    Caching.materializeAndRelease(
      cand
        .join(fresh.select(col("doc_id").as("batch_id"), col("ahash").as("ha")), Seq("batch_id"))
        .join(corpus.select(col("doc_id").as("corpus_id"), col("ahash").as("hb")), Seq("corpus_id"))
        .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= radius)
        .select(col("batch_id"), col("corpus_id"), col("hamming")),
      (Seq(fresh) ++ (if (indexWasCached) Nil else Seq(corpus))): _*)
  }
}
