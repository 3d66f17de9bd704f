package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-4 training-data operators (q74
  * embedding dedup, q75 chunking, q76 packing) — value-level certification
  * is the DuckDB oracle; these pin the semantic shape at sf0.001. */
class TrainingDataOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("q74: embedding dedup components match brute-force union-find over >=0.4 cosine pairs") {
    // exhaustive truth: all-pairs cosine in-test, then driver-side union-find
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inPairs = scala.collection.mutable.Set.empty[Long]
    for (i <- vecs.indices; j <- (i + 1) until vecs.length)
      if (cos(vecs(i)._2, vecs(j)._2) >= 0.4) {
        union(vecs(i)._1, vecs(j)._1)
        inPairs += vecs(i)._1; inPairs += vecs(j)._1
      }
    val truth = inPairs.map(v => v -> find(v)).toMap
    val got = ops.Similarity.q74EmbedDedup(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty, "test embeddings should produce >=0.4 pairs")
    assert(got == truth)
  }

  test("q75: chunk grid covers every token exactly on the 48-stride, 64-window contract") {
    val chunks = ops.TextOps.q75Chunk(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    val nTokens = Tables.documents(spark, sf)
      .select(col("doc_id"), functions.TextFns.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == nTokens.keySet)
    chunks.foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = nTokens(doc)
      // starts are exactly 1, 49, 97, ... up to n
      assert(sorted.map(_._2).toSeq == (1 to n by 48).toSeq, s"doc $doc chunk grid")
      // each chunk takes 64 tokens or whatever remains (stride 48 < window
      // 64 means the last TWO chunks can both be truncated)
      sorted.foreach { case (_, start, len) =>
        assert(len == math.min(64, n - start + 1), s"doc $doc chunk at $start")
      }
      val (_, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen - 1 == n, s"doc $doc last chunk must end at token $n")
    }
  }

  test("q79 composition: planted exact clones and near-dups get the right disposition") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 8 // 8 tokens x 8
    val docs = Seq(
      (1L, base, base.trim.length),                        // kept (canonical)
      (2L, base, base.trim.length),                        // exact clone of 1 -> dup_exact
      (3L, base + "iota", base.length + 4),                // near-dup of 1 -> dup_fuzzy
      (4L, "tiny", 4),                                     // low_quality
      (5L, ("omega psi chi phi upsilon tau sigma rho " * 8).trim,
        ("omega psi chi phi upsilon tau sigma rho " * 8).trim.length) // kept
    ).toDF("doc_id", "text", "n_chars")
    val got = ops.Dedup.cleanCorpus(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "kept", 2L -> "dup_exact", 3L -> "dup_fuzzy",
      4L -> "low_quality", 5L -> "kept"))
  }

  test("q80: approx percentiles stay within 5% relative error of the exact q72") {
    val exact = ops.Relational.q72Percentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = ops.Relational.q80ApproxPercentiles(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (lang, (p50, p90)) =>
      val (e50, e90) = exact(lang)
      assert(math.abs(p50 - e50).toDouble / e50 <= 0.05, s"$lang p50 $p50 vs $e50")
      assert(math.abs(p90 - e90).toDouble / e90 <= 0.05, s"$lang p90 $p90 vs $e90")
    }
  }

  test("q76: bins are contiguous per source, conserve tokens/docs, and respect the 512 budget grid") {
    val bins = ops.TextOps.q76Pack(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val totals = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(functions.TextFns.tokenCount(col("text")).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bins.keySet == totals.keySet)
    bins.foreach { case (src, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong).toSeq,
        s"source $src bins must be contiguous from 0")
      assert(sorted.map(_._3).sum == totals(src)._1, s"source $src doc conservation")
      assert(sorted.map(_._4).sum == totals(src)._2, s"source $src token conservation")
      // bin b>0 starts only after the prior bins crossed the b*512 boundary
      var cum = 0L
      sorted.foreach { case (_, b, _, toks) =>
        if (b > 0) assert(cum >= b * 512, s"source $src bin $b opened early at cum=$cum")
        cum += toks
      }
    }
  }
}
