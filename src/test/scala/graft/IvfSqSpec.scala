package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, IvfSq}

/** The SQ8 serving tier: quantize a saved IVF index, search in two stages
  * (quantized coarse scan → exact rerank), and the result must match the
  * float tier wherever the shortlist recovers the true candidates. */
class IvfSqSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private lazy val dirs: (String, String) = {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val raw = java.nio.file.Files.createTempDirectory("graft-sq-raw").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, e, nCells = 16, seed = 7L, nReplicas = 2), raw)
    val sq = java.nio.file.Files.createTempDirectory("graft-sq").toString
    IvfSq.quantizeTo(spark, raw, sq)
    (raw, sq)
  }

  test("quantizeTo derives a complete, cell-partitioned SQ layout") {
    val (raw, sq) = dirs
    val rawCells = spark.read.parquet(s"$raw/cells")
    val sqCells = spark.read.parquet(s"$sq/sqcells")
    assert(sqCells.count() == rawCells.count(), "1:1 with the raw index incl. replicas")
    // codes are one byte per dimension; bounds are per-vector floats
    val r = sqCells.select("codes", "vmin", "vmax").head()
    assert(r.getAs[Array[Byte]](0).length ==
      rawCells.select("embedding").head().getSeq[Float](0).length)
    assert(r.getDouble(1) <= r.getDouble(2))
    // same codebook: routing transfers between the tiers
    assert(spark.read.parquet(s"$sq/centroids").count() == 16)
    val perCell = new java.io.File(s"$sq/sqcells").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.listFiles()
        .count(_.getName.endsWith(".parquet")))
    assert(perCell.nonEmpty && perCell.forall(_ == 1), "one file per cell")
  }

  test("quantize kernel matches the q70 affine-floor contract") {
    val v = Array(0.1f, -0.3f, 0.7f, 0.0f)
    val (codes, vmin, vmax) = IvfSq.quantize(v)
    assert(vmin == -0.3f.toDouble && vmax == 0.7f.toDouble)
    val scale = 255.0 / (vmax - vmin)
    v.indices.foreach { i =>
      assert((codes(i) & 0xff) == math.floor((v(i).toDouble - vmin) * scale).toInt)
    }
    // constant vector: zero codes, decode reproduces the constant
    val (cz, zmin, zmax) = IvfSq.quantize(Array(0.5f, 0.5f))
    assert(cz.forall(_ == 0) && zmin == zmax)
  }

  test("two-stage search matches the float tier's top-k on a small batch") {
    val (raw, sq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 10)
    val got = IvfSq.searchTopK(spark, sq, raw, batch, k = 3, nProbe = 8,
      shortlist = 12).collect().map(_.toSeq).toSet
    val float = IvfIndex.searchTopK(spark, IvfIndex.load(spark, raw), batch,
      k = 3, nProbe = 8).collect().map(_.toSeq).toSet
    // rerank is exact cosine over the shortlist: wherever the quantized
    // shortlist contains the float tier's top-3 (it does at 4x headroom on
    // this data), the ranked answers are IDENTICAL
    assert(got == float, s"sq=${got.size} float=${float.size}")
  }

  test("searchTopKSweep reproduces every per-shortlist serve from ONE coarse pass") {
    val (raw, sq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 10)
    val sweep = IvfSq.searchTopKSweep(spark, sq, raw, batch,
      shortlists = Seq(3, 6, 12), k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet
    // the claim the sweep rests on: cutting the max-shortlist scored set
    // at rank ≤ s IS the shortlist-s serve — row-for-row, including rn
    // and the rounded exact cosine
    val perPoint = Seq(3, 6, 12).flatMap { sl =>
      IvfSq.searchTopK(spark, sq, raw, batch, k = 3, nProbe = 8,
        shortlist = sl).collect().map(r => sl.toLong +: r.toSeq)
    }.toSet
    assert(sweep == perPoint,
      s"sweep=${sweep.size} perPoint=${perPoint.size} diff=${(sweep diff perPoint).take(3)}")
  }

  test("oversized serving batches fail fast on the self-enforced candidate budget") {
    val (raw, sq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // the whole corpus as a "serving" batch with a deliberately tiny budget:
    // the collect bound must trip with the contract in the message, never
    // silently balloon the driver
    val ex = intercept[IllegalArgumentException] {
      IvfSq.searchTopK(spark, sq, raw, e, k = 3, nProbe = 8,
        shortlist = 12, maxCandidates = 10).count()
    }
    assert(ex.getMessage.contains("maxCandidates=10") &&
      ex.getMessage.contains("SMALL-BATCH"), ex.getMessage)
    // a genuinely small batch sails through the same budget
    assert(IvfSq.searchTopK(spark, sq, raw, e.filter(col("vec_id") < 2),
      k = 3, nProbe = 2, shortlist = 3, maxCandidates = 10).count() > 0)
  }

  test("clustered data: recall@3 vs the float tier clears the floor at 4k shortlist") {
    import spark.implicits._
    // mixture-of-Gaussians — the shape real embedding corpora have (the
    // uniform sf embeddings are the SQ tier's EASY case for agreement
    // because true neighbors are far apart; tight clusters stress the
    // quantized coarse scan with many near-ties inside one cell)
    val rnd = new scala.util.Random(7L)
    val centers = Array.fill(8) {
      val c = Array.fill(32)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n) * 8.0)
    }
    val emb = (0 until 600).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.25).toFloat))
    }.toDF("vec_id", "embedding")
    val raw = java.nio.file.Files.createTempDirectory("graft-sq-clustered-raw").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, emb, nCells = 8, seed = 3L, nReplicas = 2), raw)
    val sq = java.nio.file.Files.createTempDirectory("graft-sq-clustered").toString
    IvfSq.quantizeTo(spark, raw, sq)

    val batch = emb.filter(col("vec_id") < 30)
    val k = 3
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("vec_id").cast("long"), col("nn_id").cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }
    val sqTop = topSets(IvfSq.searchTopK(spark, sq, raw, batch, k = k,
      nProbe = 4, shortlist = 4 * k))
    val floatTop = topSets(IvfIndex.searchTopK(spark, IvfIndex.load(spark, raw),
      batch, k = k, nProbe = 4))
    val recall = floatTop.map { case (q, f) =>
      (sqTop.getOrElse(q, Set.empty) & f).size.toDouble / f.size
    }.sum / floatTop.size
    // floor documented in NOTES (shortlist-vs-recall trade): 4×k headroom
    // must recover ≥0.9 of the float tier's top-3 on clustered data
    assert(recall >= 0.9, s"recall@3 vs float tier = $recall")
  }

  test("the coarse scan partition-prunes and the rerank reads only the shortlist") {
    val (raw, sq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 3)
    val result = IvfSq.searchTopK(spark, sq, raw, batch, k = 3, nProbe = 2,
      shortlist = 12)
    val plan = result.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"raw rerank scan must partition-prune on cell:\n$plan")
    assert(plan.contains("In(vec_id") || plan.contains("vec_id IN"),
      s"rerank scan must push the shortlist id filter:\n$plan")
    assert(result.count() > 0)
  }
}
