package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IvfIndex, IvfPq, IvfSq}

/** The PQ serving tier: train per-subspace codebooks off a saved IVF
  * index, search in two stages (ADC coarse scan → shared exact rerank),
  * and the result must match the float tier wherever the shortlist
  * recovers the true candidates. */
class IvfPqSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private lazy val dirs: (String, String) = {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val raw = java.nio.file.Files.createTempDirectory("graft-pq-raw").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, e, nCells = 16, seed = 7L, nReplicas = 2), raw)
    val pq = java.nio.file.Files.createTempDirectory("graft-pq").toString
    IvfPq.trainTo(spark, raw, pq)
    (raw, pq)
  }

  test("trainTo derives a complete, cell-partitioned PQ layout") {
    val (raw, pq) = dirs
    val rawCells = spark.read.parquet(s"$raw/cells")
    val pqCells = spark.read.parquet(s"$pq/pqcells")
    assert(pqCells.count() == rawCells.count(), "1:1 with the raw index incl. replicas")
    // codes are one byte per SUBSPACE — the tier's whole point
    val dim = rawCells.select("embedding").head().getSeq[Float](0).length
    assert(pqCells.select("codes").head().getAs[Array[Byte]](0).length == IvfPq.NumSub)
    assert(IvfPq.NumSub < dim, "PQ codes must be smaller than the dimension")
    val cb = spark.read.parquet(s"$pq/codebooks")
    // a KMeans fit may drop an empty cluster, so per-subspace sizes can
    // land just under SubK — but every subspace must be present and usable
    val perSub = cb.groupBy("sub").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSub.keySet == (0 until IvfPq.NumSub).toSet)
    assert(perSub.values.forall(n => n >= 2 && n <= IvfPq.SubK), perSub.toString)
    assert(cb.select("centroid").head().getSeq[Double](0).length == dim / IvfPq.NumSub)
    // same coarse codebook: routing transfers between the tiers
    assert(spark.read.parquet(s"$pq/centroids").count() == 16)
    // residual anchors: a full-dimension mean for every PRIMARY cell any
    // member encodes against (cells holding only replica members carry
    // no anchor — nothing looks one up by a non-primary cell)
    val cmRows = spark.read.parquet(s"$pq/cellmeans")
    assert(cmRows.select("mean").head().getSeq[Double](0).length == dim)
    val anchored = cmRows.select("cell").collect().map(_.getLong(0)).toSet
    val referenced = pqCells.select("pcell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(referenced.subsetOf(anchored),
      s"pcells without an anchor: ${referenced.diff(anchored)}")
  }

  test("encode picks the nearest subspace centroid with lowest-code tie-break") {
    // 2 subspaces of 2 dims, 2 codes each, hand-checkable (encode takes
    // the RESIDUAL — the per-cell mean is already subtracted upstream)
    val cbs: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    assert(IvfPq.encode(cbs, 2, Array(0.1, 0.1, 0.1, 0.9)).toSeq == Seq[Byte](0, 1))
    assert(IvfPq.encode(cbs, 2, Array(0.9, 0.8, 0.9, 0.2)).toSeq == Seq[Byte](1, 0))
    // equidistant → lowest code wins (the oracle's (distance, code) order)
    assert(IvfPq.encode(cbs, 2, Array(0.5, 0.5, 0.5, 0.5)).toSeq == Seq[Byte](0, 0))
    // residual helper: double-widened elementwise subtraction
    assert(IvfPq.residual(Array(1.5f, -0.5f), Array(0.5, 0.5)).toSeq == Seq(1.0, -1.0))
  }

  test("two-stage search matches the float tier's top-k on a small batch") {
    val (raw, pq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 10)
    // PQ's 8-byte codes are far lossier than SQ8's per-dimension codes on
    // UNIFORM embeddings (quantization error is a constant fraction of
    // every distance when all pairs are near-equidistant), so unlike the
    // SQ spec this does NOT assert set equality — it pins the two
    // invariants the two-stage contract guarantees at ANY fidelity:
    //   1. DOMINANCE: the rerank is exact cosine over the shortlist, so
    //      PQ's rank-j score can never EXCEED the float tier's rank-j
    //      (a violation would mean the rerank is not exact);
    //   2. RECALL: a 128-wide shortlist recovers most of the float top-3
    //      even on this worst-case data.
    def byQuery(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), (Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val got = byQuery(IvfPq.searchTopK(spark, pq, raw, batch, k = 3,
      nProbe = 8, shortlist = 128))
    val float = byQuery(IvfIndex.searchTopK(spark,
      IvfIndex.load(spark, raw), batch, k = 3, nProbe = 8))
    assert(got.keySet == float.keySet, "every query answers all 3 ranks")
    float.foreach { case (key, (fid, fcos)) =>
      val (gid, gcos) = got(key)
      assert(gcos <= fcos + 1e-9, s"$key: pq $gcos beats exact-tier $fcos")
      if (gid == fid) assert(math.abs(gcos - fcos) < 1e-9, s"$key: same id, different cos")
    }
    val recall = float.count { case (key, (fid, _)) =>
      got.exists { case ((q, _), (gid, _)) => q == key._1 && gid == fid }
    }.toDouble / float.size
    assert(recall >= 0.8, s"recall@3 vs float tier = $recall")
  }

  test("searchTopKSweep reproduces every per-shortlist serve from ONE ADC pass") {
    val (raw, pq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 10)
    val sweep = IvfPq.searchTopKSweep(spark, pq, raw, batch,
      shortlists = Seq(3, 6, 12), k = 3, nProbe = 8)
      .collect().map(_.toSeq).toSet
    val perPoint = Seq(3, 6, 12).flatMap { sl =>
      IvfPq.searchTopK(spark, pq, raw, batch, k = 3, nProbe = 8,
        shortlist = sl).collect().map(r => sl.toLong +: r.toSeq)
    }.toSet
    assert(sweep == perPoint,
      s"sweep=${sweep.size} perPoint=${perPoint.size} diff=${(sweep diff perPoint).take(3)}")
  }

  test("oversized serving batches fail fast on the shared candidate budget") {
    val (raw, pq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val ex = intercept[IllegalArgumentException] {
      IvfPq.searchTopK(spark, pq, raw, e, k = 3, nProbe = 8,
        shortlist = 12, maxCandidates = 10).count()
    }
    assert(ex.getMessage.contains("maxCandidates=10") &&
      ex.getMessage.contains("SMALL-BATCH"), ex.getMessage)
  }

  test("clustered data: recall@3 vs the float tier climbs with shortlist headroom") {
    import spark.implicits._
    // mixture-of-Gaussians, the IvfSqSpec fixture: tight clusters stress
    // the ADC scan with many near-ties inside one cell — PQ's hard case,
    // since within-cluster members share most code bytes
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
    val raw = java.nio.file.Files.createTempDirectory("graft-pq-clustered-raw").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, emb, nCells = 8, seed = 3L, nReplicas = 2), raw)
    val pq = java.nio.file.Files.createTempDirectory("graft-pq-clustered").toString
    IvfPq.trainTo(spark, raw, pq)

    val batch = emb.filter(col("vec_id") < 30)
    val k = 3
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("vec_id").cast("long"), col("nn_id").cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => (q, rs.map(_.getLong(1)).toSet) }
    val floatTop = topSets(IvfIndex.searchTopK(spark, IvfIndex.load(spark, raw),
      batch, k = k, nProbe = 4))
    def recallAt(shortlist: Int): Double = {
      val pqTop = topSets(IvfPq.searchTopK(spark, pq, raw, batch, k = k,
        nProbe = 4, shortlist = shortlist))
      floatTop.map { case (q, f) =>
        (pqTop.getOrElse(q, Set.empty) & f).size.toDouble / f.size
      }.sum / floatTop.size
    }
    // Within-cluster neighbors differ only by noise, which RAW-vector
    // codes quantize away (measured 0.40/0.61/0.89/1.00 at 4k/8k/16k/32k
    // here); primary-cell residual encoding spends the codebook entirely
    // on that difference and lifts the same curve to measured
    // 0.57 / 0.82 / 0.98 / 1.00 (NOTES). The spec pins the KNOB, not one
    // point: the curve must rise monotonically and reach ≥0.95 by 32k.
    val rs = Seq(12, 24, 48, 96).map(s => s -> recallAt(s))
    assert(rs.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"recall must grow with shortlist: $rs")
    assert(rs.last._2 >= 0.95, s"recall curve: $rs")
  }

  test("the PQ coarse scan partition-prunes like the SQ tier") {
    val (raw, pq) = dirs
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") < 3)
    val result = IvfPq.searchTopK(spark, pq, raw, batch, k = 3, nProbe = 2,
      shortlist = 12)
    val plan = result.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "pqcells scan must carry a cell partition filter")
  }

  test("PQ codes are 8x smaller than SQ8 codes on disk metadata") {
    val (raw, pq) = dirs
    val sq = java.nio.file.Files.createTempDirectory("graft-pq-vs-sq").toString
    IvfSq.quantizeTo(spark, raw, sq)
    val dim = spark.read.parquet(s"$raw/cells")
      .select("embedding").head().getSeq[Float](0).length
    val sqBytes = spark.read.parquet(s"$sq/sqcells")
      .select("codes").head().getAs[Array[Byte]](0).length
    val pqBytes = spark.read.parquet(s"$pq/pqcells")
      .select("codes").head().getAs[Array[Byte]](0).length
    assert(sqBytes == dim && pqBytes == IvfPq.NumSub)
    assert(sqBytes / pqBytes == dim / IvfPq.NumSub,
      s"per-vector code payload: sq=$sqBytes pq=$pqBytes")
  }
}
