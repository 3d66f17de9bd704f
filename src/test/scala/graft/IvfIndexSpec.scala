package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IvfIndex

/** The persistable IVF index (M8 deployment shape): build → save → load →
  * search must reproduce the in-memory search exactly, and the index files
  * are plain Parquet any session can read. */
class IvfIndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("saved and reloaded index serves identical search results") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val built = IvfIndex.build(spark, e, nCells = 16, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.save(spark, built, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.length == built.centroids.length)
    assert(loaded.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    val a = IvfIndex.searchTop1(spark, built, e, nProbe = 4)
      .collect().map(_.toSeq).toSet
    val b = IvfIndex.searchTop1(spark, loaded, e, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // every query found a neighbor (probes include the query's own cell)
    assert(a.size == e.count())
  }

  test("cell assignment covers every vector exactly once") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val idx = IvfIndex.build(spark, e, nCells = 16, seed = 7L)
    assert(idx.cells.count() == e.count())
    assert(idx.cells.select("vec_id").distinct().count() == e.count())
    val cellIds = idx.cells.select("cell").distinct()
      .collect().map(_.getLong(0))
    assert(cellIds.forall(c => c >= 0 && c < 16))
  }

  test("search on a loaded index partition-prunes to the probed cells") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val built = IvfIndex.build(spark, e, nCells = 16, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-prune").toString
    IvfIndex.save(spark, built, dir)
    val loaded = IvfIndex.load(spark, dir)
    val batch = e.filter(col("vec_id") < 3)
    val result = IvfIndex.searchTop1(spark, loaded, batch, nProbe = 2)
    val plan = result.queryExecution.executedPlan.toString
    // the cells scan must carry a non-empty partition filter on cell —
    // the layout contract that keeps a small batch from reading the index
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"expected a partition filter on cell in:\n$plan")
    // pruning must not change answers: same results as the in-memory index
    val unpruned = IvfIndex.searchTop1(spark, built, batch, nProbe = 2)
      .collect().map(_.toSeq).toSet
    assert(result.collect().map(_.toSeq).toSet == unpruned && unpruned.nonEmpty)
  }

  test("append routes new vectors into the saved layout; search serves them") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-append").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, e.filter(col("vec_id") % 2 === 0), nCells = 16, seed = 7L), dir)
    IvfIndex.append(spark, dir, e.filter(col("vec_id") % 2 === 1))
    val idx = IvfIndex.load(spark, dir)
    assert(idx.cells.count() == e.count())
    // appended vectors serve exactly like built ones: an exact copy of an
    // appended vector (fresh query id, so self-exclusion doesn't bite)
    // must come back with cosine 1 — same routing, same probed cells
    val queries = e.filter(col("vec_id") % 2 === 1 && col("vec_id") < 10)
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id + 1000000L, v) }.toDF("vec_id", "embedding")
    val got = IvfIndex.searchTop1(spark, idx, queries, nProbe = 4).collect()
    assert(got.length == 5)
    got.foreach(r => assert(r.getDouble(2) == 1.0, s"expected cos 1.0: $r"))
  }

  test("compactTo collapses append residue to one file per cell; search unchanged") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-compact").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, e.filter(col("vec_id") < 200), nCells = 8, seed = 7L), dir)
    IvfIndex.append(spark, dir, e.filter(col("vec_id").between(200, 349)))
    IvfIndex.append(spark, dir, e.filter(col("vec_id") >= 350))
    def filesPerCell(d: String): Map[String, Int] =
      new java.io.File(s"$d/cells").listFiles().filter(_.getName.startsWith("cell=")).map { cd =>
        cd.getName -> cd.listFiles().count(_.getName.endsWith(".parquet"))
      }.toMap
    assert(filesPerCell(dir).values.exists(_ > 1), "appends should leave multiple files")
    val dest = java.nio.file.Files.createTempDirectory("graft-ivf-compacted").toString
    IvfIndex.compactTo(spark, dir, dest)
    val after = filesPerCell(dest)
    assert(after.nonEmpty && after.values.forall(_ == 1), s"expected one file per cell: $after")
    // equivalence: identical search results from the compacted layout
    val q = e.filter(col("vec_id") < 20)
    val a = IvfIndex.searchTop1(spark, IvfIndex.load(spark, dir), q, nProbe = 4)
      .collect().map(_.toSeq).toSet
    val b = IvfIndex.searchTop1(spark, IvfIndex.load(spark, dest), q, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("searchThreshold: a dense query's match set never piles into one task-local map") {
    import spark.implicits._
    // adversarial shape for a threshold search: EVERY member is over the
    // threshold for one query (a benchmark item parked in a dense region /
    // a low threshold). The replica collapse must be a (query, member)
    // hash aggregate — per-group state one double — not a per-query group
    // holding the whole match set in memory.
    val rnd = new scala.util.Random(42)
    val dim = 8
    val base = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val members = (0 until 4000).map { i =>
      // tight jitter around one direction: all cosines stay near 1
      (i.toLong, base.map(x => x + (rnd.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
    // nReplicas = 2: every member sits in two cells, so probing several
    // cells reaches most members twice — the collapse is actually exercised
    val idx = IvfIndex.build(spark, members, nCells = 4, seed = 7L, nReplicas = 2)
    val query = Seq((999999L, base)).toDF("vec_id", "embedding")
    val hits = IvfIndex.searchThreshold(spark, idx, query, minCos = 0.5,
      nProbe = 4, excludeSelf = false)
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"replica collapse must be a hash aggregate keyed by (query, member):\n$plan")
    val got = hits.collect()
    // full recall: every member clears the threshold and appears ONCE
    assert(got.length == 4000, s"expected 4000 distinct matches, got ${got.length}")
    assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 4000)
    assert(got.forall(_.getDouble(2) >= 0.5))
  }

  test("zero-norm vectors never crash or rank: NaN cosines are dropped") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 20L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() - 0.5f))) :+ ((99L, Array.fill(8)(0.0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val idx = IvfIndex.build(spark, emb, nCells = 4, seed = 7L)
    // cos with a zero-norm side is NaN: it must be dropped (searchTop1's >
    // comparison drops it; searchTopK's k-best insertion must too, or the
    // merge's BigDecimal rounding would throw on NaN)
    val topk = IvfIndex.searchTopK(spark, idx, emb, k = 3, nProbe = 4).collect()
    assert(topk.nonEmpty)
    assert(!topk.exists(_.getLong(2) == 99L), "zero member must never rank")
    assert(!topk.exists(_.getLong(0) == 99L), "zero query must emit no rows")
    val top1 = IvfIndex.searchTop1(spark, idx, emb, nProbe = 4).collect()
    assert(top1.nonEmpty)
    assert(!top1.exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L))
  }

  test("append uses the index's persisted replication factor") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-meta").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, e.filter(col("vec_id") < 250), nCells = 16, seed = 7L,
        nReplicas = 2), dir)
    assert(IvfIndex.load(spark, dir).nReplicas == 2)
    val batch = e.filter(col("vec_id").between(250, 259))
    IvfIndex.append(spark, dir, batch)
    // each appended vector got TWO cell rows — build-time replication, not
    // a caller-supplied default
    val appended = IvfIndex.load(spark, dir).cells
      .filter(col("vec_id").between(250, 259))
    assert(appended.count() == 2 * batch.count())
    assert(appended.select("vec_id", "cell").distinct().count() == 2 * batch.count())
  }

  test("multi-assignment places each vector in n distinct cells; search dedups") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val idx = IvfIndex.build(spark, e, nCells = 16, seed = 7L, nReplicas = 2)
    assert(idx.cells.count() == 2 * e.count())
    // the two replicas land in different cells
    assert(idx.cells.select("vec_id", "cell").distinct().count() == 2 * e.count())
    // a replicated candidate must surface once per query, not once per cell
    val got = IvfIndex.searchTop1(spark, idx, e, nProbe = 4)
    assert(got.count() == got.select("vec_id").distinct().count())
  }

  test("rebuildTo recenters a drifted codebook and recovers top-1 agreement") {
    import spark.implicits._
    val dim = 16
    val rnd = new scala.util.Random(19L)
    def cluster(center: Array[Double], n: Int, idBase: Long, noise: Double) =
      (0 until n).map { i =>
        (idBase + i, center.map(x => (x + rnd.nextGaussian() * noise).toFloat))
      }
    def unitDir(seedArr: Array[Double]) = {
      val n = math.sqrt(seedArr.map(x => x * x).sum); seedArr.map(_ / n * 10.0)
    }
    // build-time distribution: ONE region; the codebook's 4 cells all carve it
    val a0 = unitDir(Array.fill(dim)(rnd.nextGaussian()))
    val seedSet = cluster(a0, 100, 0L, 0.5)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-drift").toString
    IvfIndex.save(spark,
      IvfIndex.build(spark, seedSet.toDF("vec_id", "embedding"), nCells = 4, seed = 5L),
      dir)
    // drifted appends: FOUR tight clusters centered on the MIDPOINTS
    // between pairs of stale centroids — i.e. ON the Voronoi boundaries
    // of the build-time codebook. A far-away cluster would land whole in
    // one stale cell (recall unharmed — the codebook only partitions
    // space); drift hurts exactly when new mass STRADDLES a stale
    // boundary, splitting true neighbors across two cells that nProbe=1
    // never probes together.
    val stale = IvfIndex.load(spark, dir).centroids
    val driftPairs = Seq((0, 1), (2, 3), (0, 2), (1, 3))
    val drifted = driftPairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val mid = unitDir(stale(a).zip(stale(b)).map { case (x, y) => x + y })
      cluster(mid, 75, 1000L + i * 100, 0.05)
    }
    IvfIndex.append(spark, dir, drifted.toSeq.toDF("vec_id", "embedding"))

    // exact top-1 (brute force in the test) over the full indexed corpus
    val all = (seedSet ++ drifted).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = drifted.filter(_._1 % 25 == 0) // 12 drifted probes
    def exactTop1(q: (Long, Array[Float])): Long =
      all.filter(_._1 != q._1)
        .map { case (id, v) => (id, cos(q._2, v)) }
        .maxBy { case (id, c) => (c, -id) }._1
    def agreement(d: String): Double = {
      val got = IvfIndex.searchTop1(spark, IvfIndex.load(spark, d),
          queries.toSeq.toDF("vec_id", "embedding"), nProbe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      queries.count(q => got.get(q._1).contains(exactTop1(q))).toDouble / queries.size
    }
    val before = agreement(dir)
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-ivf-rebuilt").toString
    IvfIndex.rebuildTo(spark, dir, rebuilt)
    val after = agreement(rebuilt)
    assert(after > before,
      s"rebuild must recover drift-degraded agreement: before=$before after=$after")
    assert(after >= 0.9, s"rebuilt codebook should align cells to the data: $after")
    // rebuild preserves contents and replication exactly
    val src = IvfIndex.load(spark, dir); val dst = IvfIndex.load(spark, rebuilt)
    assert(dst.nReplicas == src.nReplicas)
    assert(dst.cells.select("vec_id").distinct().count() ==
      src.cells.select("vec_id").distinct().count())
  }
}
