package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Topics, TopicViz}

/** K6 visualization data tables: the five parquet exports behind the
  * reference's plotly reports (bertopicTest.py:125-189) — geometry checked
  * against first principles, not rendering. */
class TopicVizSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"
  private val k = 5

  test("pca2 recovers the dominant axes of an anisotropic point set") {
    // points spread along axis 0 (scale 10) and axis 1 (scale 3), noise-free
    val pts = (0 until 8).map { i =>
      val a = Array.fill(6)(0.0)
      a(0) = (i - 3.5) * 10.0
      a(1) = (if (i % 2 == 0) 1 else -1) * 3.0
      a
    }.toArray
    val (v1, v2) = TopicViz.pca2(pts)
    assert(math.abs(v1(0)) > 0.99, s"first component must be axis 0: ${v1.toSeq}")
    assert(math.abs(v2(1)) > 0.99, s"second component must be axis 1: ${v2.toSeq}")
    // orthonormal
    assert(math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) < 1e-6)
  }

  test("hierarchy is k-1 single-linkage merges ending in one cluster of k") {
    val m = Topics.fit(spark, sf, k)
    val merges = TopicViz.hierarchyMerges(m.centroids)
    assert(merges.length == k - 1)
    // distances non-negative; final merge holds every leaf
    merges.foreach { case (_, _, _, d, _) => assert(d >= 0.0 && d <= 2.0) }
    assert(merges.last._5 == k)
    // node ids: leaves 0..k-1, internal k+step, each used at most once
    val used = merges.flatMap(mg => Seq(mg._2, mg._3))
    assert(used.distinct.length == used.length)
    assert(used.forall(id => id >= 0 && id < 2 * k - 1))
  }

  test("heatmap is symmetric with a unit diagonal; q95 surface matches") {
    val m = Topics.fit(spark, sf, k)
    val hm = TopicViz.heatmap(spark, m).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(hm.size == k * k)
    (0 until k).foreach(t => assert(math.abs(hm((t, t)) - 1.0) < 1e-6))
    hm.foreach { case ((a, b), c) =>
      assert(math.abs(c - hm((b, a))) < 1e-12)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    // the q95 surface runs at the default k (its own fit memo entry)
    val defaultK = Topics.fit(spark, sf).centroids.length
    val q = SparkEntry.queries("q95_topic_heatmap")(spark, sf).collect()
    assert(q.length == defaultK * defaultK)
  }

  test("save writes the five data tables; doc_map covers every document") {
    val out = java.nio.file.Files.createTempDirectory("graft-viz").toString
    TopicViz.save(spark, sf, out, k)
    val topicMap = spark.read.parquet(s"$out/topic_map")
    assert(topicMap.count() == k)
    assert(topicMap.columns.toSet == Set("topic", "x", "y", "n_docs"))
    val docMap = spark.read.parquet(s"$out/doc_map")
    assert(docMap.count() == Tables.documents(spark, sf).count())
    // every doc lands at finite coordinates with its assigned topic
    assert(docMap.filter(col("x").isNull || col("y").isNull).count() == 0)
    assert(spark.read.parquet(s"$out/hierarchy").count() == k - 1)
    assert(spark.read.parquet(s"$out/heatmap").count() == k * k)
    assert(spark.read.parquet(s"$out/barchart").count() > 0)
  }
}
