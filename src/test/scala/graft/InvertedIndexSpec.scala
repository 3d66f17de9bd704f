package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.InvertedIndex

/** Persisted inverted index: parquet round trip, term-range layout, and
  * exact agreement with the inline q84 scorer. */
class InvertedIndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("indexed BM25 reproduces the inline scorer exactly from disk") {
    val dir = java.nio.file.Files.createTempDirectory("invidx-spec").toString
    InvertedIndex.build(spark, Tables.documents(spark, sf), dir)
    val fromIndex = InvertedIndex.searchBm25(spark, dir, Seq("spark", "join", "data"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inline = ops.Scoring.q84Bm25(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromIndex == inline)
    assert(fromIndex.size == 20)
  }

  test("postings files cover disjoint sorted term ranges (footer-prunable)") {
    val dir = java.nio.file.Files.createTempDirectory("invidx-layout").toString
    InvertedIndex.build(spark, Tables.documents(spark, sf), dir, nPostingFiles = 4)
    val files = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1, "fixture should produce multiple posting files")
    val ranges = files.map { f =>
      val terms = spark.read.parquet(f.getAbsolutePath)
        .select("term").collect().map(_.getString(0))
      assert(terms.sameElements(terms.sorted), s"${f.getName} not term-sorted")
      (terms.min, terms.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "term ranges overlap")
      case _ =>
    }
  }

  test("append equals a fresh build over the union corpus") {
    val docs = Tables.documents(spark, sf)
    val dirInc = java.nio.file.Files.createTempDirectory("invidx-append").toString
    InvertedIndex.build(spark, docs.filter(col("doc_id") % 2 === 0), dirInc)
    InvertedIndex.append(spark, docs.filter(col("doc_id") % 2 === 1), dirInc)
    val dirFull = java.nio.file.Files.createTempDirectory("invidx-full").toString
    InvertedIndex.build(spark, docs, dirFull)
    val terms = Seq("spark", "join", "data")
    val inc = InvertedIndex.searchBm25(spark, dirInc, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = InvertedIndex.searchBm25(spark, dirFull, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // postings are per-doc and stats recompute from the full doclens, so
    // incremental maintenance changes NOTHING about the served scores
    assert(inc == full && inc.nonEmpty)
  }

  test("generic Compaction restores the postings term-range layout after appends") {
    // append writes the batch's postings as new term-range files — correct
    // but accumulating; Compaction.compact keyed on term re-establishes
    // few files covering disjoint sorted term ranges, scores unchanged
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("invidx-resid").toString
    InvertedIndex.build(spark, docs.filter(col("doc_id") < 250), dir, nPostingFiles = 2)
    InvertedIndex.append(spark, docs.filter(col("doc_id") >= 250), dir, nPostingFiles = 2)
    val terms = Seq("spark", "join", "data")
    val before = InvertedIndex.searchBm25(spark, dir, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val dest = java.nio.file.Files.createTempDirectory("invidx-comp").toString
    graft.sources.Compaction.compact(spark, s"$dir/postings", s"$dest/postings", "term")
    graft.sources.Compaction.compact(spark, s"$dir/doclens", s"$dest/doclens", "doc_id")
    spark.read.parquet(s"$dir/stats").coalesce(1)
      .write.mode("overwrite").parquet(s"$dest/stats")
    def files(d: String): Int = // resolve: compaction output is pointer-published
      new java.io.File(graft.sources.Compaction.resolve(spark, d))
        .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files(s"$dir/postings") > files(s"$dest/postings"))
    val after = InvertedIndex.searchBm25(spark, dest, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before && after.nonEmpty)
  }

  test("InvertedIndex.compact maintains both accumulating tables in place with explicit retain (r19 verdict #7)") {
    // the routed maintenance entry: postings AND doclens compact in
    // place (pointer-published), scores unchanged, file count reduced,
    // and the retain contract holds at the site (retain=2 -> at most 2
    // committed versions per table after a second cycle)
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("invidx-maint").toString
    InvertedIndex.build(spark, docs.filter(col("doc_id") < 250), dir, nPostingFiles = 2)
    InvertedIndex.append(spark, docs.filter(col("doc_id") >= 250), dir, nPostingFiles = 2)
    val terms = Seq("spark", "join", "data")
    val before = InvertedIndex.searchBm25(spark, dir, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def files(d: String): Int =
      new java.io.File(graft.sources.Compaction.resolve(spark, d))
        .listFiles().count(_.getName.endsWith(".parquet"))
    val rawFiles = files(s"$dir/postings")
    InvertedIndex.compact(spark, dir, retain = 2)
    assert(files(s"$dir/postings") < rawFiles)
    assert(InvertedIndex.searchBm25(spark, dir, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == before)
    // second cycle: retention converges to the last 2 committed versions
    InvertedIndex.compact(spark, dir, retain = 2)
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("postings", "doclens").foreach { t =>
      val vs = graft.sources.SwapProtocol.versionDirs(
        f, new org.apache.hadoop.fs.Path(s"$dir/$t"))
      assert(vs.size <= 2, s"$t: retain=2 must bound the version set, got ${vs.size}")
    }
    assert(InvertedIndex.searchBm25(spark, dir, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == before)
  }

  test("append after IN-PLACE compaction lands in the live pointed dirs (r18 review)") {
    // Compaction.compact(dir, dir) migrates postings/doclens to pointer
    // management; a later append must write INTO the resolved live
    // version — an append to the literal plain path would be invisible
    // to the resolving searchBm25 (served scores silently missing the
    // appended docs)
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("invidx-ptr").toString
    InvertedIndex.build(spark, docs.filter(col("doc_id") < 250), dir)
    graft.sources.Compaction.compact(spark, s"$dir/postings", s"$dir/postings", "term")
    graft.sources.Compaction.compact(spark, s"$dir/doclens", s"$dir/doclens", "doc_id")
    InvertedIndex.append(spark, docs.filter(col("doc_id") >= 250), dir)
    val dirFull = java.nio.file.Files.createTempDirectory("invidx-ptr-full").toString
    InvertedIndex.build(spark, docs, dirFull)
    val terms = Seq("spark", "join", "data")
    val got = InvertedIndex.searchBm25(spark, dir, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = InvertedIndex.searchBm25(spark, dirFull, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want && got.nonEmpty,
      "appended docs must serve identically after in-place compaction")
  }

  test("search plan pushes the term filter to the postings scan") {
    val dir = java.nio.file.Files.createTempDirectory("invidx-plan").toString
    InvertedIndex.build(spark, Tables.documents(spark, sf), dir)
    val plan = InvertedIndex.searchBm25(spark, dir, Seq("spark", "join"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"),
      s"expected term In-filter pushed to the parquet scan:\n$plan")
  }
}
