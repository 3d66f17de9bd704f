package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.ops.MinHashIndex

/** Persistable MinHash index: parquet round-trip and batch-vs-corpus
  * recall against exhaustive cross-boundary truth at sf0.001. */
class MinHashIndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def truthPairs(split: Long): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    docs.as("x").join(docs.as("y"),
        col("x.doc_id") >= split && col("y.doc_id") < split)
      .select(col("x.doc_id").as("b"), col("y.doc_id").as("c"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh")))).as("j"))
      .filter(col("j") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("generic Compaction is the index's maintenance op: append residue collapses, queries unchanged") {
    // continuousFuzzyDedup appends per-batch signature files into the index
    // dir; the index is a FLAT parquet table, so sources.Compaction.compact
    // (not index-specific code) is its small-files maintenance — pin that
    val dir = java.nio.file.Files.createTempDirectory("mhidx-append").toString
    val docs = Tables.documents(spark, sf)
    MinHashIndex.save(MinHashIndex.build(docs.filter(col("doc_id") < 100)), dir)
    MinHashIndex.build(docs.filter(col("doc_id").between(100, 199)))
      .write.mode("append").parquet(dir)
    MinHashIndex.build(docs.filter(col("doc_id").between(200, 249)))
      .write.mode("append").parquet(dir)
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(dir) > 1, "appends should leave multiple files")
    val before = MinHashIndex.query(MinHashIndex.load(spark, dir),
        docs.filter(col("doc_id") >= 250))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val compacted = java.nio.file.Files.createTempDirectory("mhidx-compact").toString
    graft.sources.Compaction.compact(spark, dir, compacted, "doc_id")
    // compaction output is pointer-published: the data lives in a version
    // dir that load/resolve finds from the table name
    assert(parquetFiles(graft.sources.Compaction.resolve(spark, compacted)) == 1,
      "small index should compact to one file")
    val after = MinHashIndex.query(MinHashIndex.load(spark, compacted),
        docs.filter(col("doc_id") >= 250))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before && after.nonEmpty)
  }

  test("index round-trips through parquet and finds exactly the cross-boundary pairs") {
    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    val docs = Tables.documents(spark, sf)
    val built = MinHashIndex.build(docs.filter(col("doc_id") < 250))
    MinHashIndex.save(built, dir)
    val loaded = MinHashIndex.load(spark, dir)
    // the stored table IS the index: schema and content survive the round trip
    assert(loaded.columns.toSeq == Seq("doc_id", "hs", "sig"))
    assert(loaded.count() == built.count())

    val got = MinHashIndex.query(loaded, docs.filter(col("doc_id") >= 250))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = truthPairs(250)
    assert(want.nonEmpty, "planted near-duplicates should cross the split")
    assert(got == want)
  }

  test("query leaves a caller-cached index cached (load once, probe many)") {
    val docs = Tables.documents(spark, sf)
    val idx = MinHashIndex.build(docs.filter(col("doc_id") < 250)).cache()
    idx.count()
    MinHashIndex.query(idx, docs.filter(col("doc_id") >= 250)).collect()
    assert(idx.storageLevel.useMemory || idx.storageLevel.useDisk,
      "the caller's index cache must survive a probe")
    idx.unpersist()
  }

  test("querying an empty batch or disjoint corpus yields no pairs, not an error") {
    val docs = Tables.documents(spark, sf)
    val index = MinHashIndex.build(docs.filter(col("doc_id") < 10))
    val none = MinHashIndex.query(index, docs.filter(col("doc_id") < 0))
    assert(none.count() == 0)
  }
}
