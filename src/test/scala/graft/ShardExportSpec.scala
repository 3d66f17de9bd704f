package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.ShardExport

/** The training-shard export sink: layout, row round-trip, file-size
  * bounds, and assignment agreement with the q86 manifest query. */
class ShardExportSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("shard export writes shard=K dirs, bounds file sizes, round-trips rows") {
    val table = java.nio.file.Files.createTempDirectory("graft-shards").toString + "/export"
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // pointer-mode publication: write returns the live version dir, and
    // resolve finds the same path from the table name alone
    val dir = ShardExport.write(docs, "doc_id", table, nShards = 8, maxRecordsPerFile = 20)
    assert(dir == ShardExport.resolve(spark, table))

    val shardDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.nonEmpty && shardDirs.forall(_.matches("shard=[0-7]")),
      s"unexpected layout: ${shardDirs.mkString(",")}")

    // every data file respects the records-per-file bound
    val files = shardDirs.flatMap(sd => new java.io.File(dir, sd).listFiles()
      .filter(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val c = spark.read.parquet(f.getAbsolutePath).count()
      assert(c <= 20, s"${f.getName} has $c rows > maxRecordsPerFile")
    }

    // round-trip: all rows come back, and each row's shard matches the
    // deterministic assignment (the same expression q86's manifest uses)
    val back = spark.read.parquet(dir)
    assert(back.count() == n)
    val mismatched = back.filter(
      col("shard") =!= ShardExport.shardAssignment(col("doc_id"), 8)).count()
    assert(mismatched == 0, s"$mismatched rows landed in the wrong shard")
  }

  test("compaction rewrites many small files into few range-partitioned ones") {
    import graft.sources.Compaction
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    // fragment: ~25 rows/file → ~20 small files
    docs.repartition(20).write.option("maxRecordsPerFile", 25).parquet(in)
    val smallFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles >= 20, s"fixture should be fragmented, got $smallFiles files")

    val planned = Compaction.compact(spark, in, out, "doc_id",
      targetBytes = Compaction.dataBytes(spark, in) / 4 + 1)
    val outLive = Compaction.resolve(spark, out)
    val outFiles = new java.io.File(outLive).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(planned <= 4 && outFiles.length == planned,
      s"expected $planned compacted files, got ${outFiles.length}")

    // rows conserve, and files cover DISJOINT sorted id ranges (the
    // range layout that makes footer pruning effective)
    val back = spark.read.parquet(outLive)
    assert(back.count() == n)
    val ranges = outFiles.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect()
      assert(ids.sameElements(ids.sorted), s"${f.getName} not sorted")
      (ids.min, ids.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB, "file id ranges overlap")
      case _ =>
    }
  }

  test("z-order compaction confines every file to a rectangle in BOTH columns") {
    import graft.sources.Compaction
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val in = s"$base/in"; val zout = s"$base/z"; val sout = s"$base/s"
    // two decorrelated uniform-ish columns (deterministic, no RNG state)
    val rows = (0 until 8192).map { i =>
      (((i * 2654435761L) % 1024).toInt, ((i * 40503L) % 1024).toInt)
    }
    rows.toDF("a", "b").repartition(16).write.parquet(in)
    val target = Compaction.dataBytes(spark, in) / 8 + 1

    Compaction.zorderCompact(spark, in, zout, "a", "b", targetBytes = target)
    Compaction.compact(spark, in, sout, "a", targetBytes = target) // baseline

    def avgWidth(table: String, c: String): Double = {
      val files = new java.io.File(Compaction.resolve(spark, table)).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val widths = files.map { f =>
        val mm = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
        (mm.getDouble(1) - mm.getDouble(0)) / 1023.0
      }
      widths.sum / widths.length
    }
    assert(spark.read.parquet(Compaction.resolve(spark, zout)).count() == 8192)
    // z-order: every file is narrow in BOTH dimensions -> footer min/max
    // prunes range reads on either column
    assert(avgWidth(zout, "a") <= 0.5, s"z a-width ${avgWidth(zout, "a")}")
    assert(avgWidth(zout, "b") <= 0.8, s"z b-width ${avgWidth(zout, "b")}")
    // single-column sort: the secondary column spans ~everything per file
    assert(avgWidth(sout, "b") >= 0.85, s"sorted b-width ${avgWidth(sout, "b")}")
  }
}
