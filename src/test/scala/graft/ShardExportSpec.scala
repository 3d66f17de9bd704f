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
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    ShardExport.write(docs, "doc_id", dir, nShards = 8, maxRecordsPerFile = 20)

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
}
