package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** CSV source semantics (S1/S2): imposed schema, bad-line skip, headerless
  * post-hoc naming — the reference's listing/status-log reads
  * (download_image_files.py:15, preview_data.ipynb:cell-3). */
class SourcesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("S1: CSV with imposed schema and DROPMALFORMED bad-line skip") {
    val dir = Files.createTempDirectory("graft-csv").toString
    // shape of the S3 image listing: date,time,size,filename
    Files.writeString(java.nio.file.Paths.get(s"$dir/listing.csv"),
      """2021-01-17,11:35:19,1048576,photo_1.jpg
        |2021-01-17,11:35:20,2097152,photo_2.jpg
        |not,a,valid_size_row,x
        |2021-01-17,11:35:21,524288,video_1.mp4
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("date", DateType), StructField("time", StringType),
      StructField("size", LongType), StructField("filename", StringType)))
    val df = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(s"$dir/listing.csv")
    // note: count() alone would prune every column and skip parsing — the
    // malformed row is only dropped when columns are actually read
    assert(df.collect().length == 3) // malformed row dropped, job not failed
    // the reference's first analytics: count + sum(size)/1e9
    val agg = df.agg(count(lit(1)).as("n"), sum(col("size")).as("bytes")).head()
    assert(agg.getLong(0) == 3 && agg.getLong(1) == 1048576L + 2097152 + 524288)
  }

  test("S2: headerless CSV with post-hoc column naming") {
    val dir = Files.createTempDirectory("graft-csv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/status.txt"),
      """meta-001.json,GPS_detected
        |meta-002.json,GPS_not_detected
        |meta-003.json,encoding_error
        |""".stripMargin)
    val df = spark.read.schema("filename STRING, report STRING").csv(s"$dir/status.txt")
    // F1: contains-filter is faithful ('GPS_not_detected' does NOT contain
    // 'GPS_detected' as the reference relies on — preview_data.ipynb:cell-4)
    val hits = df.filter(col("report").contains("GPS_detected"))
      .select("filename").collect().map(_.getString(0))
    assert(hits.toSeq == Seq("meta-001.json"))
  }

  test("K1: CSV sink round-trips with header") {
    val dir = Files.createTempDirectory("graft-csvout").toString
    val df = Tables.nation(spark, "/root/testdata/sf0.001")
    df.write.option("header", true).mode("overwrite").csv(s"$dir/out")
    val back = spark.read.option("header", true)
      .schema(df.schema).csv(s"$dir/out")
    assert(back.count() == df.count())
  }
}
