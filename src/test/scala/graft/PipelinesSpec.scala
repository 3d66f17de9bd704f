package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.Pipelines

/** End-to-end tests of the reference entry-point pipelines (EP1-EP3),
  * including the dynamic schema-merging assembly (U1) over heterogeneous
  * EXIF-shaped JSON. */
class PipelinesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("EP1: html directory -> post text table") {
    val dir = Files.createTempDirectory("graft-ep1").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/post1.html"),
      """<html><div class="post--card--wrapper">First   post
        |<img alt="Impressions"> 42</div></html>""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/post2.html"),
      """<div class="other">not a post card</div>""")
    Files.writeString(java.nio.file.Paths.get(s"$dir/post3.html"),
      """<div class="post--card--wrapper">Second post</div>""")
    val out = Pipelines.htmlToText(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map(
      "post1.txt" -> "First post [Impressions]: 42",
      "post3.txt" -> "Second post"))
  }

  test("EP2: text corpus -> normalized embedding table") {
    val dir = Files.createTempDirectory("graft-ep2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"), "hello spark world")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"), "   ") // dropped (F4)
    Files.writeString(java.nio.file.Paths.get(s"$dir/c.txt"), "another document")
    val out = Pipelines.embedCorpus(spark, dir).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == graft.ml.Embed.Dim)
      assert(math.abs(math.sqrt(v.map(x => x.toDouble * x).sum) - 1.0) < 1e-5)
    }
  }

  private def writeTarGz(path: String, entries: Seq[(String, String)]): Unit = {
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(
      new BufferedOutputStream(new FileOutputStream(path))))
    entries.foreach { case (name, content) =>
      val bytes = content.getBytes(StandardCharsets.UTF_8)
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
    }
    tar.close()
  }

  test("EP3: tar -> status table -> semi-join -> schema-merging assembly") {
    val dir = Files.createTempDirectory("graft-ep3").toString
    // heterogeneous EXIF-shaped members: column sets differ per record (U1)
    writeTarGz(s"$dir/metadata.tar.gz", Seq(
      "meta-001.json" ->
        """[{"SourceFile":"a.jpg","GPSLatitude":"38 deg 55' 58.80\" N","Make":"Apple"}]""",
      "meta-002.json" ->
        """[{"SourceFile":"b.jpg","Make":"Samsung","Model":"S21"}]""",
      "meta-003.json" ->
        """[{"SourceFile":"c.jpg","GPSPosition":"x","ISO":100,"FNumber":1.8}]""",
      "meta-004.json" -> "not json at all",
      // multi-element array: only element 0 is inspected (reference data[0])
      "meta-005.json" ->
        """[{"SourceFile":"d.jpg","Make":"Pixel"},{"GPSLatitude":"1 deg 0' 0\" N"}]""",
      "meta-006.json" -> "[]"))

    val status = Pipelines.gpsStatus(spark, s"$dir/metadata.tar.gz")
    val reports = status.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(reports("meta-001.json") == "GPS_detected")
    assert(reports("meta-002.json") == "GPS_not_detected")
    assert(reports("meta-003.json") == "GPS_detected")
    assert(reports("meta-004.json") == "error") // unparseable → error channel, not a job failure
    assert(reports("meta-005.json") == "GPS_not_detected") // element 0 only, like data[0]
    assert(reports("meta-006.json") == "error") // empty array → data[0] would fail

    val assembled = Pipelines.assembleDetected(spark, s"$dir/metadata.tar.gz")
    // schema union of the two detected members (column count grows like the
    // reference's 86 -> 640 sparse union)
    val cols = assembled.columns.toSet
    assert(cols == Set("filename", "SourceFile", "GPSLatitude", "Make", "GPSPosition", "ISO", "FNumber"))
    val rows = assembled.collect()
    assert(rows.length == 2)
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("meta-001.json").getAs[String]("Make") == "Apple")
    assert(byName("meta-001.json").getAs[String]("GPSPosition") == null) // sparse
    assert(byName("meta-003.json").getAs[Long]("ISO") == 100L)
    // C13 composition: the assembled GPS string parses to decimal degrees
    graft.plans.GraftExtensions.register(spark)
    val dec = assembled.filter(org.apache.spark.sql.functions.col("GPSLatitude").isNotNull)
      .selectExpr("dms_to_decimal(GPSLatitude) AS d").head().getDouble(0)
    assert(math.abs(dec - 38.933) < 1e-9)
  }

  test("J2: ID matching joins metadata to media by filename-embedded ID") {
    val dir = Files.createTempDirectory("graft-j2").toString
    writeTarGz(s"$dir/metadata.tar.gz", Seq(
      "metadata/meta-00CnBY5xCdca.json" -> """[{"SourceFile":"a.mp4"}]""",
      "metadata/meta-0003lx5cSwSB.json" -> """[{"SourceFile":"b.jpg"}]""",
      "metadata/meta-orphanXX.json"     -> """[{"SourceFile":"c.mp4"}]""", // no media
      "metadata/readme.txt"             -> "not metadata"))
    writeTarGz(s"$dir/media.tar.gz", Seq(
      "media/00CnBY5xCdca.mp4" -> "fake video bytes",
      "media/0003lx5cSwSB.jpg" -> "fake image bytes",
      "media/unmatchedYY.mp4"  -> "no metadata for this one"))
    val matched = Pipelines.idMatch(spark, s"$dir/metadata.tar.gz", s"$dir/media.tar.gz")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(matched.map(_._1).sorted.toSeq == Seq("0003lx5cSwSB", "00CnBY5xCdca"))
    matched.foreach { case (id, meta, media) =>
      assert(meta.endsWith(s"meta-$id.json") && media.contains(s"/$id."))
    }
  }

  test("U1 stress: wide-schema assembly unions hundreds of distinct EXIF keys") {
    // mirrors the reference's signature 86 -> 640-column sparse union
    // (preview_data.ipynb:cell-10): every member shares a few keys and
    // contributes a handful of its own; the assembled schema must be the
    // UNION of all member schemas with nulls where a member lacks a column
    val dir = Files.createTempDirectory("graft-wide").toString
    val nMembers = 320
    val entries = (0 until nMembers).map { i =>
      val own = (0 until 2).map(j => s""""Tag_${i}_$j":"v$j"""").mkString(",")
      (f"meta-$i%04d.json",
        s"""[{"SourceFile":"$i.jpg","GPSLatitude":"$i deg 0' 0.00\\" N",$own}]""")
    }
    writeTarGz(s"$dir/wide.tar.gz", entries)
    val assembled = Pipelines.assembleDetected(spark, s"$dir/wide.tar.gz")
    // width: filename + SourceFile + GPSLatitude + 2 unique keys per member
    assert(assembled.columns.length == 3 + 2 * nMembers,
      s"expected ${3 + 2 * nMembers} columns, got ${assembled.columns.length}")
    assert(assembled.count() == nMembers)
    // sparsity: a member's own tags are null on every other row
    import org.apache.spark.sql.functions.col
    assert(assembled.filter(col("Tag_7_0").isNotNull).count() == 1)
    assert(assembled.filter(col("Tag_7_0").isNotNull)
      .head().getAs[String]("filename") == "meta-0007.json")
  }
}
