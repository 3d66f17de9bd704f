package graft

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Archives

/** End-to-end test of the tar/zip archive sources (S3/S4/S8) running the
  * EP3-shaped pipeline: members → ascii decode w/ fallback → JSON key-prefix
  * predicate → status channel (ID_matching_metadata.py:41-64 semantics). */
class ArchivesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def fixtureDir = {
    val d = Files.createTempDirectory("graft-archives").toFile
    d.deleteOnExit(); d
  }

  private def writeTarGz(path: String, entries: Seq[(String, Array[Byte])]): Unit = {
    val tar = new TarArchiveOutputStream(new GzipCompressorOutputStream(
      new BufferedOutputStream(new FileOutputStream(path))))
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
    }
    tar.close()
  }

  private def writeZip(path: String, entries: Seq[(String, Array[Byte])]): Unit = {
    val zip = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, bytes) =>
      zip.putNextEntry(new ZipEntry(name)); zip.write(bytes); zip.closeEntry()
    }
    zip.close()
  }

  test("tar.gz member enumeration with suffix filter and GPS key-prefix scan") {
    val dir = fixtureDir
    val gps = """[{"SourceFile":"a.jpg","GPSLatitude":"38 deg 55' 58.80\" N","Make":"Apple"}]"""
    val noGps = """[{"SourceFile":"b.jpg","Make":"Samsung"}]"""
    val badEnc = "[{\"SourceFile\":\"c.jpg\",\"Caption\":\"café\"}]".getBytes(StandardCharsets.UTF_8)
    writeTarGz(s"$dir/metadata.tar.gz", Seq(
      "meta-001.json" -> gps.getBytes(StandardCharsets.US_ASCII),
      "meta-002.json" -> noGps.getBytes(StandardCharsets.US_ASCII),
      "meta-003.json" -> badEnc,
      "readme.txt" -> "ignore me".getBytes(StandardCharsets.US_ASCII)))

    val members = Archives.tarMembers(spark, s"$dir/metadata.tar.gz", suffix = ".json")
    assert(members.count() == 3) // .txt filtered at source

    val decoded = Archives.withAsciiDecode(members)
    val gpsFlag = decoded.withColumn("detected",
      exists(map_keys(from_json(regexp_replace(col("text"), "^\\[|\\]$", ""),
        MapType(StringType, StringType))), k => k.startsWith("GPS")))
    val rows = gpsFlag.select(col("member"), col("status"), col("detected"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(rows == Set(
      ("meta-001.json", "ok", true),
      ("meta-002.json", "ok", false),
      ("meta-003.json", "encoding_error", false)))
  }

  test("tar source streams a many-member archive (reference-scale shape)") {
    val dir = fixtureDir
    val entries = (0 until 5000).map { i =>
      (f"meta-$i%05d.json",
        s"""[{"SourceFile":"$i.jpg","Make":"M$i"${if (i % 10 == 0) s""","GPSLatitude":"$i x"""" else ""}}]"""
          .getBytes(StandardCharsets.US_ASCII))
    }
    writeTarGz(s"$dir/big.tar.gz", entries)
    val t0 = System.nanoTime()
    val members = Archives.tarMembers(spark, s"$dir/big.tar.gz", suffix = ".json")
    val n = members.count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(n == 5000)
    assert(elapsed < 30.0, s"tar walk took ${elapsed}s") // generous local bound
    // composition: key-prefix scan over all members
    val detected = graft.pipelines.Pipelines
      .gpsStatus(spark, s"$dir/big.tar.gz")
      .filter(col("report") === "GPS_detected").count()
    assert(detected == 500)
  }

  test("member walk is lazy: archive bytes advance per pulled member, not up front") {
    // 200 members × 32 KiB. If the walk buffered the whole archive (the old
    // ArrayBuffer accumulation), bytesRead would jump to ~6.4 MiB on the
    // first pull; the lazy iterator must stay within a few members of the
    // pull cursor at all times.
    val dir = fixtureDir
    val payload = Array.fill[Byte](32 * 1024)('x')
    val entries = (0 until 200).map(i => (f"meta-$i%04d.json", payload))
    val tarPath = s"$dir/lazy.tar"
    val tar = new TarArchiveOutputStream(new BufferedOutputStream(new FileOutputStream(tarPath)))
    entries.foreach { case (name, bytes) =>
      val e = new TarArchiveEntry(name)
      e.setSize(bytes.length)
      tar.putArchiveEntry(e); tar.write(bytes); tar.closeArchiveEntry()
    }
    tar.close()
    val totalSize = new java.io.File(tarPath).length()
    val stream = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(tarPath)))
    val it = Archives.memberIterator("lazy.tar", stream, suffix = ".json")
    // pull 10 of 200: the stream must have consumed ~10 members, not all 200
    val first10 = it.take(10).toList
    assert(first10.size == 10)
    val consumed = stream.getBytesRead
    assert(consumed < totalSize / 4,
      s"stream consumed $consumed of $totalSize bytes after 10 of 200 members — " +
        "the walk is materializing the archive up front")
    // the remainder still arrives intact
    assert(it.size == 190)
  }

  test("corrupt archive yields an error row, not a task failure (T6)") {
    val dir = fixtureDir
    val good = Seq(
      "meta-001.json" -> """[{"SourceFile":"a.jpg"}]""".getBytes(StandardCharsets.US_ASCII),
      "meta-002.json" -> """[{"SourceFile":"b.jpg"}]""".getBytes(StandardCharsets.US_ASCII))
    writeTarGz(s"$dir/whole.tar.gz", good)
    // corrupt: truncate the gzip stream mid-archive
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/whole.tar.gz"))
    Files.write(java.nio.file.Paths.get(s"$dir/cut.tar.gz"),
      java.util.Arrays.copyOf(bytes, bytes.length / 2))
    val rows = Archives.tarMembers(spark, s"$dir/cut.tar.gz", suffix = ".json")
      .select("member", "error").collect()
      .map(r => (r.getString(0), Option(r.getString(1))))
    // the walk must complete (no exception) and end in exactly one error row
    assert(rows.count(_._2.isDefined) == 1, rows.toSeq.toString)
    assert(rows.filter(_._2.isEmpty).forall(_._1.endsWith(".json")))
    // the status channel folds it in
    val statuses = Archives.withAsciiDecode(
      Archives.tarMembers(spark, s"$dir/cut.tar.gz", suffix = ".json"))
      .select("status").collect().map(_.getString(0))
    assert(statuses.contains("archive_error"))
  }

  test("zip member enumeration (S8)") {
    val dir = fixtureDir
    writeZip(s"$dir/posts.zip", Seq(
      "post1.html" -> """<div class="post--card--wrapper">hello</div>""".getBytes,
      "post2.html" -> """<div class="post--card--wrapper">world</div>""".getBytes,
      "style.css" -> "body{}".getBytes))
    val members = Archives.zipMembers(spark, s"$dir/posts.zip", suffix = ".html")
    assert(members.count() == 2)
    // EP1 composition: zip → html_post_text
    val texts = Archives.withAsciiDecode(members)
      .withColumn("post", graft.functions.Html.html_post_text(col("text")))
      .select("post").collect().map(_.getString(0)).toSet
    assert(texts == Set("hello", "world"))
  }
}
