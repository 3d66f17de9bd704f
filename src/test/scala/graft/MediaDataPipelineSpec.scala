package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.pipelines.MediaData

/** The media capstone funnel on planted fixtures: corrupt, undersized,
  * re-encoded (exact dup), lightly edited (near-dup), and unique images
  * through decode→quarantine→gate→dedup→export. */
class MediaDataPipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def encodeImg(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  /** 256×256 block image whose 8×8 aHash equals `pattern` (cell g bright
    * iff bit g set). */
  private def blockImg(pattern: Long): BufferedImage = {
    val img = new BufferedImage(256, 256, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 256) {
      var x = 0
      while (x < 256) {
        val g = (y / 32) * 8 + (x / 32)
        img.setRGB(x, y, if (((pattern >>> g) & 1L) == 1L) 0xffffff else 0)
        x += 1
      }
      y += 1
    }
    img
  }

  test("media funnel: quarantine, gate, exact + near dedup, bounded export") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    val b = 0x00000000FFFFFFFFL
    val rows = Seq(
      (1L, encodeImg(blockImg(a), "png")),            // keeper (component root)
      (2L, encodeImg(blockImg(a), "bmp")),            // exact dup of 1 (re-encode)
      (3L, encodeImg(blockImg(a ^ 0x11L), "png")),    // near-dup of 1 (hamming 2)
      (4L, encodeImg(blockImg(b), "png")),            // distinct keeper
      (5L, "not an image at all".getBytes("UTF-8")),  // quarantine: no_magic
      (6L, encodeImg(blockImg(b), "png").take(12)),   // quarantine: decode_failed
      (7L, Multimodal.bmpOf("tiny real image")))      // gated out: 4x4 < minDim
      .toDF("doc_id", "media")
    val base = java.nio.file.Files.createTempDirectory("graft-mediapipe").toString
    val outDir = s"$base/out"; val quarDir = s"$base/quarantine"
    val histDir = s"$base/hist"

    val summary = MediaData.run(spark, rows, outDir, nShards = 4,
        quarantineDir = Some(quarDir), histDir = Some(histDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 7 in; -2 undecodable => 5 admitted; -1 tiny => 4 gated;
    // exact dedup folds 2 into 1 => 3; near tier folds 3 into 1 => 2
    assert(summary ==
      Map("input" -> 7L, "admitted" -> 5L, "gated" -> 4L,
        "deduped" -> 2L, "exported" -> 2L), summary.toString)

    val kept = spark.read.parquet(graft.sources.ShardExport.resolve(spark, outDir)).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"component min-ids must survive: $kept")
    val quar = spark.read.parquet(quarDir)
      .select(col("doc_id"), col("reason")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(quar == Map(5L -> "no_magic", 6L -> "decode_failed"), quar.toString)
    // exported rows carry the profile metadata (no re-decode downstream)
    val cols = spark.read.parquet(graft.sources.ShardExport.resolve(spark, outDir)).columns.toSet
    assert(Set("media", "width", "height", "ahash").subsetOf(cols), cols.toString)

    // run diagnostic: the q153 histogram over the gated DISTINCT hashes
    // {a, a^0x11, b} — one hamming-2 pair (the near-dup the tier folds)
    // and two hamming-32 pairs (the far bulk)
    val hist = spark.read.parquet(histDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist == Map(2L -> 1L, 32L -> 2L), hist.toString)
  }

  test("media funnel without the near tier keeps hamming-close variants apart") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    val rows = Seq(
      (1L, encodeImg(blockImg(a), "png")),
      (2L, encodeImg(blockImg(a), "bmp")),          // exact dup, still folds
      (3L, encodeImg(blockImg(a ^ 0x11L), "png")))  // near-dup, survives
      .toDF("doc_id", "media")
    val outDir = java.nio.file.Files.createTempDirectory("graft-mediapipe2").toString + "/out"
    val summary = MediaData.run(spark, rows, outDir, nShards = 2, nearDup = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary("deduped") == 2L && summary("exported") == 2L, summary.toString)
    val kept = spark.read.parquet(graft.sources.ShardExport.resolve(spark, outDir)).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), kept.toString)
  }
}
