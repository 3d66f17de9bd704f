package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.pipelines.MultimodalData

/** The UNIFIED multimodal capstone on planted fixtures: a pair collapsed
  * ONLY by the cross-modal near edge (distinct texts, hamming-2 images),
  * a text-exact + image-exact chain, text-only docs, and the three media
  * quarantine classes — plus stage-count parity with the q158 kernel. */
class MultimodalDataPipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def encodeImg(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  /** 256×256 block image whose 8×8 aHash equals `pattern`. */
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

  private val permissiveGate = graft.ops.TextOps.RuleGateConfig(
    minWords = 5L, maxWords = 1000L,
    minMeanWordLen = 0.0, maxMeanWordLen = Double.MaxValue,
    stopwords = Nil, minStopHits = 0L,
    maxSymbolRatio = Double.MaxValue)

  private def text(tag: String) =
    s"alpha$tag beta$tag gamma$tag delta$tag epsilon$tag zeta$tag"

  test("unified funnel: cross-modal near edge collapses a pair no single modality finds") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    val b = 0x00000000FFFFFFFFL
    val rows: Seq[(Long, String, String, Array[Byte])] = Seq(
      // the PLANTED CASE: 1 and 2 have DISTINCT texts (both survive text
      // dedup) and hamming-2 images — only the cross-modal NEAR edge
      // collapses them
      (1L, text("one"), "srcA", encodeImg(blockImg(a), "png")),
      (2L, text("two"), "srcA", encodeImg(blockImg(a ^ 0x11L), "png")),
      // 3=4 by text (3 is text-only), 4=5 by exact image: one chained
      // component {3,4,5} via the edge UNION
      (3L, text("three"), "srcA", null),
      (4L, text("three"), "srcB", encodeImg(blockImg(b), "png")),
      (5L, text("five"), "srcB", encodeImg(blockImg(b), "bmp")),
      // text-only unique survivor
      (6L, text("six"), "srcB", null),
      // the three media-failure classes: the DOC drops (paired export)
      (7L, text("seven"), "srcA", "not an image at all".getBytes("UTF-8")),
      (8L, text("eight"), "srcA", encodeImg(blockImg(b), "png").take(12)),
      (9L, text("nine"), "srcA", Multimodal.bmpOf("tiny real image")),
      // text-gate drop: 3 words < minWords 5
      (10L, "too short text", "srcB", null))
    val docs = rows.toDF("doc_id", "text", "source", "media")
      .withColumn("n_chars", length(col("text")))
    val base = java.nio.file.Files.createTempDirectory("graft-mmpipe").toString
    val outDir = s"$base/out"; val quarDir = s"$base/quarantine"

    val histDir = s"$base/chist"
    val vennDir = s"$base/venn"
    val summary = MultimodalData.run(spark, docs, outDir,
        nShards = 4, textGate = permissiveGate, pplGate = false,
        quarantineDir = Some(quarDir), componentHistDir = Some(histDir),
        gateVennDir = Some(vennDir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary == Map(
      "input" -> 10L, "validated" -> 10L, "gated" -> 9L, "ppl_gated" -> 9L,
      "media_ok" -> 6L, "canonical" -> 3L, "decontaminated" -> 3L,
      "mixed_rows" -> 3L),
      summary.toString)

    val kept = spark.read.parquet(graft.sources.ShardExport.resolve(spark, outDir)).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 6L), s"component min-ids must survive: $kept")

    val quar = spark.read.parquet(quarDir)
      .select(col("doc_id"), col("reason")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(quar == Map(7L -> "no_magic", 8L -> "decode_failed", 9L -> "gate"),
      quar.toString)

    // the q164 run diagnostic: survivors {1..6} fold into {1,2} (near
    // edge), {3,4,5} (text+exact-image chain), {6} — one component each
    // of sizes 1, 2, 3
    val hist = spark.read.parquet(histDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hist == Set((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)), hist.toString)

    // CONTROL: q141's exact-only closure cannot make the 1–2 bridge —
    // both survive without the near tier
    val surv = docs.filter(col("doc_id").isin(1L, 2L, 3L, 4L, 5L, 6L))
    val hashes = Multimodal.imageAHash(
      surv.filter(col("media").isNotNull).select(col("doc_id"), col("media")))
    val exactOnly = Multimodal.crossModalKeepOf(
        surv.select(col("doc_id"), col("text")), hashes)
      .filter(col("doc_id") === col("keep_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(exactOnly == Set(1L, 2L, 3L, 6L),
      s"exact-only control must keep BOTH 1 and 2: $exactOnly")

    // the q190-style run report (r15 verdict #8): independent gate
    // verdicts over the validated corpus — rule drops only doc 10
    // (text-only, so its media verdict is keep), media fails 7/8/9,
    // ppl keeps all (gate off); cells partition the 10 validated docs
    val venn = spark.read.parquet(vennDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(venn == Map((1L, 1L, 1L) -> 6L, (1L, 1L, 0L) -> 3L,
      (0L, 1L, 1L) -> 1L), venn.toString)
    assert(venn.values.sum == summary("validated"), venn.toString)
  }

  test("run() stage counts equal the q158 kernel's on the same input") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    val rows: Seq[(Long, String, String, Array[Byte])] = Seq(
      (1L, text("p1"), "srcA", encodeImg(blockImg(a), "png")),
      (2L, text("p2"), "srcA", encodeImg(blockImg(a ^ 0x3L), "png")),
      (3L, text("p3"), "srcB", null),
      (4L, text("p3"), "srcB", null),
      (5L, "tiny", "srcB", null),
      (6L, text("p6"), "srcA", "garbage bytes".getBytes("UTF-8")))
    val docs = rows.toDF("doc_id", "text", "source", "media")
      .withColumn("n_chars", length(col("text")))
    val outDir = java.nio.file.Files.createTempDirectory("graft-mmpar").toString + "/out"
    val summary = MultimodalData.run(spark, docs, outDir, nShards = 2,
        textGate = permissiveGate, pplGate = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kernel = Multimodal.multimodalFunnelOf(docs, permissiveGate,
        Multimodal.MediaGateConfig(), hashBits = 64, pplGate = false)
      .collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val (nRaw, nGate, nPpl, nMedia, nCanon) = kernel.reduce((x, y) =>
      (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 + y._4, x._5 + y._5))
    assert(summary("input") == nRaw)
    assert(summary("gated") == nGate)
    assert(nPpl == nGate, "ppl off must be a pass-through stage")
    assert(summary("media_ok") == nMedia)
    assert(summary("canonical") == nCanon)
    // survivors {1,2,3,4}: 1–2 near-fold, 3–4 text-fold (5 fails the
    // word floor, 6 drops at media admission) => 2 components
    assert(nCanon == 2L, kernel.mkString(","))
  }

  test("run() stage counts equal the q158 kernel's WITH the CCNet ppl leg (r14 #5)") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    // FLUENT docs share a repeated phrase structure (their bigrams recur
    // across the corpus); the WORD-SALAD doc uses the SAME vocabulary in
    // orders seen nowhere else — the sequential signal the bigram LM
    // exists to catch — so it alone crosses the tercile cut
    def fluent(tag: String) =
      s"alpha beta gamma delta alpha beta gamma delta tag$tag"
    val salad = "delta alpha gamma beta delta gamma alpha beta delta"
    val rows: Seq[(Long, String, String, Array[Byte])] = Seq(
      (1L, fluent("p1"), "srcA", encodeImg(blockImg(a), "png")),
      (2L, fluent("p2"), "srcA", encodeImg(blockImg(a ^ 0x3L), "png")),
      (3L, fluent("p3"), "srcB", null),
      (4L, fluent("p3"), "srcB", null),
      (5L, salad, "srcB", null),
      (6L, fluent("p6"), "srcA", null))
    val docs = rows.toDF("doc_id", "text", "source", "media")
      .withColumn("n_chars", length(col("text")))
    val outDir = java.nio.file.Files.createTempDirectory("graft-mmppl").toString + "/out"
    val summary = MultimodalData.run(spark, docs, outDir, nShards = 2,
        textGate = permissiveGate, pplGate = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kernel = Multimodal.multimodalFunnelOf(docs, permissiveGate,
        Multimodal.MediaGateConfig(), hashBits = 64, pplGate = true)
      .collect().map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val (nRaw, nGate, nPpl, nMedia, nCanon) = kernel.reduce((x, y) =>
      (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 + y._4, x._5 + y._5))
    assert(summary("input") == nRaw)
    assert(summary("gated") == nGate)
    assert(summary("ppl_gated") == nPpl)
    assert(summary("media_ok") == nMedia)
    assert(summary("canonical") == nCanon)
    assert(nPpl < nGate, s"the tercile cut must drop at least one doc: $nPpl/$nGate")
  }

  test("structural breaches fail the run; retention keeps the best-scored component member") {
    import spark.implicits._
    val a = 0xF0F0F0F0F0F0F0F0L
    // a duplicate doc_id is a q98 breach — the run must FAIL by default
    val breached = Seq(
      (1L, text("b1"), "srcA", null.asInstanceOf[Array[Byte]]),
      (1L, text("b2"), "srcA", null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "text", "source", "media")
      .withColumn("n_chars", length(col("text")))
    val failDir = java.nio.file.Files.createTempDirectory("graft-mmfail").toString + "/out"
    val ex = intercept[IllegalStateException] {
      MultimodalData.run(spark, breached, failDir, textGate = permissiveGate,
        pplGate = false)
    }
    assert(ex.getMessage.contains("expectations breach: 2 rows"), ex.getMessage)

    // retention: 1 and 2 fold via the cross-modal near edge; with scores
    // the component keeps the HIGHER-scored member (2), not the min id
    val rows: Seq[(Long, String, String, Array[Byte])] = Seq(
      (1L, text("r1"), "srcA", encodeImg(blockImg(a), "png")),
      (2L, text("r2"), "srcA", encodeImg(blockImg(a ^ 0x3L), "png")),
      (3L, text("r3"), "srcB", null))
    val docs = rows.toDF("doc_id", "text", "source", "media")
      .withColumn("n_chars", length(col("text")))
    val scores = Seq((1L, 0.1), (2L, 0.9), (3L, 0.5)).toDF("doc_id", "score")
    val outDir = java.nio.file.Files.createTempDirectory("graft-mmret").toString + "/out"
    val reportDir = java.nio.file.Files.createTempDirectory("graft-mmrep").toString
    MultimodalData.run(spark, docs, outDir, textGate = permissiveGate,
      pplGate = false, retentionScores = Some(scores),
      tokenReportDir = Some(reportDir))
    val kept = spark.read.parquet(graft.sources.ShardExport.resolve(spark, outDir)).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"retention must keep the best-scored member: $kept")
    // the run report is the certified q143 cascade on the input
    val wantYield = graft.ops.TextOps.tokenYieldOf(
        docs.select(col("doc_id"), col("source"), col("text")))
      .collect().map(_.toSeq).toSet
    val gotYield = spark.read.parquet(reportDir)
      .select(col("source"), col("n_raw"), col("n_collapsed"),
        col("n_scrubbed"), col("n_yield"))
      .collect().map(_.toSeq).toSet
    assert(gotYield == wantYield, s"token report != q143 kernel: $gotYield")
  }
}
