package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (north-star): media as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted by a batched per-partition
  * operator.
  *
  * The container has no image/audio codecs, so `decodeFeatures` is a
  * DETERMINISTIC FAKE — the documented swap point for a real decoder (pixel
  * dims from headers, frame extraction via a codec lib). Everything around
  * it is the real engine surface: binary column construction, the struct
  * metadata schema, batched mapPartitions shape (codec state loads once per
  * partition), and the frame-sampling explode.
  */
object Multimodal {
  import Relational.Q

  /** Media table synthesized from documents: (doc_id, media: binary,
    * meta: struct<format, source>). At 100 TB this is the parquet layout —
    * binary blobs columnar-encoded beside their metadata, prunable without
    * touching blob bytes. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("fake/raw").as("format"), col("source").as("origin")).as("meta"))

  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** SWAP POINT: replace the body with a real codec call. The contract —
    * batch of (id, bytes) in, features out, deterministic per input — is
    * what the engine tests. */
  private def decodeFeatures(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = if (bytes == null) 0 else bytes.length
    MediaFeatures(id, n, n % 640, n % 480, n % 30 + 1)
  }

  /** Batched per-partition feature extraction (mapPartitions — codec
    * initialization would happen once per partition, exactly like
    * ml.Embed). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // codec/session state initializes HERE, once per partition
        it.grouped(batchSize).flatMap(_.map { case (id, bytes) => decodeFeatures(id, bytes) })
      }.toDF()
  }

  /** Media features per document — binary plumbing end-to-end. The oracle
    * recomputes the fake decode arithmetic from the text length (the corpus
    * is ASCII, so byte length == char length), certifying the binary column
    * round-trip and the operator shape. */
  val q52MediaFeatures: Q = (s, d) => {
    extractFeatures(mediaTable(s, d)).orderBy(col("doc_id"))
  }

  /** Frame sampling: one row per sampled frame index (stride 4) — the
    * explode shape a video pipeline uses to fan decoded frames out to
    * per-frame operators. */
  val q53FrameSample: Q = (s, d) => {
    extractFeatures(mediaTable(s, d))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  def queries: Map[String, Q] = Map(
    "q52_media_features" -> q52MediaFeatures,
    "q53_frame_sample"   -> q53FrameSample,
  )

  def oracle: Map[String, String] = Map(
    "q52_media_features" ->
      """SELECT doc_id, length(text) AS n_bytes, length(text) % 640 AS width,
        |  length(text) % 480 AS height, length(text) % 30 + 1 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q53_frame_sample" ->
      """SELECT doc_id, frame_idx FROM (
        |  SELECT doc_id, unnest(range(0, length(text) % 30 + 1, 4)) AS frame_idx
        |  FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
