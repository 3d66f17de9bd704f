package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream}

import org.apache.commons.compress.archivers.{ArchiveEntry, ArchiveInputStream}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Archive-as-table sources — SURVEY S3/S4/S8 (reference
  * /root/reference/code/data_processing_scripts/ID_matching_metadata.py:68-74
  * tar member enumeration; preview_posts.ipynb zip; the million-file
  * metadata.tar.gz is the reference's primary input).
  *
  * Spark has no tar/zip source, so this is the engine's custom source:
  * `binaryFile` scan → per-archive flatMap walking entries with
  * commons-compress (ships in the Spark distribution). The flatMap is
  * narrow — each archive is one input row, entries stream through a
  * constant-memory loop, and parallelism comes from the number of archive
  * files (at 100 TB the corpus is many archives, so the scan parallelizes
  * naturally; a single giant archive is the pathological case and is
  * documented as such — split upstream).
  *
  * Error semantics follow the reference (T6): decode failures become a
  * `status` value, never a job failure (ID_matching_metadata.py:46-54,60-64).
  */
object Archives {

  /** One row per archive member: (archive, member, content, truncated,
    * error). `truncated` is the errors-become-data channel for the 64 MiB
    * member cap — oversized members keep their prefix but are flagged,
    * never silently corrupted. `error` (null when healthy) carries a
    * decode/walk failure: a CORRUPT archive yields the members read so far
    * plus one error row, never a task failure — at 100 TB one bad archive
    * must not kill the job (T6, ID_matching_metadata.py:46-54 semantics). */
  case class Member(archive: String, member: String, content: Array[Byte],
      truncated: Boolean, error: String)

  /** Read up to `cap` bytes; second element reports whether the member had
    * more bytes past the cap (truncation). */
  private def readAll(in: java.io.InputStream, cap: Int = 64 << 20): (Array[Byte], Boolean) = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0 && out.size < cap) { out.write(buf, 0, n); n = in.read(buf) }
    // Loop exit with n >= 0 means it stopped on the cap: n read-but-unwritten
    // bytes are being dropped (n > 0), or probe once for bytes past the cap.
    (out.toByteArray, n > 0 || (n == 0 && in.read(buf) > 0))
  }

  /** Lazy member walk: advances the archive stream ON DEMAND, one member per
    * `next()` — at no point is more than the current member's bytes resident
    * (the flatMap output iterator is consumed row-by-row by the downstream
    * operator, so a million-member archive streams through constant memory).
    * The stream is closed when the last entry has been read. */
  private[graft] def memberIterator(
      archive: String,
      stream: ArchiveInputStream[_ <: ArchiveEntry],
      suffix: String): Iterator[Member] = new Iterator[Member] {
    private var staged: Member = _
    private var done = false
    private def advance(): Unit = {
      try {
        var e = stream.getNextEntry
        while (e != null && (e.isDirectory || !e.getName.endsWith(suffix)))
          e = stream.getNextEntry
        if (e == null) { done = true; staged = null; stream.close() }
        else {
          val (bytes, truncated) = readAll(stream)
          staged = Member(archive, e.getName, bytes, truncated, null)
        }
      } catch {
        case t: Throwable =>
          // corrupt stream: surface one error row and end the walk — the
          // errors-become-data channel, never a task failure
          done = true
          staged = Member(archive, "", Array.emptyByteArray, truncated = false,
            error = s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}")
          try stream.close() catch { case _: Throwable => () }
      }
    }
    def hasNext: Boolean = { if (staged == null && !done) advance(); staged != null }
    def next(): Member = {
      if (!hasNext) throw new NoSuchElementException(s"$archive exhausted")
      val m = staged; staged = null; m
    }
  }

  /** Explode tar (optionally .tar.gz) archives into member rows.
    * `suffix` filters member names at the source (F2 — e.g. ".json",
    * ID_matching_metadata.py:72) so unwanted entries are never materialized. */
  def tarMembers(spark: SparkSession, path: String, suffix: String = ""): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (archive, bytes) =>
        val raw = new BufferedInputStream(new java.io.ByteArrayInputStream(bytes))
        val stream =
          if (archive.endsWith(".gz") || archive.endsWith(".tgz"))
            new TarArchiveInputStream(new GzipCompressorInputStream(raw))
          else new TarArchiveInputStream(raw)
        memberIterator(archive, stream, suffix)
      }.toDF()
  }

  /** Explode zip archives into member rows (S8, preview_posts.ipynb). */
  def zipMembers(spark: SparkSession, path: String, suffix: String = ""): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (archive, bytes) =>
        val stream = new ZipArchiveInputStream(
          new BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
        memberIterator(archive, stream, suffix)
      }.toDF()
  }

  /** S4: ascii decode with fallback-to-status — adds (text, status) columns.
    * `decoded` status mirrors the reference's `encoding_error` channel
    * (ID_matching_metadata.py:46-54): non-ASCII content yields a lossy UTF-8
    * decode plus status="encoding_error" instead of failing the job. */
  def withAsciiDecode(members: DataFrame): DataFrame = {
    // a tiny UDF keeps the semantics exact (strict US-ASCII check mirroring
    // the reference's decode('ascii') try/except)
    val decode = udf { (bytes: Array[Byte]) =>
      if (bytes == null) ("", "null_content")
      else if (bytes.forall(b => b >= 0))
        (new String(bytes, java.nio.charset.StandardCharsets.US_ASCII), "ok")
      else (new String(bytes, java.nio.charset.StandardCharsets.UTF_8), "encoding_error")
    }
    val decoded = members
      .withColumn("dec", decode(col("content")))
      .withColumn("text", col("dec._1"))
      .withColumn("status", col("dec._2"))
      .drop("dec")
    // Truncated members (64 MiB cap in readAll) and archive-walk errors
    // surface through the same status channel — corrupted content must
    // never masquerade as "ok".
    val withTrunc =
      if (decoded.columns.contains("truncated"))
        decoded.withColumn(
          "status", when(col("truncated"), lit("truncated")).otherwise(col("status")))
      else decoded
    if (withTrunc.columns.contains("error"))
      withTrunc.withColumn(
        "status", when(col("error").isNotNull, lit("archive_error")).otherwise(col("status")))
    else withTrunc
  }
}
