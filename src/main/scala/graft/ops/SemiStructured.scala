package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.Tables
import graft.functions.Gps

/** Semi-structured / JSON / temporal operator surface — SURVEY §2.8 C11-C14,
  * F3, S5. The reference's EXIF workflow treats a JSON object as a dynamic
  * `key → value` map and scans for key prefixes (ID_matching_metadata.py:32-39);
  * here that is a higher-order-function expression over `from_json` — no UDF,
  * fully codegen'd, pushdown-friendly. */
object SemiStructured {
  import Relational.Q

  /** JSON field access + typed cast (C11, ID_matching_metadata.py:59
    * `data[0]` access). get_json_object on the raw string — no full parse. */
  val q24JsonGet: Q = (s, d) => {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.ops.ExactMean.meanInt(col("k"), 4).as("avg_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Key-prefix existence over a JSON map (F3, ID_matching_metadata.py:32-39
    * `any(key.startswith(search_key))` → GPS_detected). The JSON object is
    * parsed to MapType and scanned with `exists(map_keys(...))` — the
    * Spark-native form of the reference's predicate. */
  val q25JsonKeyPrefix: Q = (s, d) => {
    // json_object_keys: the predicate only reads TOP-LEVEL KEY NAMES, so
    // the full-map from_json (which materializes every value string) was
    // paying for data the query never touches — the key-only parse is
    // ~35 % faster per pass and agrees on every row (r21; null/invalid
    // JSON yields null either way, duplicate keys don't change `exists`)
    Tables.events(s, d)
      .withColumn("detected",
        exists(json_object_keys(col("props")), k => k.startsWith("k")))
      .groupBy(col("detected"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("detected"))
  }

  /** Daily rollup of the event stream (C12 date handling; the reference's
    * `date`,`time` listing columns, preview_file_downloads.ipynb:cell-2).
    * date_format keeps the output a plain string for oracle parity. */
  val q26DayCounts: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .orderBy(col("day"))
  }

  /** EXIF timestamp format round-trip (C14, preview_data.ipynb:cell-8
    * `2021:01:04 18:59:50`): format → parse → reformat must be lossless at
    * second granularity. */
  val q27ExifRoundtrip: Q = (s, d) => {
    Tables.events(s, d)
      .filter(col("event_id") < 200)
      .withColumn("exif", date_format(col("ts"), "yyyy:MM:dd HH:mm:ss"))
      .withColumn("rt", date_format(Gps.exifTimestampLocal(col("exif")), "yyyy-MM-dd HH:mm:ss"))
      .select(col("event_id"), col("exif"), col("rt"))
      .orderBy(col("event_id"))
  }

  /** ZONED EXIF timestamp parse (C14, preview_data.ipynb:cell-8 —
    * `2021:01:04 18:59:50-05:00`): the reference's EXIF timestamps carry a
    * UTC offset. Wall-time strings with per-row NON-UTC offsets (−6..+6,
    * never Z) are parsed with the `yyyy:MM:dd HH:mm:ssXXX` pattern and
    * rendered back as the UTC instant — certifying the offset arithmetic,
    * not just the zoneless format of q27. */
  val q61ExifZoned: Q = (s, d) => {
    val oh0 = (col("event_id") % 12) - lit(6)
    val oh = when(oh0 >= 0, oh0 + 1).otherwise(oh0) // -6..-1, +1..+6: never UTC
    Tables.events(s, d)
      .filter(col("event_id") < 200)
      .withColumn("exif_zoned",
        concat(date_format(col("ts"), "yyyy:MM:dd HH:mm:ss"),
          format_string("%+03d:00", oh)))
      .withColumn("utc",
        date_format(Gps.exifTimestamp(col("exif_zoned")), "yyyy-MM-dd HH:mm:ss"))
      .select(col("event_id"), col("exif_zoned"), col("utc"))
      .orderBy(col("event_id"))
  }

  /** DMS→decimal conversion (C13, preview_data.ipynb:cell-8 GPS strings).
    * DMS strings are constructed deterministically from customer keys, parsed
    * back with the NATIVE Catalyst expression (plans.DmsToDecimal — one-pass
    * parse, codegen'd via doGenCode), and the oracle recomputes the expected
    * decimal directly — validating the parse. ExpressionsSpec separately
    * proves the native form agrees with the regexp formulation in
    * functions.Gps. */
  val q28Dms: Q = (s, d) => {
    graft.plans.GraftExtensions.register(s)
    val c = Tables.customer(s, d)
      .withColumn("deg", col("c_custkey") % 90)
      .withColumn("mnt", (col("c_custkey") * 7) % 60)
      .withColumn("sec", (col("c_custkey") % 600).cast("double") / 10.0)
      .withColumn("dir", when(col("c_custkey") % 2 === 0, "N").otherwise("S"))
    c.withColumn("dms",
        format_string("%d deg %d' %.1f\" %s", col("deg"), col("mnt"), col("sec"), col("dir")))
      .withColumn("dec_value", round(expr("dms_to_decimal(dms)"), 6))
      .select(col("c_custkey"), col("dms"), col("dec_value"))
      .orderBy(col("c_custkey"))
  }

  /** Charset-safety status channel (C7/S4/T6, ID_matching_metadata.py:46-54
    * ascii decode with fallback, errors as data not failures). */
  val q29AsciiStatus: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("status",
        when(col("text").rlike("^[\\x00-\\x7F]*$"), lit("ascii_ok"))
          .otherwise(lit("encoding_error")))
      .groupBy(col("lang"), col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("status"))
  }

  def queries: Map[String, Q] = Map(
    "q24_json_get"        -> q24JsonGet,
    "q25_json_key_prefix" -> q25JsonKeyPrefix,
    "q26_day_counts"      -> q26DayCounts,
    "q27_exif_roundtrip"  -> q27ExifRoundtrip,
    "q61_exif_zoned"      -> q61ExifZoned,
    "q28_dms"             -> q28Dms,
    "q29_ascii_status"    -> q29AsciiStatus,
  )

  def oracle: Map[String, String] = Map(
    "q24_json_get" ->
      s"""SELECT event_type, count(*) AS n,
        |  ${graft.ops.ExactMean.meanIntSql("CAST(props->>'k' AS BIGINT)", 4)} AS avg_k,
        |  max(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q25_json_key_prefix" ->
      """SELECT len(list_filter(json_keys(props), x -> starts_with(x, 'k'))) > 0 AS detected,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_day_counts" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q27_exif_roundtrip" ->
      """SELECT event_id, strftime(ts, '%Y:%m:%d %H:%M:%S') AS exif,
        |  strftime(strptime(strftime(ts, '%Y:%m:%d %H:%M:%S'), '%Y:%m:%d %H:%M:%S'),
        |           '%Y-%m-%d %H:%M:%S') AS rt
        |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,
    "q61_exif_zoned" ->
      """SELECT event_id, exif_zoned,
        |  strftime(strptime(exif_zoned, '%Y:%m:%d %H:%M:%S%z') AT TIME ZONE 'UTC',
        |           '%Y-%m-%d %H:%M:%S') AS utc
        |FROM (
        |  SELECT event_id,
        |    strftime(ts, '%Y:%m:%d %H:%M:%S') || printf('%+03d:00',
        |      CASE WHEN (event_id % 12) - 6 >= 0 THEN (event_id % 12) - 5
        |           ELSE (event_id % 12) - 6 END) AS exif_zoned
        |  FROM events WHERE event_id < 200)
        |ORDER BY event_id""".stripMargin,
    "q28_dms" ->
      """SELECT c_custkey,
        |  printf('%d deg %d'' %.1f" %s', deg, mnt, sec, dir) AS dms,
        |  round((deg + mnt / 60.0 + sec / 3600.0) * (CASE WHEN dir = 'S' THEN -1 ELSE 1 END), 6) AS dec_value
        |FROM (SELECT c_custkey, c_custkey % 90 AS deg, (c_custkey * 7) % 60 AS mnt,
        |        CAST(c_custkey % 600 AS DOUBLE) / 10.0 AS sec,
        |        CASE WHEN c_custkey % 2 = 0 THEN 'N' ELSE 'S' END AS dir
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q29_ascii_status" ->
      """SELECT lang,
        |  CASE WHEN regexp_matches(text, '^[\x00-\x7F]*$') THEN 'ascii_ok'
        |       ELSE 'encoding_error' END AS status,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
