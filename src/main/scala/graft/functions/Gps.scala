package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GPS / EXIF scalar functions (SURVEY C13/C14).
  *
  * The reference's EXIF records expose DMS coordinate strings like
  * `38 deg 55' 58.80" N` and timestamps like `2021:01:04 18:59:50-05:00`
  * (/root/reference/analysis/preview_data.ipynb:cell-8); its GPS workflow
  * (ID_matching_metadata.py key-prefix scan + processed_files_GPS.txt) exists
  * to locate posts, so the engine completes the pair with the decimal
  * conversion. Pure built-in expressions (regexp_extract + arithmetic) —
  * fully codegen'd, no UDF.
  */
object Gps {

  private val DmsRe = """(\d+) deg (\d+)' ([\d.]+)" ([NSEW])"""

  /** `38 deg 55' 58.80" N` → 38.9330; S/W are negative; malformed → null. */
  def dmsToDecimal(c: Column): Column = {
    val deg = regexp_extract(c, DmsRe, 1).cast("double")
    val min = regexp_extract(c, DmsRe, 2).cast("double")
    val sec = regexp_extract(c, DmsRe, 3).cast("double")
    val dir = regexp_extract(c, DmsRe, 4)
    val unsigned = deg + min / lit(60.0) + sec / lit(3600.0)
    when(dir.isin("S", "W"), -unsigned)
      .when(dir.isin("N", "E"), unsigned)
      .otherwise(lit(null).cast("double"))
  }

  /** EXIF timestamp `2021:01:04 18:59:50-05:00` → TimestampType (UTC). */
  def exifTimestamp(c: Column): Column =
    to_timestamp(c, "yyyy:MM:dd HH:mm:ssXXX")

  /** Zone-less EXIF timestamp `2021:01:04 18:59:50` (session-TZ wall time). */
  def exifTimestampLocal(c: Column): Column =
    to_timestamp(c, "yyyy:MM:dd HH:mm:ss")
}
