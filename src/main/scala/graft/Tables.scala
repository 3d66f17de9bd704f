package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every operator in the engine takes `(SparkSession, sfDir)` and loads
  * through here, so reads stay declarative: Catalyst pushes filters and
  * column pruning into the vectorized Parquet scan, which is the behavior
  * we rely on at 100 TB (partition pruning + column projection instead of
  * the reference's full-file materialization, e.g.
  * /root/reference/code/embeddings.py:13-27 loading a corpus into RAM).
  */
object Tables {

  /** Schema memo: `spark.read.parquet(path)` with no user schema runs a
    * footer-inference step per call — one extra driver round-trip/job per
    * query, ~40–80 ms each, which across a 230-query bench pass is pure
    * fixed overhead (optimization guide §1.2: per-task/driver work after
    * the algorithm is right). The schema of a parquet table is a property
    * of the files, not of the query, so it is inferred ONCE per path and
    * passed explicitly afterwards — the scan itself (pushdown, pruning,
    * vectorized read) is unchanged, and a different dataset dir keys a
    * fresh entry. Values, not results, are memoized: every query still
    * computes from the parquet inputs.
    *
    * ASSUMPTION (r21 ADVICE): a dataset dir is immutable for the JVM's
    * lifetime — the driver never rewrites /root/testdata in-process, and
    * every engine writer targets session temp dirs, never these tables.
    * Tooling that regenerates a table at the SAME path in-process would
    * be served the stale schema; such tooling must use a fresh dir (the
    * convention everywhere in this repo) or restart the JVM. Keying by
    * file-listing signature instead (IvfIndex.load's shape) would spend
    * a directory listing per load — exactly the driver round-trip this
    * memo exists to remove. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has shipped as three physical types across testdata
    * generations: parquet TIMESTAMP(NANOS) (read as Long via the legacy
    * nanosAsLong conf), plain timestamp[us] without a UTC flag (read as
    * TIMESTAMP_NTZ), and UTC-adjusted micros (read as TimestampType).
    * Normalize all three to TimestampType micros so every downstream
    * operator sees one schema — values are bit-identical to DuckDB's
    * reading at second/day granularity (session TZ is UTC on both
    * engines, so NTZ wall-clock == UTC instant). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      // `div` (integral division) — a double divide would lose precision
      // on nanosecond epochs (~1.7e18 > 2^53).
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _                => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
