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

  /** Write `df` as `outDir/shard=K/part-*.parquet` (layout, file-size
    * bound, and round-trip asserted in ShardExportSpec; the q86 query is
    * the matching manifest). A refresh of an existing export publishes
    * through [[SwapProtocol]] — a training loader pointed at `outDir`
    * never sees the shards half-deleted mid-rewrite. */
  def write(df: DataFrame, idCol: String, outDir: String,
      nShards: Int = 8, maxRecordsPerFile: Int = 1 << 20): Unit = {
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = dst.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    SwapProtocol.writeSwapped(fs, dst) { tmp =>
      df.withColumn("shard", shardAssignment(col(idCol), nShards))
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col(idCol))
        .write
        .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
        .partitionBy("shard")
        .parquet(tmp.toString)
    }
  }
}
