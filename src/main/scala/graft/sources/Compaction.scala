package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest (streaming sinks, per-batch appends) needs: many small parquet
  * files → few files near a target size, laid out range-partitioned on
  * the id so every output file covers a disjoint, sorted id range
  * (parquet footer min/max then prunes point/range reads to one file).
  *
  * Scale notes: the input size comes from the file-system listing
  * (metadata only, no data read); the rewrite is ONE range shuffle
  * (repartitionByRange samples the id distribution, so output files
  * balance even under skewed ids). Reference anchor: the reference's
  * per-document output files (htmlConverter.py one-txt-per-doc) are
  * exactly the small-file shape this repairs. */
object Compaction {

  /** Total bytes of data files under `dir` (recursive, metadata-only). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def walk(p: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_")) 0L // commit markers
        else st.getLen
      }.sum
    walk(path)
  }

  /** Rewrite `inDir` into `outDir` as ~`targetBytes`-sized, id-range-
    * partitioned, id-sorted parquet files. Returns the output file count. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      idCol: String, targetBytes: Long = 128L << 20): Int = {
    val bytes = dataBytes(spark, inDir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(nFiles, col(idCol))
      .sortWithinPartitions(idCol)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
