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
    * partitioned, id-sorted parquet files. Returns the output file count.
    * Published through [[SwapProtocol.writePointed]] — pointer mode, not
    * directory rename or `mode("overwrite")`, because a compacted
    * serving table is exactly the LARGE directory where an object-store
    * rename is a non-atomic O(files) copy (r17 verdict #1): the rewrite
    * lands in a fresh `outDir__v<N>/`, one tiny pointer object flips,
    * the previous version stays retained-and-readable through the flip,
    * and a crashed publish is completed by the next reader/writer. This
    * also makes IN-PLACE compaction (`inDir == outDir`) safe — the
    * rewrite reads the live version and lands in the next one. Both the
    * input and the output may be pointer-managed or plain dirs
    * ([[SwapProtocol.resolve]] handles either); readers resolve.
    *
    * `retain` pins the reader-lifetime contract at this site (r18
    * verdict #6): a compacted version survives `retain − 1` further
    * compactions, so the longest query running against a cached resolved
    * path must finish (or re-resolve) within that many maintenance
    * cycles. Default 2 = one cycle of grace — compaction cadence is
    * hours while query lifetimes are minutes; raise it where ad-hoc
    * scans outlive the cadence. */
  // sized by: the read split — 128 MB equals the parquet-era block/
  // row-group sweet spot AND Spark's default files.maxPartitionBytes,
  // so one compacted file = one read task: big enough to amortize
  // footer/task overhead (the whole point of compaction), small enough
  // to keep scan parallelism and footer-prune granularity
  def compact(spark: SparkSession, inDir: String, outDir: String,
      idCol: String, targetBytes: Long = 128L << 20, retain: Int = 2): Int = {
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    // migrate a plain output table into the version store BEFORE
    // resolving the input: for IN-PLACE compaction the input IS the
    // output's live data, and the rewrite's scan must plan against the
    // post-migration path (the retired __v0), not the renamed-away one
    SwapProtocol.migrateIfPlain(fs, dst)
    val in = SwapProtocol.resolve(spark, inDir)
    val bytes = dataBytes(spark, in)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    SwapProtocol.writePointed(fs, dst, retain) { vdir =>
      spark.read.parquet(in)
        .repartitionByRange(nFiles, col(idCol))
        .sortWithinPartitions(idCol)
        .write.parquet(vdir.toString)
    }
    nFiles
  }

  /** Live data path of a compacted table at `dir` — see
    * [[SwapProtocol.resolve]]. */
  def resolve(spark: SparkSession, dir: String): String =
    SwapProtocol.resolve(spark, dir)

  /** Z-ORDER compaction — the multi-column data-skipping layout: rows are
    * laid out along a Morton (bit-interleaved) curve over TWO numeric
    * columns, so every output file covers a small RECTANGLE in (a, b)
    * space and parquet footer min/max prunes point/range reads on EITHER
    * column (a single-column sort prunes only its own column; the second
    * column spans the full range in every file).
    *
    * Construction is the production one (Delta/Iceberg OPTIMIZE ZORDER):
    * each column is rank-normalized to an 8-bit bucket via SAMPLED
    * quantile boundaries (`approxQuantile` — one bounded-memory sketch
    * pass; 255 boundary doubles broadcast in the closure), buckets are
    * bit-interleaved into a 16-bit z-value, and the rewrite is the same
    * ONE range shuffle as [[compact]], keyed on z. Rank normalization —
    * not raw bits — keeps the curve balanced under skew: each bucket holds
    * ~1/256 of the rows by construction, so file rectangles stay uniform
    * regardless of the value distribution. */
  // sized by: the read split (see compact — same 128 MB file-per-task
  // rationale; retain: see compact's reader-lifetime contract)
  def zorderCompact(spark: SparkSession, inDir: String, outDir: String,
      colA: String, colB: String, targetBytes: Long = 128L << 20,
      retain: Int = 2): Int = {
    val dstPre = new org.apache.hadoop.fs.Path(outDir)
    SwapProtocol.migrateIfPlain( // see compact: in-place reads post-migration
      dstPre.getFileSystem(spark.sessionState.newHadoopConf()), dstPre)
    val in = SwapProtocol.resolve(spark, inDir)
    val bytes = dataBytes(spark, in)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(in)
    val probs = (1 until 256).map(_.toDouble / 256).toArray
    val Seq(boundsA, boundsB) =
      Seq(colA, colB).map(c => df.stat.approxQuantile(c, probs, 0.01))
    def bucket(bounds: Array[Double]) = udf { (v: Double) =>
      // first bucket whose upper boundary admits v: binarySearch insertion
      // point == count of boundaries < v (ties land left, off-by-one safe)
      val i = java.util.Arrays.binarySearch(bounds, v)
      if (i >= 0) i else -(i + 1)
    }
    val interleave = udf { (a: Int, b: Int) =>
      var z = 0
      var bit = 0
      while (bit < 8) {
        z |= ((a >> bit) & 1) << (2 * bit + 1)
        z |= ((b >> bit) & 1) << (2 * bit)
        bit += 1
      }
      z
    }
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    SwapProtocol.writePointed(fs, dst, retain) { vdir =>
      df.withColumn("__z",
          interleave(bucket(boundsA)(col(colA).cast("double")),
            bucket(boundsB)(col(colB).cast("double"))))
        .repartitionByRange(nFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.parquet(vdir.toString)
    }
    nFiles
  }
}
