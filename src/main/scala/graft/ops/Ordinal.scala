package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed global ordinal — assign every row its 1-based position in a
  * total order WITHOUT an unpartitioned window (`row_number() OVER
  * (ORDER BY …)` moves the whole table through one task — the exact
  * anti-pattern the plan audits reject; at 100 TB it simply never
  * finishes).
  *
  * The TeraSort-shaped plan:
  *   1. `repartitionByRange` + `sortWithinPartitions` on the sort
  *      expressions — partition i holds keys ordered before partition
  *      i+1's and each partition is locally sorted (the standard
  *      distributed-sort phase; boundary placement comes from sampling
  *      and may vary, but the OUTPUT depends only on the total order,
  *      which the caller makes unique via a tiebreak column).
  *   2. `zipWithIndex` over the sorted RDD — Spark's canonical
  *      distributed ordinal: one light count job over the partition
  *      sizes (≤ numPartitions longs of driver state), then a narrow
  *      map attaching offset+local index. NO second shuffle — the
  *      alternative (a `row_number` window partitioned by
  *      `spark_partition_id`) would re-shuffle the whole table by hash
  *      just to regroup rows that are already co-located.
  *
  * This is the one sanctioned `mapPartitions`-tier drop in the engine:
  * genuine per-partition imperative logic (index attachment) that the
  * declarative API can only express with a redundant exchange. The cost
  * is the result arriving as an RDD scan (downstream codegen restarts
  * from it) — fine for the terminal ordering queries this serves.
  *
  * Caller contract: `sortExprs` must define a TOTAL order (include a
  * unique tiebreak such as the row id); otherwise positions of tied rows
  * are partition-placement-dependent.
  */
object Ordinal {

  /** The distributed-sort stage — exposed so the plan audit can assert
    * the range exchange that [[globalOrdinal]]'s RDD hop then hides. */
  private[graft] def rangeSortedStage(df: DataFrame, sortExprs: Seq[Column],
      numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)

  def globalOrdinal(df: DataFrame, sortExprs: Seq[Column],
      numPartitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val sorted = rangeSortedStage(df, sortExprs, numPartitions)
    val out = StructType(sorted.schema.fields :+ StructField("pos", LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, out)
  }
}
