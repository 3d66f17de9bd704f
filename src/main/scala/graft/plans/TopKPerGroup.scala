package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graft.GraftInternal

/** Whole-operator Catalyst extension (SURVEY §4 / the engine's custom-plan
  * demonstration): top-k rows per group via bounded per-group heaps.
  *
  * The declarative formulation (`row_number().over(partitionBy(g).orderBy(o))
  * .filter(rn <= k)`, q06) sorts EVERY group's full contents before
  * discarding all but k rows. This operator keeps only k rows per group at
  * any moment: one shuffle on the group key (requiredChildDistribution —
  * EnsureRequirements inserts the exchange), then a streaming pass with a
  * size-k heap per group. At 100 TB with hot groups this is the difference
  * between sorting a group's millions of rows and holding k of them.
  *
  * Registered as a planner strategy (`TopKPerGroupStrategy`) via
  * `spark.experimental.extraStrategies` (equivalent to
  * `SparkSessionExtensions.injectPlannerStrategy`).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Partial mode runs before the exchange (map-side combine: each input
    * partition emits at most k rows per group it has seen — the top-k
    * analogue of partial aggregation); only the final operator requires
    * co-located groups. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  /** Memory bound. Partial mode flushes the heap map whenever it reaches
    * `MaxPartialGroups` distinct groups — correctness is unaffected because
    * the final operator merges the (≤ k-row) fragments per group, exactly as
    * final hash aggregation merges partial-agg flushes. So partial memory is
    * O(MaxPartialGroups × k) regardless of per-partition key cardinality;
    * the trade is reduced combining (more shuffled rows), never OOM.
    *
    * FINAL mode holds one k-row heap per group in its partition and has NO
    * spill path (unlike Spark's final hash aggregation, which sort-spills):
    * memory is O(groups-in-partition × k). At pathological group cardinality
    * raise `spark.sql.shuffle.partitions` so each partition holds fewer
    * groups, or fall back to the declarative window formulation (q06), which
    * sort-spills. This limitation is deliberate — a spilling final merge
    * would re-implement ExternalSorter for a fast-path operator. */
  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val flushThreshold = if (partial) TopKPerGroupExec.MaxPartialGroups else Int.MaxValue
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val rowOrd: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(orderE, childOutput)
      // heap rooted at the WORST kept row: Scala's PriorityQueue head is the
      // GREATEST under its ordering, and under SortOrder compare semantics
      // "greatest" == sorts-last == worst kept
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      def offer(heap: mutable.PriorityQueue[UnsafeRow], row: InternalRow): Unit = {
        if (heap.size < kk) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrd.compare(row, heap.head) < 0) {
          // new row sorts strictly before the current worst kept row
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      // batches of output rows: each batch consumes input until the group map
      // hits the flush threshold (partial mode only) or input is exhausted,
      // then drains the map in sort order per group
      new Iterator[Iterator[InternalRow]] {
        override def hasNext: Boolean = it.hasNext || heaps.nonEmpty
        override def next(): Iterator[InternalRow] = {
          var full = false
          while (it.hasNext && !full) {
            val row = it.next()
            val key = keyProj(row)
            heaps.get(key) match {
              case Some(heap) => offer(heap, row)
              case None =>
                val heap = mutable.PriorityQueue.empty[UnsafeRow](
                  rowOrd.asInstanceOf[Ordering[UnsafeRow]])
                heaps.put(key.copy(), heap)
                offer(heap, row)
                if (heaps.size >= flushThreshold) full = true
            }
          }
          val drained = heaps.values.toIndexedSeq
          heaps.clear()
          // emit in sort order for deterministic downstream consumption
          drained.iterator.flatMap(_.dequeueAll.reverseIterator)
        }
      }.flatten
    }, preservesPartitioning = true)
  }

  /** Row-filtering only — the child's partitioning survives, so a
    * downstream operator clustered on the same keys (e.g. a rank window
    * over the ≤ k kept rows per group, q57) does NOT re-shuffle. Without
    * this override SparkPlan defaults to UnknownPartitioning and
    * EnsureRequirements inserts a redundant exchange. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-mode flush bound: ~64k groups × k rows held at once. */
  val MaxPartialGroups: Int = 1 << 16
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      // partial (pre-shuffle, map-side) -> exchange -> final, exactly like
      // partial/final hash aggregation: the shuffle moves at most
      // k × groups-per-partition rows instead of the full input
      TopKPerGroupExec(g, o, k, partial = false,
        TopKPerGroupExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Sort key: column name + direction. */
  case class Key(name: String, desc: Boolean = false)

  /** DataFrame-side entry: top `k` rows per `groupCols` by `orderKeys`.
    * Columns are resolved by name against the analyzed child plan — the
    * node is constructed fully resolved, so no analyzer rule is needed. */
  def apply(df: DataFrame, groupCols: Seq[String], orderKeys: Seq[Key], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val analyzed = GraftInternal.logicalPlan(df)
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not in ${analyzed.output.map(_.name)}"))
    val orderExprs = orderKeys.map { key =>
      SortOrder(attr(key.name),
        if (key.desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    GraftInternal.ofRows(spark,
      TopKPerGroup(groupCols.map(attr(_)), orderExprs, k, analyzed))
  }
}
