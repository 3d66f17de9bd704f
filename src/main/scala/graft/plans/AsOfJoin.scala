package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.GraftInternal

/** Native AS-OF join — the engine's second whole-operator Catalyst plan
  * (SURVEY §2.3's absent as-of row; q59 is the built-in composition of the
  * same semantics, this operator is the direct physical form).
  *
  * Semantics (left outer as-of): for every left row, the single right row
  * with equal keys and the GREATEST right time ≤ the left time; left rows
  * with no such right row keep nulls on the right — DuckDB's
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.t >= r.t`.
  *
  * Null join keys compare like sort keys (null = null matches, i.e.
  * IS NOT DISTINCT FROM), unlike a SQL equi-join which would drop them —
  * pre-filter null-keyed rows if SQL semantics are required.
  *
  * Physical shape: both sides hash-cluster on the join keys
  * (requiredChildDistribution — EnsureRequirements inserts compatible
  * exchanges) and sort within partitions by (keys, time)
  * (requiredChildOrdering — SortExec), then one streaming MERGE pass per
  * partition with O(1) carried state: a cursor into the right side and the
  * last right row consumed for the current key. Versus the union+window
  * composition (q59) this shuffles each side once with NO unioned
  * intermediate, no null-padded column superset, and no window buffering —
  * per-partition memory is one row, at any key cardinality or history
  * length. At 100 TB this is the plan a time-series store ships: the as-of
  * probe never materializes (left × history) anything.
  */
case class AsOfJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  // right side is nullable: unmatched left rows emit nulls (left outer)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-cluster both sides on the join keys — the SortMergeJoin contract;
    * EnsureRequirements makes the two hash partitionings compatible. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** (keys asc, time asc) within each partition — the merge precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) :+
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending),
    rightKeys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) :+
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val allOutput = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt0) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      // bind against NULLABLE right attributes: the null-padded miss row must
      // hit the projection's null check, not be read as a primitive zero
      val resultProj = UnsafeProjection.create(allOutput,
        lOutput ++ rOutput.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOutput.length)
      val rIt = rIt0.buffered
      // carried state: the last right row consumed whose key matched the
      // key it was consumed under (rows are reused buffers — copy to keep)
      var lastMatch: UnsafeRow = null
      var lastMatchKey: UnsafeRow = null
      lIt.map { l =>
        val lk = lKeyProj(l)
        val lt = lTimeProj(l).copy() // survives rTimeProj reuse below
        // advance the right cursor past every row that can never match a
        // FUTURE left row: key strictly behind, or same key with time ≤
        // this left time (each consumed same-key row supersedes the last)
        var advancing = true
        while (advancing && rIt.hasNext) {
          val rk = rKeyProj(rIt.head)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) { rIt.next(); lastMatch = null; lastMatchKey = null }
          else if (c == 0 && timeOrd.compare(rTimeProj(rIt.head), lt) <= 0) {
            lastMatch = rIt.next().copy().asInstanceOf[UnsafeRow]
            lastMatchKey = lk.copy()
          } else advancing = false
        }
        val matched = lastMatch != null && lastMatchKey == lk
        resultProj(joined(l, if (matched) lastMatch else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** DataFrame-side entry. `leftOn`/`rightOn` are the equality keys,
    * `leftTime`/`rightTime` the as-of ordering columns. Output = left
    * columns ++ right columns (right nulled when no match) — give the two
    * sides disjoint column names. Both plans may share lineage (self-join):
    * the right side is re-aliased to fresh attribute ids. */
  def apply(left: DataFrame, right: DataFrame,
      leftOn: Seq[String], rightOn: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = GraftInternal.logicalPlan(left)
    // fresh exprIds on the right: a self-join would otherwise carry duplicate
    // attribute ids into the binary node and make binding ambiguous
    val rAnalyzed = GraftInternal.logicalPlan(right)
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not in ${p.output.map(_.name)}"))
    require(attr(lPlan, leftTime).dataType == attr(rPlan, rightTime).dataType,
      "as-of time columns must share a data type")
    GraftInternal.ofRows(spark, AsOfJoin(
      leftOn.map(attr(lPlan, _)), rightOn.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime), lPlan, rPlan))
  }
}
