package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom optimizer rule (SURVEY §4's `Rule[LogicalPlan]` surface): rewrites
  * the declarative top-k-per-group pattern
  *
  *   Project(cols, Filter(rn <= k, Window(row_number over (g, o), child)))
  *
  * into the engine's bounded-heap whole-operator plan
  *
  *   Project(cols, TopKPerGroup(g, o, k, child))
  *
  * whenever the rank column is dropped by the enclosing projection — i.e.
  * the query wants the top-k ROWS, not the rank itself. The window form
  * sorts every group's full contents (Spark's WindowGroupLimit prunes to k
  * per partition but still sorts); the rewritten operator keeps a k-row
  * heap per group and never sorts. Queries that project the rank are left
  * untouched (the operator does not produce it).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (class
  * [[GraftExtensions]]) or post-hoc through
  * `spark.experimental.extraOptimizations` ([[GraftExtensions.register]]).
  * The extra-optimizations batch runs to fixed point — the rewrite is
  * convergent because [[TopKPerGroup]] never matches the pattern again.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** `rn <= k` / `rn < k` on the window's rank attribute → k. */
  private def extractK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  /** By extra-optimizations time InferWindowGroupLimit may already have
    * planted its per-partition pruning node below the window — the rewrite
    * subsumes it. */
  private def unwrap(windowChild: LogicalPlan): LogicalPlan = windowChild match {
    case WindowGroupLimit(_, _, _, _, c) => c
    case c => c
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, windowChild, _)))
        if partitionSpec.nonEmpty && {
          val rn = alias.toAttribute
          extractK(cond, rn).exists(_ > 0) &&
            !projectList.exists(_.references.contains(rn)) &&
            projectList.forall(_.references.subsetOf(unwrap(windowChild).outputSet))
        } =>
      val child = unwrap(windowChild)
      Project(projectList,
        TopKPerGroup(partitionSpec, orderSpec,
          extractK(cond, alias.toAttribute).get, child))
  }
}
