package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine SQL surface via SparkSessionExtensions: registers the custom
  * Catalyst expressions and scalar UDFs so `spark.sql(...)` users get the
  * same functions the DataFrame API exposes.
  *
  * Usage:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or config `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * post-hoc via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.dmsToDecimalDescriptor)
    e.injectFunction(GraftExtensions.cosineSimDescriptor)
    e.injectFunction(GraftExtensions.kmvDistinctDescriptor)
    e.injectFunction(GraftExtensions.htmlPostTextDescriptor)
    // custom Rule[LogicalPlan]: declarative top-k window → bounded-heap plan
    e.injectOptimizerRule(_ => TopKRewrite)
    // custom whole-operator strategies
    e.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private[plans] val dmsToDecimalDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dms_to_decimal"),
    new ExpressionInfo(classOf[DmsToDecimal].getName, "dms_to_decimal"),
    (children: Seq[Expression]) => DmsToDecimal(children.head))

  private[plans] val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  private[plans] val kmvDistinctDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_distinct"),
    new ExpressionInfo(classOf[KmvDistinct].getName, "kmv_distinct"),
    (children: Seq[Expression]) => KmvDistinct(children(0), children(1)))

  private[plans] def htmlPostTextBuilder(children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw org.apache.spark.sql.graft.GraftInternal
        .wrongNumArgs("html_post_text", 1, children.length)
    HtmlPostText(children.head)
  }

  private[plans] val htmlPostTextDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("html_post_text"),
    new ExpressionInfo(classOf[HtmlPostText].getName, "html_post_text"),
    htmlPostTextBuilder _)

  /** Register the engine functions, optimizer rule, and planner strategies
    * on an already-built session (covers the driver-constructed sessions in
    * Verify/Bench/tests). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dms_to_decimal", exprs => DmsToDecimal(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    // native aggregate: the analyzer wraps a bare AggregateFunction from the
    // registry into an AggregateExpression during resolution
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct", exprs => KmvDistinct(exprs(0), exprs(1)), "scala_udf")
    // native expression (was a Scala UDF pre-r9): SQL users get the same
    // codegen form as the Column API
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "html_post_text", htmlPostTextBuilder, "scala_udf")
    // winnowing fingerprint for SQL users: the shared JVM normText twin,
    // then the MOSS kernel
    val winnow = graft.functions.TextFns.winnowKernelFn(8, 4)
    spark.udf.register("winnow_fingerprints", (s: String) =>
      if (s == null) null
      else winnow(graft.functions.TextFns.normTextJvm(s)))
    if (!spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewrite
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
