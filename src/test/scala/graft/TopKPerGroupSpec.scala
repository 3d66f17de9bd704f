package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopKPerGroup

/** Custom whole-operator plan (LogicalPlan + SparkStrategy + SparkPlan):
  * bounded-heap top-k per group must agree with the window formulation and
  * actually plan through TopKPerGroupExec. */
class TopKPerGroupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("agrees with the row_number window formulation (q06 semantics)") {
    val docs = Tables.documents(spark, sf)
    val native = TopKPerGroup(docs,
      groupCols = Seq("lang"),
      orderKeys = Seq(TopKPerGroup.Key("n_chars", desc = true), TopKPerGroup.Key("doc_id")), k = 3)
      .select("lang", "doc_id", "n_chars")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    val windowed = docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("lang", "doc_id", "n_chars")
    val a = native.collect().map(_.toSeq).toSet
    val b = windowed.collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 15) // 5 langs x 3
  }

  test("plans through TopKPerGroupExec with a single shuffle on the group key") {
    val docs = Tables.documents(spark, sf)
    val df = TopKPerGroup(docs, Seq("lang"), Seq(TopKPerGroup.Key("n_chars", desc = true)), 2)
    df.collect() // materialize so AQE finalizes the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), plan) // exec node prints without the Exec suffix
    assert(plan.contains("hashpartitioning(lang"), plan)
    // partial (map-side) operator below the exchange, final above — the
    // partial/final shape of hash aggregation
    assert("TopKPerGroup \\[".r.findAllIn(plan.split("== Initial Plan ==")(0)).size == 2, plan)
    // no sort anywhere: the heap replaces it
    assert(!plan.contains("Sort "), plan)
  }

  test("TopKRewrite rule replans the declarative window form through the heap operator") {
    graft.plans.GraftExtensions.register(spark)
    val q = ops.Relational.q64TopkRewritten(spark, sf)
    // the optimized plan must contain the rewritten operator and no Window
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.collectFirst {
      case t: graft.plans.TopKPerGroup => t }.isDefined,
      s"rewrite did not fire:\n$optimized")
    assert(optimized.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isEmpty,
      s"window survived the rewrite:\n$optimized")
    // and the rewrite preserves the SQL answer
    val viaRule = q.collect().map(_.toSeq)
    val reference = ops.Relational.q58TopkNative(spark, sf).collect().map(_.toSeq)
    assert(viaRule.toSeq == reference.toSeq)
  }

  test("rewrite does NOT fire when the query projects the rank column") {
    graft.plans.GraftExtensions.register(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id"))
    val q = Tables.documents(spark, sf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("lang"), col("rn"), col("doc_id")) // rank kept → no rewrite
    val optimized = q.queryExecution.optimizedPlan
    assert(optimized.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }.isDefined,
      s"rewrite fired on a rank-projecting query:\n$optimized")
  }

  test("k larger than any group returns all rows") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val out = TopKPerGroup(docs, Seq("lang"), Seq(TopKPerGroup.Key("doc_id")), 1000)
    assert(out.count() == 20)
  }

  test("partial-mode flush at high group cardinality keeps results exact") {
    import spark.implicits._
    // > MaxPartialGroups (64k) distinct groups in ONE input partition forces
    // at least one mid-stream flush of the partial heap map; the final
    // operator must merge the fragments back to an exact per-group top-1
    val n = graft.plans.TopKPerGroupExec.MaxPartialGroups + 5000
    val df = spark.range(0, n.toLong * 2, 1, 1)
      .select((col("id") % n).as("g"), col("id").as("v"))
    val out = TopKPerGroup(df, Seq("g"), Seq(TopKPerGroup.Key("v", desc = true)), 1)
    // exact answer: every group keeps its larger element, v = g + n
    assert(out.count() == n)
    assert(out.filter(col("v") =!= col("g") + n).count() == 0)
  }

  test("ties at the boundary resolve by the tiebreaker order column") {
    import spark.implicits._
    val df = Seq(("a", 10, 1L), ("a", 10, 2L), ("a", 10, 3L), ("b", 5, 4L))
      .toDF("g", "v", "id")
    val out = TopKPerGroup(df, Seq("g"), Seq(TopKPerGroup.Key("v", desc = true), TopKPerGroup.Key("id")), 2)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(out == Set(("a", 1L), ("a", 2L), ("b", 4L)))
  }
}
