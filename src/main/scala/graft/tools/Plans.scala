package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump formatted physical plans for plan-quality review
  * (pushdown, pruning, join strategy, codegen coverage).
  * Run: sbt "runMain graft.tools.Plans /root/testdata/sf0.01 q01_pricing_summary q13_join_revenue" */
object Plans {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("GRAFT_PLANS_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // show the REAL computation shape, not the checkpointed LogicalRDD
    // the cache-lifecycle wrapper returns (same switch PlanAuditSpec uses)
    spark.conf.set(graft.ops.Caching.PassthroughKey, "true")
    names.foreach { n =>
      println(s"========== $n ==========")
      try graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
