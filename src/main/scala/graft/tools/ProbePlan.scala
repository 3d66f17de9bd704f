package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility (r21, ADVICE #4): does the 64-bit multi-probe projection
  * (718 shift/and/xor variants in one array) still WHOLE-STAGE compile,
  * or does Janino's 64KB method limit silently fall back to interpreted
  * evaluation? Prints the executed plan's codegen spans and times the
  * probe explode both ways.
  * Run: sbt "runMain graft.tools.ProbePlan"
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 200000L
    val h = spark.range(n).select(col("id").as("doc_id"),
      xxhash64(col("id")).as("ahash"))
    val probes = graft.ops.Multimodal.withPhashProbes(h, 64)
    println("==== executed plan (withPhashProbes, 64-bit) ====")
    val plan = probes.queryExecution.executedPlan.toString
    println(plan.linesIterator.take(12).mkString("\n"))
    println("WholeStageCodegen spans: " +
      "WholeStageCodegen".r.findAllIn(plan).size)
    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[probe] $name%-28s min=${ts.min}%7.3f")
    }
    time("probe explode 200k x 718")(
      probes.select(count(col("bhash"))).collect())
    // fallback check: CodeGenerator logs errors at WARN; also compare a
    // trivially-codegen shape for a latency floor
    val bands = graft.ops.Multimodal.withPhashBands(h, 64)
    time("exact bands 200k x 3")(
      bands.select(count(col("bhash"))).collect())
    spark.stop()
  }
}
