package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level breakdown of q45 (IVF build vs search) and the
  * q50 topic fit. Run: sbt "runMain graft.tools.ProfileQ45Stages <sfDir>" */
object ProfileQ45Stages {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup the session
    graft.SparkEntry.queries("q01_pricing_summary")(spark, d)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val e = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      val idx = time(s"#$i ivf build (kmeans+assign)")(
        graft.ops.IvfIndex.build(spark, e, nCells = 32, seed = 7L))
      time(s"#$i ivf assign materialize")(
        idx.cells.write.format("noop").mode("overwrite").save())
      time(s"#$i ivf search")(
        graft.ops.IvfIndex.searchTop1(spark, idx, e, nProbe = 8)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
