package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: repeated timings of the hot queries to separate plan cost
  * from session/JIT warmup. Run: sbt "runMain graft.tools.ProfileQ45 <sfDir>" */
object ProfileQ45 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def run(name: String, q: String): Unit =
      time(name)(graft.SparkEntry.queries(q)(spark, d)
        .write.format("noop").mode("overwrite").save())
    // warmup
    run("warmup q45", "q45_ann_ivf")
    for (i <- 1 to 3) {
      run(s"q45 #$i", "q45_ann_ivf")
      run(s"q50 #$i", "q50_topic_info")
      run(s"q51 #$i", "q51_topic_terms")
      run(s"q56 #$i", "q56_dedup_canonical")
    }
    spark.stop()
  }
}
