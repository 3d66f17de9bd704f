package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: profile the q74 embedding-dedup pipeline — pair-sweep cost,
  * edge count, and ConnectedComponents iteration count/cost at a given sf.
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileCC /root/testdata/sf0.1" */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // jump sanity: a 100-vertex chain must converge in O(log n) rounds
    timed("chain-100") {
      import spark.implicits._
      val chain = (0L until 99L).map(i => (i, i + 1)).toDF("a", "b")
      val n = graft.ops.ConnectedComponents.run(chain, verbose = true)
        .agg(countDistinct(col("label"))).head().getLong(0)
      println(s"  chain components: $n")
    }

    val pairs = timed("pair sweep (count)") {
      val p = graft.ops.Similarity.cosinePairsForProfile(spark, d)
        .select(col("vec_a"), col("vec_b")).cache()
      println(s"  pairs: ${p.count()}")
      p
    }
    timed("connected components") {
      val labels = graft.ops.ConnectedComponents.run(pairs, verbose = true)
      println(s"  vertices: ${labels.count()}, components: " +
        labels.agg(countDistinct(col("label"))).head().getLong(0))
    }
    timed("full q74") {
      graft.ops.Similarity.q74EmbedDedup(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
