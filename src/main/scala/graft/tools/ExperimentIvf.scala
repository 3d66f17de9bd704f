package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: IVF recall/time trade — init mode, cell count, probe
  * count vs exact brute-force top-1 agreement on the embeddings table.
  * Run: sbt "runMain graft.tools.ExperimentIvf /root/testdata/sf0.1" */
object ExperimentIvf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding")).cache()
    e.count()
    // exact truth: brute-force top-1 per vector via the block sweep
    val exact = graft.ops.Similarity.cosinePairsForProfile(spark, d)
      .select(col("vec_a"), col("vec_b"), col("cos_raw"))
    // cosinePairs is thresholded; build truth directly instead
    val vecs = e.as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = vecs.iterator.map { case (id, v) =>
      var bestId = Long.MaxValue; var bestCos = Double.NegativeInfinity
      vecs.foreach { case (cid, cv) =>
        if (cid != id) {
          val c = cos(v, cv)
          if (c > bestCos || (c == bestCos && cid < bestId)) { bestCos = c; bestId = cid }
        }
      }
      id -> bestId
    }.toMap
    println(s"[ivf] truth built for ${truth.size} vectors")
    for ((init, cells, probe, rep) <- Seq(
        ("random", 32, 12, 1), ("random", 32, 12, 2), ("random", 32, 12, 3),
        ("random", 32, 16, 1), ("random", 32, 16, 2),
        ("k-means||", 32, 12, 2), ("random", 64, 16, 2))) {
      val t0 = System.nanoTime()
      val idx = graft.ops.IvfIndex.build(spark, e, nCells = cells, seed = 7L,
        initMode = init, nReplicas = rep)
      val got = graft.ops.IvfIndex.searchTop1(spark, idx, e, nProbe = probe)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val agree = got.count { case (q, nn) => truth.get(q).contains(nn) }
      println(f"[ivf] init=$init%-10s cells=$cells%3d probe=$probe%3d rep=$rep%2d " +
        f"recall=${agree.toDouble / truth.size}%.3f time=$sec%6.2f s")
    }
    spark.stop()
  }
}
