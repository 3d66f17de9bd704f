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

    // SECOND-HOP PROBE EXPANSION (the r6 verdict's "re-rank" lead, made
    // honest): member vectors are stored RAW, so candidate scores are
    // already exact cosines — re-scoring a top-8 list cannot change the
    // ranking. The only way a missed true neighbor enters the pool is
    // probing MORE cells; the candidate-guided choice is the top-8
    // candidates' own replica cells (neighbors-of-neighbors). Simulated
    // driver-side (2k vectors): measures agreement and the effective
    // probed-cell count against the rep-3 alternative.
    {
      val nCells = 32; val nProbe = 12; val rep = 2; val hopK = 8
      val idx = graft.ops.IvfIndex.build(spark, e, nCells = nCells, seed = 7L,
        nReplicas = rep)
      val centroids = idx.centroids
      def unitV(v: Array[Float]): Array[Float] = {
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (n == 0.0) v else v.map(x => (x / n).toFloat)
      }
      def nearCells(v: Array[Float], k: Int): Array[Int] = {
        val u = unitV(v)
        centroids.zipWithIndex.map { case (c, i) =>
          var s = 0.0; var j = 0
          while (j < c.length) { val dd = u(j) - c(j); s += dd * dd; j += 1 }
          (s, i)
        }.sortBy(_._1).take(k).map(_._2)
      }
      val cellOf = vecs.map { case (id, v) => id -> nearCells(v, rep) }.toMap
      val byCell = vecs.flatMap { case (id, v) => cellOf(id).map(c => (c, (id, v))) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var agree1 = 0; var agree2 = 0; var probedSum = 0
      vecs.foreach { case (qid, qv) =>
        val base = nearCells(qv, nProbe).toSet
        def bestIn(cells: Set[Int]): (Long, Double) = {
          var bid = Long.MaxValue; var bcos = Double.NegativeInfinity
          cells.foreach { c =>
            byCell.getOrElse(c, Array.empty[(Long, Array[Float])]).foreach { case (cid, cv) =>
              if (cid != qid) {
                val cc = cos(qv, cv)
                if (cc > bcos || (cc == bcos && cid < bid)) { bcos = cc; bid = cid }
              }
            }
          }
          (bid, bcos)
        }
        if (truth.get(qid).contains(bestIn(base)._1)) agree1 += 1
        // top-hopK candidates from the base probe, then add their cells
        val cands = base.toSeq.flatMap(c => byCell.getOrElse(c, Array.empty[(Long, Array[Float])]))
          .filter(_._1 != qid).distinct
          .map { case (cid, cv) => (cid, cos(qv, cv)) }
          .sortBy { case (cid, cc) => (-cc, cid) }.take(hopK)
        val expanded = base ++ cands.flatMap(c => cellOf(c._1))
        probedSum += expanded.size
        if (truth.get(qid).contains(bestIn(expanded)._1)) agree2 += 1
      }
      println(f"[ivf] second-hop: base probe=$nProbe rep=$rep agreement " +
        f"${agree1.toDouble / truth.size}%.3f -> ${agree2.toDouble / truth.size}%.3f " +
        f"at avg probed cells ${probedSum.toDouble / truth.size}%.1f/$nCells")
    }
    spark.stop()
  }
}
