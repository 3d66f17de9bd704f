package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K6's visualization half: the DATA TABLES behind the reference's five
  * plotly HTML reports (bertopicTest.py:125-189), exported as plain
  * parquet so any BI/plot layer can render them. The reference writes
  * rendered HTML; the engine's contract is the distributed computation of
  * what those plots SHOW — the rendering is a driver-side concern no
  * cluster engine should own:
  *
  *   - `topic_map/`  (topic, x, y, n_docs)  — visualize_topics: topic
  *     centroids projected to 2D (PCA basis fit on the centroids);
  *   - `doc_map/`    (doc_id, x, y, topic)  — visualize_documents: every
  *     document's embedding in the SAME 2D basis (distributed projection);
  *   - `hierarchy/`  (step, left, right, dist, size) — visualize_hierarchy:
  *     single-linkage agglomerative merges over centroid cosine distance
  *     (leaves 0..k-1, internal node ids k+step, k-1 merges);
  *   - `heatmap/`    (topic_a, topic_b, cos) — visualize_heatmap: k×k
  *     centroid cosine similarity;
  *   - `barchart/`   (topic, rn, term, score) — visualize_barchart: the
  *     q51 top-terms table.
  *
  * Scale: everything except `doc_map` is k-sized (k topics — driver math
  * on a k×dim matrix is the right tool, exactly like the IVF codebook);
  * `doc_map` is one distributed map over the embedding table with a
  * broadcast 2×dim basis — no shuffle at any corpus size. */
object TopicViz {

  /** Top-2 PCA basis of the (mean-centered) points — deterministic power
    * iteration with fixed start and sign convention; points are k×dim with
    * tiny k, so this is driver math by design. */
  private[graft] def pca2(points: Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val n = points.length
    val dim = points.head.length
    val mean = new Array[Double](dim)
    points.foreach { p => var i = 0; while (i < dim) { mean(i) += p(i) / n; i += 1 } }
    val x = points.map { p => Array.tabulate(dim)(i => p(i) - mean(i)) }
    // covariance (unnormalized): C = Xᵀ X
    val c = Array.ofDim[Double](dim, dim)
    x.foreach { r =>
      var i = 0
      while (i < dim) {
        val ri = r(i)
        if (ri != 0.0) { var j = 0; while (j < dim) { c(i)(j) += ri * r(j); j += 1 } }
        i += 1
      }
    }
    def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
      m.map { row => var s = 0.0; var i = 0; while (i < dim) { s += row(i) * v(i); i += 1 }; s }
    def normalize(v: Array[Double]): Array[Double] = {
      val n2 = math.sqrt(v.map(a => a * a).sum)
      if (n2 == 0.0) v else v.map(_ / n2)
    }
    def powerIter(m: Array[Array[Double]]): Array[Double] = {
      // fixed deterministic start; 64-dim, 100 rounds — overkill precision
      var v = normalize(Array.tabulate(dim)(i => 1.0 + i * 1e-3))
      var it = 0
      while (it < 100) { v = normalize(matVec(m, v)); it += 1 }
      // sign convention: largest-|component| positive
      val mx = v.indices.maxBy(i => math.abs(v(i)))
      if (v(mx) < 0) v.map(-_) else v
    }
    val v1 = powerIter(c)
    val lambda1 = {
      val cv = matVec(c, v1)
      v1.indices.map(i => v1(i) * cv(i)).sum
    }
    // deflate and repeat for the second component
    val c2 = Array.tabulate(dim, dim)((i, j) => c(i)(j) - lambda1 * v1(i) * v1(j))
    val v2 = powerIter(c2)
    (v1, v2)
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dp / d
  }

  /** k×k centroid cosine-similarity table (visualize_heatmap's data). */
  def heatmap(spark: SparkSession, model: Topics.TopicModel): DataFrame = {
    import spark.implicits._
    val cs = model.centroids
    (for (a <- cs.indices; b <- cs.indices)
      yield (a, b, math.rint(cosine(cs(a), cs(b)) * 1e6) / 1e6))
      .toDF("topic_a", "topic_b", "cos")
  }

  /** Single-linkage agglomerative merges over centroid cosine DISTANCE
    * (1 − cos): k−1 rows, leaves 0..k−1, internal ids k+step. */
  private[graft] def hierarchyMerges(
      cs: Array[Array[Double]]): Seq[(Int, Int, Int, Double, Int)] = {
    val k = cs.length
    // active cluster id -> member leaf set
    var next = k
    val members = scala.collection.mutable.Map(
      (0 until k).map(i => i -> Set(i)): _*)
    val dist = Array.tabulate(k, k)((i, j) => 1.0 - cosine(cs(i), cs(j)))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Double, Int)]
    var step = 0
    while (members.size > 1) {
      // nearest active pair by single linkage (min leaf-to-leaf distance);
      // deterministic tie-break on (id_a, id_b)
      val ids = members.keys.toSeq.sorted
      var best = (Double.MaxValue, -1, -1)
      for (ai <- ids.indices; bi <- (ai + 1) until ids.length) {
        val (a, b) = (ids(ai), ids(bi))
        val d = (for (x <- members(a); y <- members(b)) yield dist(x)(y)).min
        if (d < best._1) best = (d, a, b)
      }
      val (d, a, b) = best
      members(next) = members(a) ++ members(b)
      members.remove(a); members.remove(b)
      out += ((step, a, b, math.rint(d * 1e6) / 1e6, members(next).size))
      next += 1; step += 1
    }
    out.toSeq
  }

  /** Write the five visualization data tables under `outDir`. */
  def save(spark: SparkSession, dir: String, outDir: String, k: Int = 10): Unit = {
    import spark.implicits._
    val model = Topics.fit(spark, dir, k)
    val cs = model.centroids
    val (v1, v2) = pca2(cs)

    // topic_map: centroids in the PCA basis + doc counts from topicInfo
    val proj = cs.zipWithIndex.map { case (c, t) =>
      (t,
        math.rint(c.indices.map(i => c(i) * v1(i)).sum * 1e6) / 1e6,
        math.rint(c.indices.map(i => c(i) * v2(i)).sum * 1e6) / 1e6)
    }.toSeq.toDF("topic", "x", "y")
    proj.join(model.topicInfo.select(col("topic"), col("n").as("n_docs")), Seq("topic"))
      .orderBy(col("topic"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/topic_map")

    // doc_map: every doc embedding through the SAME basis — a broadcast
    // 2×dim projection, embarrassingly parallel at any corpus size
    val b1 = spark.sparkContext.broadcast(v1)
    val b2 = spark.sparkContext.broadcast(v2)
    val projKernel = udf { (v: Array[Float]) =>
      val p1 = b1.value; val p2 = b2.value
      var x = 0.0; var y = 0.0; var i = 0
      while (i < v.length) { x += v(i) * p1(i); y += v(i) * p2(i); i += 1 }
      (math.rint(x * 1e6) / 1e6, math.rint(y * 1e6) / 1e6)
    }
    Embed.embedDocuments(spark, dir)
      .select(col("doc_id"), projKernel(col("embedding")).as("p"))
      .join(model.assignments.select(col("doc_id"), col("topic")), Seq("doc_id"))
      .select(col("doc_id"), col("p._1").as("x"), col("p._2").as("y"), col("topic"))
      .write.mode("overwrite").parquet(s"$outDir/doc_map")

    hierarchyMerges(cs).toDF("step", "left", "right", "dist", "size")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/hierarchy")
    heatmap(spark, model)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/heatmap")
    model.topTerms
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/barchart")
  }
}
