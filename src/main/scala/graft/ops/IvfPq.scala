package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantized serving tier for the IVF index (M8's memory-bandwidth
  * end-game): where SQ8 ([[IvfSq]]) spends one byte per DIMENSION, PQ
  * spends one byte per SUBSPACE — the 64-dim embedding splits into
  * [[NumSub]] contiguous 8-dim subvectors, each encoded as the id of its
  * nearest subspace centroid from a [[SubK]]-entry codebook fit on the
  * index itself (Jégou et al. 2011, the standard ANN compression). At 8
  * subspaces the code is 8 bytes against 256 float bytes — 32× less scan
  * bandwidth than the raw index, 8× less than SQ8 — and the coarse scan
  * never touches a float vector: approximate cosine is assembled from a
  * per-query lookup table of subspace dot products (ADC — asymmetric
  * distance computation), O(NumSub) adds per member.
  *
  * Serving is the same certified two-stage shape as q100: ADC coarse scan
  * over the probed cells → bounded per-query shortlist → EXACT rerank of
  * the shortlist from the raw index ([[IvfSq.exactRerank]] — shared, so
  * the rerank contract is one piece of code across tiers). Recall is
  * governed by the shortlist factor exactly as in the SQ tier; the ADC
  * score only ORDERS the shortlist cut.
  *
  * Determinism contract with the oracle: codebooks are exported; code
  * assignment is argmin squared-L2 with the lowest-code tie-break; ADC
  * accumulates subspace dot products and centroid norms in SUBSPACE ORDER
  * (m ascending, double math), and the oracle reproduces that exact
  * summation order via ordered-list aggregation — so the approximate
  * scores, the shortlist cut, and the exact rerank all hash-match.
  *
  * Maintenance: like the SQ tier, the PQ copy is a DERIVED artifact of a
  * raw-index snapshot — re-derive on the compaction cadence. The codebook
  * fit is sample-bounded ([[IvfIndex.build]]'s discipline) and the
  * encoding pass is one narrow scan of the index.
  */
object IvfPq {

  /** Subspaces (bytes per code). 64-dim embeddings → 8-dim subvectors. */
  private[graft] val NumSub = 8

  /** Centroids per subspace codebook (the fit may return fewer when a
    * cluster lands empty — every consumer sizes off the exported table,
    * never this constant). 16 keeps the fit honest on the test corpora
    * (hundreds of vectors); production would raise it to 256 (one full
    * byte) with the same code path. */
  private[graft] val SubK = 16

  /** Derive the PQ tier from a saved [[IvfIndex]]: copies
    * `centroids`/`meta` (routing transfers unchanged), fits [[NumSub]]
    * per-subspace codebooks on a bounded sample of the index's own
    * vectors, and writes `codebooks/` (sub, code, centroid) plus
    * `pqcells/` (vec_id, codes BINARY) partitioned by cell. */
  def trainTo(spark: SparkSession, indexDir: String, destDir: String,
      seed: Long = 7L, maxFitRows: Long = 50000L): Unit = {
    import spark.implicits._
    val src = IvfIndex.resolve(spark, indexDir)
    spark.read.parquet(s"$src/centroids").coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/centroids")
    IvfIndex.copyMetaIfPresent(spark, src, destDir)
    // reconcile at-least-once replay residue exactly like quantizeTo
    val vecs = spark.read.parquet(s"$src/cells")
      .select(col("cell").cast("long").as("cell"), col("vec_id"), col("embedding"))
      .dropDuplicates("cell", "vec_id")
      .cache()
    val n = vecs.count()
    val sampled =
      if (n > maxFitRows) vecs.sample(withReplacement = false, maxFitRows.toDouble / n, seed)
      else vecs
    val fitRows = sampled.select(col("embedding")).cache()
    val dim = fitRows.head().getSeq[Float](0).length
    require(dim % NumSub == 0, s"dim $dim not divisible by $NumSub subspaces")
    val subDim = dim / NumSub
    // NumSub independent seeded fits over the same cached sample — each a
    // SubK-means on one contiguous subvector slice (5 random-init
    // iterations: codebooks partition the subspace, like the IVF coarse
    // codebook they don't need a converged objective)
    val codebooks: Array[Array[Array[Double]]] = (0 until NumSub).map { m =>
      val sliceUdf = udf { (v: Array[Float]) =>
        val a = new Array[Double](subDim)
        var i = 0
        while (i < subDim) { a(i) = v(m * subDim + i); i += 1 }
        a
      }
      val feats = fitRows.select(
        org.apache.spark.ml.functions.array_to_vector(sliceUdf(col("embedding")))
          .as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(SubK).setSeed(seed + m).setMaxIter(5).setInitMode("random")
        .fit(feats).clusterCenters.map(_.toArray)
    }.toArray
    fitRows.unpersist()
    codebooks.zipWithIndex.flatMap { case (cb, m) =>
      cb.zipWithIndex.map { case (c, code) => (m, code, c.toSeq) }
    }.toSeq.toDF("sub", "code", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$destDir/codebooks")
    val bc = spark.sparkContext.broadcast(codebooks)
    vecs.as[(Long, Long, Array[Float])]
      .map { case (cell, id, v) => (cell, id, encode(bc.value, subDim, v)) }
      .toDF("cell", "vec_id", "codes")
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$destDir/pqcells")
    vecs.unpersist()
  }

  /** Nearest-centroid code per subspace: argmin squared L2, strict `<` so
    * ties resolve to the LOWEST code — the oracle's (distance, code)
    * ordering reproduces it. */
  private[graft] def encode(codebooks: Array[Array[Array[Double]]],
      subDim: Int, v: Array[Float]): Array[Byte] = {
    val codes = new Array[Byte](codebooks.length)
    var m = 0
    while (m < codebooks.length) {
      val cb = codebooks(m)
      var bestC = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cen = cb(c)
        var d = 0.0; var i = 0
        while (i < subDim) {
          val diff = v(m * subDim + i).toDouble - cen(i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; bestC = c }
        c += 1
      }
      codes(m) = bestC.toByte
      m += 1
    }
    codes
  }

  /** Two-stage top-k: ADC coarse scan → exact rerank ([[IvfSq.exactRerank]]).
    * `pqDir` is a [[trainTo]] output; `rawDir` the float [[IvfIndex]] it
    * derives from. Output (vec_id, rn, nn_id, cos) ranked by EXACT cosine,
    * like the SQ tier. */
  def searchTopK(spark: SparkSession, pqDir: String, rawDir: String,
      queries: DataFrame, k: Int = 3, nProbe: Int = 8,
      shortlist: Int = 12, maxCandidates: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val pqD = IvfIndex.resolve(spark, pqDir)
    val rawD = IvfIndex.resolve(spark, rawDir)
    val centroids = spark.read.parquet(s"$pqD/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toArray)
    val cbRows = spark.read.parquet(s"$pqD/codebooks")
      .orderBy("sub", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val codebooks = cbRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    // per-codebook centroid squared norms, index order (the ADC m2 term)
    val cbNorm2 = codebooks.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val bcN2 = spark.sparkContext.broadcast(cbNorm2)
    val (probes, probedCells) =
      IvfIndex.routeProbes(spark, centroids, queries, nProbe)
    if (probedCells.isEmpty)
      return Seq.empty[(Long, Int, Long, Double)].toDF("vec_id", "rn", "nn_id", "cos")

    // ---- stage 1: ADC coarse scan (partition-pruned, fused per cell)
    // unified row: (cell, id, codes|null, rawVec|null)
    val pqMembers = spark.read.parquet(s"$pqD/pqcells")
      .filter(col("cell").isInCollection(probedCells))
      .select(col("cell").cast("long").as("cell"), col("vec_id"), col("codes"))
      .as[(Long, Long, Array[Byte])]
      .map { case (cell, id, codes) => (cell, id, codes, null: Array[Float]) }
    val probeRows = probes.map { case (cell, id, v) =>
      (cell, id, null: Array[Byte], v) }
    val coarse = pqMembers.union(probeRows)
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val cbs = bcCb.value
        val n2 = bcN2.value
        val numSub = cbs.length
        val subDim = cbs(0)(0).length
        val mem = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Byte])]
        val qry = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
        it.foreach { case (_, id, codes, raw) =>
          if (raw != null) {
            var s2 = 0.0; var i = 0
            while (i < raw.length) { s2 += raw(i).toDouble * raw(i); i += 1 }
            qry += ((id, raw, math.sqrt(s2)))
          } else mem += ((id, codes))
        }
        qry.iterator.flatMap { case (qid, qv, qn) =>
          // the per-query ADC lookup table: lut(m)(c) = dot(q_m, cb(m)(c))
          // — NumSub·SubK small dot products amortized over the cell scan.
          // Sized per subspace: a KMeans fit may drop an empty cluster, so
          // codebook lengths are not guaranteed uniform.
          val lut = cbs.map(cb => new Array[Double](cb.length))
          var m = 0
          while (m < numSub) {
            var c = 0
            while (c < cbs(m).length) {
              val cen = cbs(m)(c)
              var d = 0.0; var i = 0
              while (i < subDim) { d += qv(m * subDim + i).toDouble * cen(i); i += 1 }
              lut(m)(c) = d
              c += 1
            }
            m += 1
          }
          val best = new IvfIndex.KBest(shortlist)
          var j = 0
          while (j < mem.length) {
            val (cid, codes) = mem(j)
            if (cid != qid) {
              // SUBSPACE-ORDER accumulation — the oracle's ordered-list
              // sum reproduces this exact double sequence
              var dot = 0.0; var m2 = 0.0; var s = 0
              while (s < numSub) {
                val code = codes(s) & 0xff
                dot += lut(s)(code); m2 += n2(s)(code); s += 1
              }
              best.offer(cid, dot / (qn * math.sqrt(m2)))
            }
            j += 1
          }
          best.result.map { case (cid, sc) => (qid, cid, sc) }
        }
      }
    // merge per query in ONE exchange (replica collapse by max, top-s)
    val short = coarse
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val best = scala.collection.mutable.HashMap.empty[Long, Double]
        it.foreach { case (_, cid, sc) =>
          if (!best.get(cid).exists(_ >= sc)) best(cid) = sc
        }
        best.toSeq.sortBy { case (cid, sc) => (-sc, cid) }.take(shortlist)
          .iterator.map { case (cid, _) => (qid, cid) }
      }
      .localCheckpoint(true)

    // ---- stage 2: shared exact rerank
    IvfSq.exactRerank(spark, rawD, probedCells, short, probes, k, maxCandidates)
  }
}
