package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: measured scaling evidence for the dedup stack. Inflates
  * the sf0.1 documents table 1×/4×/16× with DISJOINT-vocabulary copies
  * (every token gets a per-copy prefix, so copies share no shingles — the
  * candidate structure per copy matches the original corpus, not a
  * pathological all-duplicates blowup) and times exact dedup, MinHash
  * candidate generation + verify, and connected components at each
  * multiplier. Near-linear wall-clock and pair growth is the evidence
  * that the bucketed plans hold under corpus growth; quadratic growth
  * would indict the candidate generation.
  * Run: sbt "runMain graft.tools.ScaleSmoke /root/testdata/sf0.1 [dedup|ann|all]" */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val section = args.lift(1).getOrElse("all")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val base = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val n = base.count()
    for (mult <- Seq(1, 4, 16) if section == "all" || section == "dedup") {
      val scaled: DataFrame = (0 until mult).map { k =>
        base.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
          col("n_chars"))
      }.reduce(_ unionByName _).cache()
      val rows = scaled.count() // materialize outside the timers
      println(s"[scale] ===== mult=$mult rows=$rows =====")
      time(s"mult=$mult exact dedup")(
        scaled.groupBy(md5(col("text")).as("fp"))
          .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
          .write.format("noop").mode("overwrite").save())
      val pairs = time(s"mult=$mult minhash pairs (cand+verify)") {
        val p = graft.ops.Dedup.minhashPairsOf(scaled).cache()
        val c = p.count()
        println(s"[scale] mult=$mult pair count: $c")
        p
      }
      time(s"mult=$mult connected components")(
        graft.ops.ConnectedComponents.run(pairs.select(col("doc_a"), col("doc_b")))
          .write.format("noop").mode("overwrite").save())
      // r5 operators: the q91 span stream, the q88 CMS build+probe, and the
      // inverted-index build — each must grow linearly with the corpus
      time(s"mult=$mult exactsubstr (q91 span stream)")(
        graft.ops.Dedup.substrDedup(scaled.select(col("doc_id"), col("text")))
          .write.format("noop").mode("overwrite").save())
      time(s"mult=$mult cms heavy hitters (q88 shape)") {
        // disjoint per-copy vocabularies: per-term counts match the base
        // corpus at every multiplier, so the threshold stays fixed
        val toks = scaled.select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
        val cms = toks.stat.countMinSketch("term", 0.0001, 0.99, 7)
        val bc = spark.sparkContext.broadcast(cms)
        val mightBeHeavy = udf { (t: String) =>
          t != null && bc.value.estimateCount(t) >= 900L
        }
        toks.filter(mightBeHeavy(col("term")))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 900L)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"mult=$mult inverted index build") {
        val dir = java.nio.file.Files.createTempDirectory("smoke-invidx").toString
        graft.ops.InvertedIndex.build(spark, scaled.select(col("doc_id"), col("text")), dir)
      }
      pairs.unpersist()
      scaled.unpersist()
    }
    // ANN SERVING at growing corpus / fixed query batch: the claim the
    // r7 cell-partitioned layout has to earn is that search cost follows
    // the PROBED fraction, not the corpus — so the index grows 1x/4x/16x
    // (nCells as sqrt-of-N, the production sizing rule), the batch stays
    // at 4 queries x 12 probes, and we report search wall-clock plus the
    // measured fraction of member rows the pruned scan reads.
    val emb = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    for (mult <- Seq(1, 4, 16) if section == "all" || section == "ann") {
      val scaled: DataFrame = (0 until mult).map { k =>
        emb.select((col("vec_id") + lit(k * 10_000_000L)).as("vec_id"), col("embedding"))
      }.reduce(_ unionByName _).cache()
      val rows = scaled.count()
      val nCells = (32 * math.sqrt(mult)).toInt
      println(s"[scale] ===== ann mult=$mult rows=$rows cells=$nCells =====")
      val dir = java.nio.file.Files.createTempDirectory("smoke-ivf").toString
      time(s"mult=$mult ivf build+save")(
        graft.ops.IvfIndex.save(spark,
          graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
            nReplicas = 2), dir))
      val idx = graft.ops.IvfIndex.load(spark, dir)
      val batch = emb.filter(col("vec_id") < 4)
      time(s"mult=$mult searchTop1 (batch=4, probe=12)")(
        graft.ops.IvfIndex.searchTop1(spark, idx, batch, nProbe = 12)
          .write.format("noop").mode("overwrite").save())
      val probed = graft.ops.IvfIndex.probedCells(spark, idx, batch, nProbe = 12)
      val total = idx.cells.count()
      val read = idx.cells.filter(col("cell").isInCollection(probed)).count()
      println(f"[scale] mult=$mult probed ${probed.length}/$nCells cells, " +
        f"scan fraction ${read.toDouble / total}%.3f")
      // maintenance cost must follow the BATCH, not the index: appending a
      // fixed 100-vector batch should stay flat as the index grows 16x
      time(s"mult=$mult append 100-vector batch")(
        graft.ops.IvfIndex.append(spark, dir,
          emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
            .select((col("vec_id") + 90_000_000L).as("vec_id"), col("embedding"))))
      scaled.unpersist()
    }
    // PROBE-SCHEDULE SWEEP at 16x/64x: as the corpus grows, nCells grows
    // as sqrt(N) and the question is what FRACTION of cells a query must
    // probe to hold top-1 agreement — the recall-vs-scan-fraction
    // frontier that decides the production schedule. Copies are
    // INDEPENDENT uniform vectors (hash-synthesized, same distribution as
    // the base): duplicating OR jittering the base would plant a
    // same-cell near-twin for every query, making any schedule read as
    // perfect recall (measured: the jittered variant scored 1.000
    // everywhere).
    // mult× corpus of INDEPENDENT uniform vectors (copy 0 = the base):
    // hash-synthesized per (copy, id, component), same distribution as the
    // base — shared by the probe sweep and the sq-tier sections
    def independentCopies(mult: Int): DataFrame = {
      import spark.implicits._
      val baseVecs = emb.as[(Long, Array[Float])]
      (0 until mult).map { k =>
        if (k == 0) baseVecs
        else baseVecs.map { case (id, v) =>
          val out = new Array[Float](v.length)
          var i = 0
          while (i < v.length) {
            // splitmix-style hash of (copy, id, component) -> [-0.5, 0.5)
            var h = (id + k.toLong * 10_000_000L) * 0x9E3779B97F4A7C15L +
              i.toLong * 0xBF58476D1CE4E5B9L
            h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
            out(i) = (((h & 0xFFFFFFL).toDouble / (1 << 24)) - 0.5).toFloat
            i += 1
          }
          (id + k * 10_000_000L, out)
        }
      }.reduce(_ union _).toDF("vec_id", "embedding")
    }
    if (section == "all" || section == "probe") {
      import spark.implicits._
      for (mult <- Seq(16, 64)) {
        val scaled = independentCopies(mult).cache()
        val rows = scaled.count()
        val nCells = (32 * math.sqrt(mult)).toInt
        println(s"[scale] ===== probe sweep mult=$mult rows=$rows cells=$nCells =====")
        val dir = java.nio.file.Files.createTempDirectory("smoke-probe").toString
        time(s"mult=$mult ivf build+save (cells=$nCells)")(
          graft.ops.IvfIndex.save(spark,
            graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
              nReplicas = 2), dir))
        val idx = graft.ops.IvfIndex.load(spark, dir)
        val batch = scaled.filter(col("vec_id") < 200).cache()
        // exact truth for the batch, driver-side (200 x N x dim flops)
        val all = scaled.as[(Long, Array[Float])].collect()
        val qs = batch.as[(Long, Array[Float])].collect()
        def cos(a: Array[Float], b: Array[Float]): Double = {
          var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
            nb += b(i).toDouble * b(i); i += 1
          }
          dp / (math.sqrt(na) * math.sqrt(nb))
        }
        val truth = qs.map { case (qid, qv) =>
          var bid = Long.MaxValue; var bcos = Double.NegativeInfinity
          all.foreach { case (cid, cv) =>
            if (cid != qid) {
              val c = cos(qv, cv)
              if (c > bcos || (c == bcos && cid < bid)) { bcos = c; bid = cid }
            }
          }
          qid -> bid
        }.toMap
        // per-query scan share is nProbe/nCells × cell balance; report the
        // balance once so the frac→cost mapping is honest
        val sizes = idx.cells.groupBy(col("cell")).count()
          .select(max(col("count")), avg(col("count"))).head() // float-mean: diagnostic
        println(f"[scale] mult=$mult cell balance max/avg=" +
          f"${sizes.getLong(0).toDouble / sizes.getDouble(1)}%.2f")
        for (frac <- Seq(0.0625, 0.125, 0.25, 0.5)) {
          val nProbe = math.max(8, math.round(frac * nCells).toInt)
          val got = graft.ops.IvfIndex.searchTop1(spark, idx, batch, nProbe = nProbe)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val agree = got.count { case (q, nn) => truth.get(q).contains(nn) }
          // per-QUERY scan fraction: each query reads its own nProbe cells
          // (the 200-query batch union would read nearly all cells — the
          // pruned-read story for small batches lives in the ann section
          // and q99; here the question is recall per scanned fraction)
          println(f"[scale] mult=$mult frac=$frac%.4f probe=$nProbe%3d " +
            f"agreement=${agree.toDouble / truth.size}%.3f " +
            f"perQueryScanFraction=${nProbe.toDouble / nCells}%.3f")
        }
        batch.unpersist()
        scaled.unpersist()
      }
    }
    // SQ8 TIER at 16x: the bandwidth claim, measured — the quantized
    // index's on-disk bytes vs the float index, and the two-stage serve
    // vs the float serve on the same batch/probes (answers must agree:
    // the rerank is exact over a 4x-k shortlist). Independent copies:
    // duplicated copies let the codes dictionary-compress across twins
    // and inflate the byte ratio to 22x — not the honest claim.
    if (section == "all" || section == "sq") {
      import spark.implicits._
      val mult = 16
      val scaled = independentCopies(mult).cache()
      val rows = scaled.count()
      val nCells = (32 * math.sqrt(mult)).toInt
      println(s"[scale] ===== sq tier mult=$mult rows=$rows cells=$nCells =====")
      val raw = java.nio.file.Files.createTempDirectory("smoke-sq-raw").toString
      graft.ops.IvfIndex.save(spark,
        graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
          nReplicas = 2), raw)
      val sq = java.nio.file.Files.createTempDirectory("smoke-sq").toString
      time(s"mult=$mult quantizeTo")(
        graft.ops.IvfSq.quantizeTo(spark, raw, sq))
      def dirBytes(d: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
        walk(new java.io.File(d))
      }
      val rawB = dirBytes(s"$raw/cells"); val sqB = dirBytes(s"$sq/sqcells")
      println(f"[scale] index bytes: float=$rawB sq=$sqB ratio=${rawB.toDouble / sqB}%.2f")
      val batch = emb.filter(col("vec_id") < 10)
      val fl = time(s"mult=$mult float searchTopK (batch=10, probe=16)")(
        graft.ops.IvfIndex.searchTopK(spark,
          graft.ops.IvfIndex.load(spark, raw), batch, k = 3, nProbe = 16)
          .collect().map(_.toSeq).toSet)
      val qz = time(s"mult=$mult sq searchTopK (batch=10, probe=16, shortlist=12)")(
        graft.ops.IvfSq.searchTopK(spark, sq, raw, batch, k = 3, nProbe = 16,
          shortlist = 12).collect().map(_.toSeq).toSet)
      println(s"[scale] sq answers match float tier: ${qz == fl} (${qz.size} rows)")
      // PQ tier on the same index: the train pass is one narrow scan (like
      // quantizeTo plus the bounded codebook fits), codes are 8 bytes per
      // vector, and the two-stage search must stay flat like the SQ tier.
      // Recall is bought with shortlist headroom (IvfPqSpec curve), so the
      // smoke reports top-3 overlap with the float tier, not equality.
      val pq = java.nio.file.Files.createTempDirectory("smoke-pq").toString
      time(s"mult=$mult pq trainTo")(
        graft.ops.IvfPq.trainTo(spark, raw, pq))
      val pqB = dirBytes(s"$pq/pqcells")
      println(f"[scale] index bytes: float=$rawB pq=$pqB ratio=${rawB.toDouble / pqB}%.2f")
      val pz = time(s"mult=$mult pq searchTopK (batch=10, probe=16, shortlist=48)")(
        graft.ops.IvfPq.searchTopK(spark, pq, raw, batch, k = 3, nProbe = 16,
          shortlist = 48).collect().map(_.toSeq).toSet)
      val overlap = pz.map(r => (r(0), r(2))).intersect(fl.map(r => (r(0), r(2))))
      println(s"[scale] pq top-3 overlap with float tier: ${overlap.size}/${fl.size}")
      scaled.unpersist()
    }
    // PQ CODE WIDTH (SubK) at 16x: the production-width claim, measured —
    // the per-subspace codebook fit must stay sample-bounded (flat train
    // wall-clock: the KMeans fits read the SAME bounded sample at every
    // width) and recall against the float tier must improve monotonically
    // as SubK grows 16 → 64 → 256 (finer residual quantization can only
    // sharpen the ADC shortlist). Same corpus/raw index as the sq section.
    if (section == "all" || section == "pqsubk") {
      val mult = 16
      val scaled = independentCopies(mult).cache()
      val rows = scaled.count()
      val nCells = (32 * math.sqrt(mult)).toInt
      println(s"[scale] ===== pq-subk mult=$mult rows=$rows cells=$nCells =====")
      val raw = java.nio.file.Files.createTempDirectory("smoke-subk-raw").toString
      graft.ops.IvfIndex.save(spark,
        graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
          nReplicas = 2), raw)
      val batch = emb.filter(col("vec_id") < 10)
      val fl = graft.ops.IvfIndex.searchTopK(spark,
          graft.ops.IvfIndex.load(spark, raw), batch, k = 3, nProbe = 16)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      var prevOverlap = -1
      for (subK <- Seq(16, 64, 256)) {
        val pq = java.nio.file.Files.createTempDirectory(s"smoke-subk$subK").toString
        time(s"subK=$subK pq trainTo")(
          graft.ops.IvfPq.trainTo(spark, raw, pq, subK = subK))
        val pz = time(s"subK=$subK pq searchTopK (batch=10, probe=16, shortlist=48)")(
          graft.ops.IvfPq.searchTopK(spark, pq, raw, batch, k = 3, nProbe = 16,
            shortlist = 48).collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
        val overlap = pz.intersect(fl).size
        println(s"[scale] pq-subk subK=$subK top-3 overlap with float tier: " +
          s"$overlap/${fl.size}" +
          (if (overlap < prevOverlap) "  ** NON-MONOTONE **" else ""))
        prevOverlap = math.max(prevOverlap, overlap)
      }
      scaled.unpersist()
    }
    // q74 EDGE BOUND AT PRODUCTION THRESHOLD: the certification threshold
    // (0.4, diffuse vectors) deliberately exercises the cell-pair bound's
    // WORST regime — most cell pairs qualify. The number that predicts
    // 100 TB dedup behavior is the pruning factor at a production near-dup
    // threshold (~0.9) on a CLUSTERED corpus — the shape real embedding
    // spaces have (it is why IVF works at all), and the regime the bound's
    // math targets: tight clusters ⇒ small cell radii ⇒ the triangle
    // inequality kills far cell pairs. Fixture: rows/64 clusters (the
    // dedup-index cell sizing rule, so KMeans can give each cluster its
    // own cell), anchors = independent random directions (near-orthogonal
    // in 64-dim), members = anchor + 2% jitter (within-cluster cosines
    // ≈ 0.99 — true near-dup groups at t=0.9). A diffuse-uniform fixture
    // measures nothing here: uniform cells have ~unit radii, the bound
    // provably cannot prune, and the report reads 0 by construction.
    // Report surviving cell pairs / total, edge count, and edge-generation
    // wall-clock at 1x/4x/16x for t=0.4 and t=0.9.
    if (section == "all" || section == "dedup09") {
      import spark.implicits._
      val dim = 64
      for (mult <- Seq(1, 4, 16)) {
        val rowsWanted = 2000L * mult
        val scaled = spark.range(rowsWanted).map { id =>
          val cluster = id / 64
          val out = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            var h = cluster * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
            h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
            val anchor = ((h & 0xFFFFFFL).toDouble / (1 << 24)) - 0.5
            var j = id * 0xD6E8FEB86659FD93L + i.toLong * 0xA24BAED4963EE407L
            j ^= j >>> 33; j *= 0x9E3779B97F4A7C15L; j ^= j >>> 33
            val jitter = (((j & 0xFFFFFFL).toDouble / (1 << 24)) - 0.5) * 0.02
            out(i) = (anchor + jitter).toFloat
            i += 1
          }
          (id, out)
        }.toDF("vec_id", "embedding").cache()
        val rows = scaled.count()
        val nCells = math.min(1024L, math.max(8L, rows / 64L)).toInt
        println(s"[scale] ===== dedup09 mult=$mult rows=$rows cells=$nCells " +
          s"clusters=${rows / 64} =====")
        val dir = java.nio.file.Files.createTempDirectory("smoke-d09").toString
        graft.ops.IvfIndex.save(spark,
          graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
            nReplicas = 1), dir)
        val idx = graft.ops.IvfIndex.load(spark, dir)
        val radii = graft.ops.Similarity.cellRadii(spark, idx)
        val totalPairs = nCells.toLong * (nCells + 1) / 2
        for (t <- Seq(0.4, 0.9)) {
          val cand = graft.ops.Similarity
            .candidateCellPairs(idx.centroids, radii, t).length
          val edges = time(f"mult=$mult t=$t%.1f edge generation")(
            graft.ops.Similarity.ivfCellPairEdges(spark, idx, t).count())
          println(f"[scale] dedup09 mult=$mult t=$t%.1f cellPairs=$cand/$totalPairs " +
            f"(pruned=${1.0 - cand.toDouble / totalPairs}%.3f) edges=$edges")
        }
        scaled.unpersist()
      }
    }
    // LSH SKEW: a boilerplate-heavy corpus — 20% of docs are one template
    // plus a doc-unique token, so they SURVIVE exact dedup but pile one
    // band hash into a single LSH bucket. The claim under test: the
    // r10 hot-bucket guard (Dedup.bucketedCandidates) bounds the
    // candidate join's max-task share at ~cap² pairs while the plain
    // self-join's hot task grows QUADRATICALLY with the template pile
    // (m²/2 pairs in the one task owning the bucket — the classic skew
    // stall). Total verify work is the same either way (the pairs really
    // exist); the guard's job is spreading it.
    if (section == "all" || section == "skew") {
      import spark.implicits._
      val template = (1 to 120).map(i => s"tmplword$i").mkString(" ")
      val cap = graft.ops.Dedup.BucketCap
      // bounded base: the hot bucket's pair content is quadratic BY
      // CONSTRUCTION, so the smoke scales the template pile 1x/4x, not
      // the whole corpus
      val skewBase = base.filter(col("doc_id") < 4000)
      for (mult <- Seq(1, 4)) {
        val scaled: DataFrame = (0 until mult).map { k =>
          skewBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
        }.reduce(_ unionByName _)
        val skewed = scaled.withColumn("text",
            when(pmod(col("doc_id"), lit(5)) === 0,
              concat(lit(template + " uniq"), col("doc_id"))).otherwise(col("text")))
          .withColumn("n_chars", length(col("text"))).cache()
        val rows = skewed.count()
        println(s"[scale] ===== skew mult=$mult rows=$rows (20% template clones) =====")
        val bands = graft.ops.Dedup.bandRowsOf(skewed).cache()
        // analytic max-task share, before vs after: plain join = the
        // hottest bucket whole; guarded = the worst (group x group)
        // sub-task of that bucket under the cap's hash split
        val hot = bands.groupBy(col("band"), col("bhash"))
          .agg(count(lit(1)).as("m")).agg(max(col("m"))).head.getLong(0)
        val ng = math.ceil(hot.toDouble / cap).toInt
        val worstGroup = bands
          .groupBy(col("band"), col("bhash"),
            pmod(xxhash64(col("doc_id")), lit(ng.toLong)).as("grp"))
          .agg(count(lit(1)).as("c")).agg(max(col("c"))).head.getLong(0)
        println(f"[scale] skew mult=$mult hottest bucket m=$hot " +
          f"plainMaxTaskPairs=${hot * (hot - 1) / 2}%d " +
          f"guardedMaxTaskPairs<=${worstGroup * worstGroup}%d (ng=$ng)")
        // measured: the guarded candidate join vs the plain one (cap=inf)
        time(s"mult=$mult guarded candidates (cap=$cap)")(
          println(s"[scale] skew mult=$mult candidates: " +
            graft.ops.Dedup.bucketedCandidates(bands, Nil, cap).count()))
        time(s"mult=$mult plain candidates (cap=MaxValue)")(
          println(s"[scale] skew mult=$mult candidates: " +
            graft.ops.Dedup.bucketedCandidates(bands, Nil, Int.MaxValue).count()))
        // the full engine path (candidates + exact verify) stays correct
        // and keeps its wall-clock under the guard
        time(s"mult=$mult minhash pairs on skewed corpus")(
          println(s"[scale] skew mult=$mult verified pairs: " +
            graft.ops.Dedup.minhashPairsOf(skewed).count()))
        bands.unpersist(); skewed.unpersist()
      }
    }
    // BOILERPLATE SCRUB (q110) at 1x/4x/16x. Copies keep the BASE
    // vocabulary (no per-copy prefix): trigram document frequency and the
    // corpus size then scale together, so the RELATIVE threshold
    // (df·100 ≥ N) selects the same boilerplate set at every multiplier —
    // the operator's scale contract. Everything in the plan is linear
    // (gram pass, partial-agg df, broadcast coverage join, per-doc
    // reassembly); the qualifying-gram broadcast stays CONSTANT-sized by
    // construction (≤ grams-per-doc / df-fraction), which this measures.
    if (section == "all" || section == "boiler") {
      // plant a footer template in 2% of docs: at sf0.1 the natural
      // trigram tail sits UNDER the 1% threshold (the sf0.01 correctness
      // corpus has a fatter relative tail and scrubs organically), and a
      // no-hit run never exercises the coverage join/reassembly stages
      val footer = " smoke footer rights reserved worldwide"
      for (mult <- Seq(1, 4, 16)) {
        val scaled: DataFrame = (0 until mult).map { k =>
          base.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            when(pmod(col("doc_id"), lit(50)) === 0,
              concat(col("text"), lit(footer))).otherwise(col("text")).as("text"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        println(s"[scale] ===== boiler mult=$mult rows=$rows =====")
        time(s"mult=$mult boilerplate scrub (q110)") {
          val out = graft.ops.TextOps.boilerplateScrubOf(scaled).cache()
          val agg = out.agg(count(lit(1)), sum(col("n_dropped")),
            sum(col("n_tokens"))).head()
          println(s"[scale] boiler mult=$mult docs=${agg.getLong(0)} " +
            s"dropped=${agg.getLong(1)}/${agg.getLong(2)} tokens")
          out.unpersist()
        }
        scaled.unpersist()
      }
    }
    // CAPSTONE PIPELINE: TrainingData.run's funnel stage-by-stage at
    // 1x/4x/16x — the composed gates→dedup→decontam→mix→export path must
    // grow near-linearly per stage with no fixed bottleneck (the dedup
    // stack above already has per-operator evidence; this measures the
    // COMPOSITION, using run()'s own per-stage materialization timers).
    if (section == "all" || section == "pipeline") {
      import spark.implicits._
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      // eval set: real corpus texts (copy-0 docs) — decontamination has
      // genuine hits at every multiplier
      val evalDocs = docsBase.filter(col("doc_id") % 997 === 0).select(col("text"))
      val sources = docsBase.select(col("source")).distinct()
        .as[String].collect().toSeq
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          if (k == 0) docsBase
          else docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
            col("source"))
        }.reduce(_ unionByName _)
          .withColumn("n_chars", length(col("text"))).cache()
        val rows = scaled.count()
        println(s"[scale] ===== pipeline mult=$mult rows=$rows =====")
        val out = java.nio.file.Files.createTempDirectory("smoke-pipe").toString
        val summary = time(s"mult=$mult TrainingData.run total")(
          graft.pipelines.TrainingData.run(spark, scaled, evalDocs,
            graft.pipelines.TrainingData.flatWeights(spark, sources),
            out, nShards = 8))
        summary.collect().foreach(r =>
          println(f"[scale] pipeline mult=$mult stage=${r.getString(0)}%-15s " +
            f"docs=${r.getLong(1)}%9d secs=${r.getDouble(2)}%7.2f"))
        scaled.unpersist()
      }
    }
    // CURATION: SemDeDup within-cell pair generation and prototype
    // ranking at 1x/4x/16x over INDEPENDENT uniform copies. nCells grows
    // linearly with the corpus (the dedup-index sizing rule, n/64), so
    // cell size — and with it the per-cell sweep and the per-cell rank
    // window — stays bounded: total within-cell pair count and wall-clock
    // must grow ~linearly, never quadratically.
    if (section == "all" || section == "curation") {
      import spark.implicits._
      val embBase = graft.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      for (mult <- Seq(1, 4, 16)) {
        val dim = embBase.select(size(col("embedding"))).as[Int].head()
        val scaled = (0 until mult).map { k =>
          if (k == 0) embBase
          else {
            val c = lit(k * 10_000_000L)
            embBase.select((col("vec_id") + c).as("vec_id"),
              transform(sequence(lit(0), lit(dim - 1)), i =>
                (conv(substring(md5(concat_ws("_", lit(k), col("vec_id"), i)), 1, 8),
                  16, 10).cast("double") / 4294967295.0 * 2.0 - 1.0).cast("float"))
                .as("embedding"))
          }
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        val nCells = math.min(1024L, math.max(8L, rows / 64L)).toInt
        println(s"[scale] ===== curation mult=$mult rows=$rows cells=$nCells =====")
        val dir = java.nio.file.Files.createTempDirectory("smoke-cur").toString
        time(s"mult=$mult dedup index build+save")(
          graft.ops.IvfIndex.save(spark,
            graft.ops.IvfIndex.build(spark, scaled, nCells = nCells, seed = 7L,
              nReplicas = 1), dir))
        val members = graft.ops.IvfIndex.load(spark, dir).cells
          .select(col("cell").cast("long").as("cell"), col("vec_id"), col("embedding"))
        val edges = time(s"mult=$mult semdedup within-cell pairs")(
          graft.ops.Curation.withinCellEdges(spark, members, 0.3).count())
        println(s"[scale] curation mult=$mult within-cell pairs: $edges")
        time(s"mult=$mult proto-prune rank+cut")(
          graft.ops.Curation.protoPrune(spark, members,
            graft.ops.IvfIndex.load(spark, dir).centroids)
            .write.format("noop").mode("overwrite").save())
        scaled.unpersist()
      }
      // hot-cell guard: the adversarial case the per-cell sweep must
      // survive — ALL vectors landing in one Voronoi cell (clustered
      // data / KMeans imbalance). Compare the unguarded single-task
      // sweep against the triangle-split at the production cap: same
      // edge count, but max-task pair work drops from m²/2 to ~cap².
      val hot = graft.Tables.embeddings(spark, d)
        .select(lit(0L).as("cell"), col("vec_id"), col("embedding"))
        .cache()
      val m = hot.count()
      val cap = 512
      val ng = math.ceil(m.toDouble / cap).toLong
      println(s"[scale] ===== curation hot cell m=$m cap=$cap ng=$ng =====")
      val plainEdges = time(s"hot-cell plain sweep (1 task, ${m * (m - 1) / 2} pairs)")(
        graft.ops.Curation.withinCellEdges(spark, hot, 0.3, cap = Int.MaxValue).count())
      val guardedEdges = time(s"hot-cell guarded sweep (${ng * (ng + 1) / 2} tasks, " +
          s"<=${math.ceil(m.toDouble / ng).toLong * math.ceil(m.toDouble / ng).toLong} pairs/task)")(
        graft.ops.Curation.withinCellEdges(spark, hot, 0.3).count())
      println(s"[scale] curation hot-cell edges plain=$plainEdges guarded=$guardedEdges" +
        s" (must be equal)")
      hot.unpersist()
    }
    // selection operators (q105 DSIR, q107 temperature mix): fit is one
    // corpus aggregation (256-group / per-language), serve is one narrow
    // codegen scan — both must track corpus volume linearly with no
    // fixed bottleneck. Disjoint-vocabulary inflation as in the dedup
    // section; lang is preserved so the fits see the original mixture.
    if (section == "all" || section == "selection") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("lang"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
            col("lang"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        println(s"[scale] ===== selection mult=$mult rows=$rows =====")
        val model = time(s"mult=$mult dsir fit (explode + 256-agg)")(
          graft.ops.Curation.fitDsir(spark, scaled))
        val slots = new Array[Long](graft.ops.Curation.DsirBuckets)
        model.collect().foreach(r =>
          slots(Integer.parseInt(r.getString(0), 16)) = r.getLong(1))
        time(s"mult=$mult dsir serve (fused kernel scan)")(
          scaled.select(col("doc_id"),
            element_at(graft.ops.Curation.dsirWeightPair(slots), 2).as("w"))
            .write.format("noop").mode("overwrite").save())
        val rates = time(s"mult=$mult temp-mix fit (per-lang agg)")(
          graft.ops.Curation.fitTempMix(spark, scaled))
        time(s"mult=$mult temp-mix serve (admit + funnel)")(
          scaled
            .select(col("doc_id"), col("lang"),
              graft.functions.TextFns.tokenCount(col("text")).as("ntoks"))
            .join(broadcast(rates.select(col("lang"), col("thr16"))), Seq("lang"))
            .withColumn("admitted",
              (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
                .cast("long") < col("thr16")).cast("long"))
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs"), sum(col("admitted")).as("docs_kept"))
            .write.format("noop").mode("overwrite").save())
        scaled.unpersist()
      }
    }
    // SERVED HYBRID DENSE ARM (q128): top-20 overlap vs the exact scan at
    // growing probe counts — the operating-point evidence behind
    // DocServeNProbe (recall bought per probed cell, at sf0.1's 78-cell
    // doc index).
    if (section == "all" || section == "hybrid") {
      import org.apache.spark.sql.graft.GraftInternal
      val emb = graft.ml.Embed.embedDocuments(spark, d).cache()
      val qvArr = graft.ops.Scoring.hybridQueryVec
      val qv = array(qvArr.map(lit): _*)
      val cosCol = GraftInternal.column(graft.plans.CosineSim(
        GraftInternal.expression(col("embedding")), GraftInternal.expression(qv)))
      val exact = emb.select(col("doc_id"), cosCol.as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(20)
        .collect().map(_.getLong(0)).toSet
      val idx = graft.ops.IvfIndex.load(spark, graft.ops.Scoring.docIvfDir(spark, d))
      println(s"[scale] ===== hybrid: doc index ${idx.centroids.length} cells =====")
      import spark.implicits._
      for (nProbe <- Seq(1, 2, 3, 5, 8)) {
        val served = time(s"hybrid dense serve nProbe=$nProbe") {
          graft.ops.IvfIndex.searchTopK(spark, idx,
              Seq((-1L, qvArr)).toDF("vec_id", "embedding"), k = 20, nProbe = nProbe)
            .select(col("nn_id")).as[Long].collect().toSet
        }
        println(s"[scale] hybrid nProbe=$nProbe overlap=${served.intersect(exact).size}/20")
      }
      emb.unpersist()
    }
    // BPE TRAINER (ml.BpeTrain): fit cost at 1x/4x/16x with DISJOINT
    // vocabulary copies — the corpus pass grows linearly, but the merge
    // loop must follow the VOCABULARY (x mult here), not the corpus: the
    // structural claim that makes tokenizer training affordable at 100 TB.
    if (section == "all" || section == "bpe") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        println(s"[scale] ===== bpe mult=$mult rows=$rows =====")
        time(s"mult=$mult bpe fit (8 merges)") {
          val m = graft.ml.BpeTrain.fit(scaled, nMerges = 8)
          println(s"[scale] bpe mult=$mult merges=${m.size} " +
            s"head=${m.headOption.map { case (a, b) => a + "+" + b }.getOrElse("-")}")
        }
        scaled.unpersist()
      }
    }
    // UNIFIED MULTIMODAL FUNNEL (q158's pipeline twin): the composed
    // MultimodalData capstone at 1x/4x/16x over the q158 media synthesis
    // (mod 3: real BMP / undecodable / text-only). Stage walls must track
    // input volume — the profile stage decodes each blob once, the
    // closure is representative-edge shaped, nothing quadratic. pplGate
    // ON (the default): the bigram fit is the one corpus-sized stage the
    // text gate adds; its wall should scale ~linearly with rows.
    if (section == "all" || section == "mmfunnel") {
      import spark.implicits._
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val bmp = udf { (text: String) => graft.ops.Multimodal.bmpOf(text) }
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          if (k == 0) docsBase
          else docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
            col("source"))
        }.reduce(_ unionByName _)
          .withColumn("n_chars", length(col("text")))
          .withColumn("media",
            when(col("doc_id") % 3 === 0, bmp(col("text")))
              .when(col("doc_id") % 3 === 1, encode(col("text"), "UTF-8")))
          .cache()
        val rows = scaled.count()
        println(s"[scale] ===== mmfunnel mult=$mult rows=$rows =====")
        val out = java.nio.file.Files.createTempDirectory("smoke-mmf").toString
        val summary = time(s"mult=$mult MultimodalData.run total")(
          graft.pipelines.MultimodalData.run(spark, scaled, s"$out/out",
            textGate = graft.ops.TextOps.RuleGateConfig(
              minWords = 5L, maxWords = Long.MaxValue,
              minMeanWordLen = 0.0, maxMeanWordLen = Double.MaxValue,
              stopwords = Nil, minStopHits = 0L,
              maxSymbolRatio = Double.MaxValue),
            mediaGate = graft.ops.Multimodal.MediaGateConfig(minDim = 4),
            hashBits = 16))
        summary.collect().foreach(r =>
          println(f"[scale] mmfunnel mult=$mult stage=${r.getString(0)}%-15s " +
            f"docs=${r.getLong(1)}%9d secs=${r.getDouble(2)}%7.2f"))
        scaled.unpersist()
      }
    }
    // JOINED PPL-GATE SERVING (r14 verdict #3): the stream-static-join
    // tier must hold per-batch cost ~flat as the MODEL grows — the
    // broadcast tier's failure mode is exactly that the bigram type
    // table grows superlinearly with the corpus (disjoint-vocab copies
    // make that worst-case explicit) and driver-collecting it OOMs.
    // Protocol: grow the fit corpus 1x/4x/16x, materialize the bucketed
    // model with nBuckets scaled in proportion (the documented sizing
    // rule: hold rows-per-bucket constant), then serve the SAME
    // 200-doc batch through continuousPplGateJoined and time the drain.
    if (section == "all" || section == "pplserve") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val probe = docsBase.limit(200).cache()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          if (k == 0) docsBase
          else docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
        }.reduce(_ unionByName _).cache()
        val base = java.nio.file.Files.createTempDirectory("smoke-ppls").toString
        val model = s"$base/model"
        val nBuckets = 8 * mult
        time(s"mult=$mult writePplModel nBuckets=$nBuckets")(
          graft.streaming.Incremental.writePplModel(spark, scaled, model, nBuckets))
        val modelRows = spark.read.parquet(s"$model/bigrams").count()
        val modelRows3 = spark.read.parquet(s"$model/trigrams").count()
        println(s"[scale] pplserve mult=$mult model_bigram_types=$modelRows " +
          s"trigram_types=$modelRows3")
        probe.write.parquet(s"$base/in/b1")
        for (tier <- Seq("add1", "kn", "kn3")) {
          time(s"mult=$mult pplserve tier=$tier drain (200-doc batch)")(
            graft.streaming.Incremental.continuousPplGateJoined(spark,
              s"$base/in/*", schema, model, s"$base/out_$tier", s"$base/ck_$tier",
              smoothing = tier))
        }
        scaled.unpersist()
      }
      probe.unpersist()
    }
    // DIVERSITY MONITOR SERVING (maintainer #20): same protocol as
    // pplserve — grow the FIT corpus (disjoint-vocab copies grow the
    // model's vocabulary superlinearly vs any one batch's), freeze the
    // docvec model with nBuckets scaled, serve the SAME 200-doc batch.
    // Per-batch cost must follow the batch (touched-bucket pruning),
    // not the model.
    if (section == "all" || section == "divmon") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val probe = docsBase.limit(200).cache()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType)))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          if (k == 0) docsBase
          else docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
            col("source"))
        }.reduce(_ unionByName _).cache()
        val base = java.nio.file.Files.createTempDirectory("smoke-divm").toString
        val model = s"$base/model"
        val nBuckets = 8 * mult
        time(s"mult=$mult writeDocvecModel nBuckets=$nBuckets")(
          graft.streaming.Incremental.writeDocvecModel(spark, scaled, model,
            nBuckets))
        val vocabRows = spark.read.parquet(s"$model/vecs").count()
        println(s"[scale] divmon mult=$mult model_vocab_rows=$vocabRows")
        probe.write.parquet(s"$base/in/b1")
        time(s"mult=$mult divmon drain (200-doc batch)")(
          graft.streaming.Incremental.continuousDiversityMonitor(spark,
            s"$base/in/*", schema, model, s"$base/out", s"$base/ck"))
        scaled.unpersist()
      }
      probe.unpersist()
    }
    // VOCAB-GROWTH MONITOR SERVING (maintainer #24): grow the first-seen
    // TERM LOG superlinearly vs any one batch (disjoint-vocab copies
    // ingested first), then time a FIXED 200-doc batch drain — the
    // anti-join must partition-prune to the batch's touched buckets, so
    // per-batch cost follows the batch, not the accumulated log.
    if (section == "all" || section == "vocgrow") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source"))
      val probe = docsBase.limit(200).cache()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType)))
      for (mult <- Seq(1, 4, 16)) {
        val seeded = (0 until mult).map { k =>
          if (k == 0) docsBase
          else docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"),
            col("source"))
        }.reduce(_ unionByName _)
        val base = java.nio.file.Files.createTempDirectory("smoke-vocg").toString
        val nBuckets = 8 * mult
        seeded.write.parquet(s"$base/in/b1")
        graft.streaming.Incremental.continuousVocabGrowth(spark,
          s"$base/in/*", schema, s"$base/out", s"$base/ck", nBuckets)
        val logRows = spark.read.parquet(s"$base/out/terms")
          .filter(col("term").isNotNull).count()
        println(s"[scale] vocgrow mult=$mult term_log_rows=$logRows " +
          s"nbkt=$nBuckets")
        probe.write.parquet(s"$base/in/b2")
        time(s"mult=$mult vocgrow drain (200-doc batch)")(
          graft.streaming.Incremental.continuousVocabGrowth(spark,
            s"$base/in/*", schema, s"$base/out", s"$base/ck", nBuckets))
      }
      probe.unpersist()
    }
    // SIF FOLD UNDER A JUNK-INFLATED RAW VOCABULARY (r15 verdict #1):
    // the doc-vector fold's term-frequency broadcast is bounded by the
    // TRAINED vocabulary (freq is computed from the post-wv-join token
    // stream), so growing the RAW corpus vocabulary with unique junk
    // tokens — the Heaps-law tail a web-scale corpus carries — must
    // leave the fold's broadcast footprint and wall time flat. Protocol:
    // fit wv ONCE on the base corpus (model vocab fixed), append
    // mult unique junk tokens per doc (raw vocab grows ~n_docs·mult),
    // run the full q184 diversity fold and time it.
    if (section == "all" || section == "sifvocab") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"), col("source")).cache()
      val wv = graft.ml.WordVec.fit(docsBase).cache()
      val modelVocab = wv.count()
      for (mult <- Seq(0, 8, 32)) {
        val docs =
          if (mult == 0) docsBase
          else docsBase.withColumn("text", concat_ws(" ", col("text") +:
            (0 until mult).map(i =>
              concat(lit(s"zzjunk${i}x"), col("doc_id").cast("string"))): _*))
        val rawVocab = docs
          .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
          .agg(count_distinct(col("w"))).head().getLong(0)
        println(s"[scale] sifvocab mult=$mult raw_vocab=$rawVocab " +
          s"model_vocab=$modelVocab")
        time(s"mult=$mult sif diversity fold (junk vocab)")(
          graft.ops.Ml.sourceDocvecDiversityOver(docs, wv).collect())
      }
      wv.unpersist(); docsBase.unpersist()
    }
    // q206 KERNEL under corpus growth (r16 verdict #4): `pplserve` proved
    // the SERVING tier flat at 16x MODEL growth; the held-out ladder also
    // FITS two KN models and runs a 6-way sparse serve join. Disjoint
    // per-copy vocabularies (the dedup-section trick) are the WORST case
    // for the fit: every copy mints its own bigram/trigram types, so the
    // model tables grow ~linearly with the corpus instead of Zipf-shared
    // — if wall-clock stays ~linear in the gram tables here, the
    // real-corpus case (sub-linear type growth, Heaps) is strictly
    // easier. Recorded per mult: train gram-TYPE table sizes (the Zipf
    // growth every vocab-capacity assumption leans on) and the whole
    // fit+serve wall-clock of the SHIPPED kernel.
    if (section == "all" || section == "knfit") {
      val docs0 = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docs0.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("source"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        // model-table growth, measured outside the timer (the same folds
        // the kernel runs on its train half)
        val train = scaled.filter(
          !(substring(md5(col("doc_id").cast("string")), 1, 1) < "4"))
        val bgTypes = graft.ops.Scoring.bigramFoldOf(
          train.select(col("doc_id"), col("text")))
          .select(col("a"), col("b")).distinct().count()
        val tgTypes = graft.ops.Scoring.trigramFoldOf(
          train.select(col("doc_id"), col("text")))
          .select(col("a"), col("b"), col("c")).distinct().count()
        println(s"[scale] ===== knfit mult=$mult rows=$rows " +
          s"bigram_types=$bgTypes trigram_types=$tgTypes =====")
        time(s"mult=$mult kn heldout ladder (fit2 + 6-way serve)")(
          graft.ops.Scoring.heldoutLadder3Of(scaled)
            .write.format("noop").mode("overwrite").save())
        scaled.unpersist()
      }
    }
    // MAINTAINER #25 under corpus growth: the exact-NN reference's whole
    // point is that per-drain cost follows the BATCH (probes x batch
    // scores + a state-sized re-rank), never the accumulated corpus —
    // the state is nProbes x 3 rows regardless of what was ingested. So:
    // bulk-ingest a 1x/4x/16x corpus (untimed), then time a FIXED
    // 200-vector drain; the reading must stay flat while the corpus
    // behind the state grows 16x (the vocgrow/append discipline).
    if (section == "all" || section == "exnnref") {
      val emb = graft.Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding"))
      val probes = emb.filter(col("vec_id") < 50).cache()
      probes.count()
      val vecSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType))))
      for (mult <- Seq(1, 4, 16)) {
        val root = java.nio.file.Files.createTempDirectory("smoke-exnn").toString
        val in = s"$root/in"
        new java.io.File(in).mkdirs()
        (0 until mult).map { k =>
          emb.select((col("vec_id") + lit(k * 10_000_000L)).as("vec_id"),
            col("embedding"))
        }.reduce(_ unionByName _).write.parquet(s"$in/b0")
        graft.streaming.Incremental.continuousExactNnRef( // bulk, untimed
          spark, s"$in/*", vecSchema, probes, s"$root/out", s"$root/ck")
        emb.filter(col("vec_id") >= 200 && col("vec_id") < 400)
          .select((col("vec_id") + 90_000_000L).as("vec_id"), col("embedding"))
          .write.parquet(s"$in/b1")
        time(s"mult=$mult exact-nn ref drain (fixed 200-vec batch)")(
          graft.streaming.Incremental.continuousExactNnRef(
            spark, s"$in/*", vecSchema, probes, s"$root/out", s"$root/ck"))
        println(s"[scale] mult=$mult exnnref state_rows=" +
          spark.read.parquet(s"$root/out/top3").count())
      }
      probes.unpersist()
    }
    // MAINTAINER #26 (continuousDistinctMonitor): the claim is that a
    // drain's cost follows the BATCH, never the accumulated corpus — the
    // state is sources×k rows and the batch side cuts to bottom-k BEFORE
    // the merge. Bulk-ingest a 1×/4×/16× corpus (disjoint doc_ids so the
    // distinct count really grows), then time a fixed 200-doc drain.
    if (section == "all" || section == "distmon") {
      val docsB = graft.Tables.documents(spark, d)
        .select(col("source"), col("doc_id"), col("text"))
      val docSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      for (mult <- Seq(1, 4, 16)) {
        val root = java.nio.file.Files.createTempDirectory("smoke-distmon").toString
        val in = s"$root/in"
        new java.io.File(in).mkdirs()
        (0 until mult).map { k =>
          // distinct CONTENT per copy (the fingerprint must differ or the
          // monitor would correctly collapse the copies)
          docsB.select(col("source"),
            concat(lit(s"copy$k "), col("text")).as("text"))
        }.reduce(_ unionByName _).write.parquet(s"$in/b0")
        graft.streaming.Incremental.continuousDistinctMonitor( // bulk, untimed
          spark, s"$in/*", docSchema, s"$root/out", s"$root/ck")
        docsB.filter(col("doc_id") < 200)
          .select(col("source"), concat(lit("delta "), col("text")).as("text"))
          .write.parquet(s"$in/b1")
        time(s"mult=$mult distinct-monitor drain (fixed 200-doc batch)")(
          graft.streaming.Incremental.continuousDistinctMonitor(
            spark, s"$in/*", docSchema, s"$root/out", s"$root/ck"))
        println(s"[scale] mult=$mult distmon state_rows=" +
          spark.read.parquet(s"$root/out/kmv").count())
      }
    }
    // PREFIX-FILTER EXACT JOIN (r18): the q227/q214/q221/q226 ground-truth
    // operator. Disjoint-vocabulary copies keep per-copy candidate
    // structure constant, so LINEAR candidate and wall growth is the
    // evidence the prefix equi-join never degenerates toward all-pairs
    // under corpus growth (the prefix tokens are uniform hashes, so
    // bucket sizes grow linearly with docs; quadratic growth would
    // indict the candidate generation exactly as it would for LSH).
    if (section == "all" || section == "pfj") {
      val docsP = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsP.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
        }.reduce(_ unionByName _)
        val hs = scaled
          .select(col("doc_id"),
            graft.ops.Dedup.shingleHashes(
              graft.functions.TextFns.normText(col("text"))).as("hs"))
          .filter(size(col("hs")) > 0)
          .cache()
        hs.count() // materialize outside the timer
        time(s"mult=$mult prefix-filter exact join (t=0.8)") {
          val pairs = graft.ops.Dedup.exactJaccardPairs(hs, 0.8)
          println(s"[scale] mult=$mult pfj verified pairs: ${pairs.count()}")
        }
        hs.unpersist()
      }
    }
    // BPE AT PRODUCTION ROUND COUNT (r13 verdict #6): the trainer loop is
    // round-count-bound by design (per merge: one vocab-sized pair agg +
    // one 1-row argmax collect + a narrow state rewrite, localCheckpoint
    // every 8 rounds). The 8-merge section above certifies semantics;
    // this one measures the per-round CONSTANT at a production-shaped
    // round count (default 1000; arg 3 overrides) and reports
    // merges/minute — the number a 32k-vocab training run budgets
    // against. Not part of "all": it is a many-minute run by design.
    if (section == "bpe1k") {
      val nMerges = args.lift(2).map(_.toInt).getOrElse(1000)
      // the synthetic corpus has ~31 word TYPES (template text), which
      // exhausts the merge space in ~90 rounds — scale the vocabulary
      // with the word-prefix trick (mult disjoint copies) so the trainer
      // state is production-shaped for the full round count
      val mult = args.lift(3).map(_.toInt).getOrElse(16)
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val scaled = (0 until mult).map { k =>
        docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\w+)", s"c${k}_$$1").as("text"))
      }.reduce(_ unionByName _).cache()
      val nWords = graft.ml.BpeTrain.wordCounts(scaled).count()
      println(s"[scale] ===== bpe1k vocab=$nWords words (mult=$mult), " +
        s"target=$nMerges merges =====")
      val t0 = System.nanoTime()
      val m = graft.ml.BpeTrain.fit(scaled, nMerges = nMerges)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] bpe1k merges=${m.size} wall=$secs%.1f s " +
        f"per_round=${secs / m.size}%.3f s merges_per_min=${m.size / (secs / 60)}%.1f")
      scaled.unpersist()
    }
    // GLOBAL ORDINAL (q126's kernel): corpus total order at 1x/4x/16x —
    // the range-partition + zipWithIndex plan must scale like a
    // distributed sort (near-linear), with partition count scaling as the
    // data grows. The naive alternative (unpartitioned row_number window)
    // is the anti-pattern this kernel exists to avoid.
    if (section == "all" || section == "ordinal") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("n_chars"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("n_chars"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        println(s"[scale] ===== ordinal mult=$mult rows=$rows =====")
        time(s"mult=$mult global ordinal (range + zipWithIndex)") {
          val pos = graft.ops.Ordinal.globalOrdinal(scaled,
            Seq(col("n_chars").desc, col("doc_id")), numPartitions = 32 * mult)
          // materialize + integrity probe: dense 1..N positions sum to
          // N(N+1)/2 — a dropped or duplicated ordinal cannot hide
          val got = pos.agg(sum(col("pos")), count(lit(1))).head()
          val cnt = got.getLong(1)
          require(got.getLong(0) == cnt * (cnt + 1) / 2, "ordinal not dense 1..N")
        }
        scaled.unpersist()
      }
    }
    // q134's claim quantified: the SAME join, same data, same conf — once
    // over plain parquet (join pays two hash exchanges), once over the
    // bucketBy layout (zero exchanges; the shuffle was paid at write).
    // Reported: join wall-clock AND the exchange count from the executed
    // plan, at 1x/4x/16x. Broadcast disabled so the comparison is
    // SMJ-vs-SMJ (at 100 TB neither side broadcasts anyway).
    if (section == "all" || section == "bucketed") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("source"), col("n_chars"), col("text"))
        }.reduce(_ unionByName _)
        val left = scaled.select(col("doc_id"), col("source"), col("n_chars"))
        val right = scaled.select(col("doc_id"),
          graft.functions.TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
        val tmp = java.nio.file.Files.createTempDirectory("graft-smoke-bucketed").toString
        def consume(j: DataFrame): Unit = {
          val r = j.agg(sum(col("n_toks") + col("n_chars")), count(lit(1))).head()
          require(r.getLong(1) == n * mult, s"join lost rows: ${r.getLong(1)}")
        }
        def exchanges(j: DataFrame): Int =
          "Exchange".r.findAllIn(j.queryExecution.executedPlan.toString).size
        // plain layout: the join pays its exchanges every run
        left.write.mode("overwrite").parquet(s"$tmp/l")
        right.write.mode("overwrite").parquet(s"$tmp/r")
        val plain = spark.read.parquet(s"$tmp/l")
          .join(spark.read.parquet(s"$tmp/r"), Seq("doc_id"))
        println(s"[scale] ===== bucketed mult=$mult rows=${n * mult} " +
          s"plainExchanges=${exchanges(plain)} =====")
        time(s"mult=$mult join over plain parquet")(consume(plain))
        // bucketed layout: shuffle paid once at write time
        val (lt, rt) = (s"graft_smoke_bl_$mult", s"graft_smoke_br_$mult")
        left.repartition(32, col("doc_id")).write.format("parquet")
          .bucketBy(32, "doc_id").sortBy("doc_id")
          .option("path", s"$tmp/bl").mode("overwrite").saveAsTable(lt)
        right.repartition(32, col("doc_id")).write.format("parquet")
          .bucketBy(32, "doc_id").sortBy("doc_id")
          .option("path", s"$tmp/br").mode("overwrite").saveAsTable(rt)
        val bucketed = spark.table(lt).join(spark.table(rt), Seq("doc_id"))
        println(s"[scale] mult=$mult bucketedExchanges=${exchanges(bucketed)}")
        time(s"mult=$mult join over bucketed layout")(consume(bucketed))
        spark.sql(s"DROP TABLE $lt"); spark.sql(s"DROP TABLE $rt")
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    // MEDIA NEAR-DUP SERVE (PhashIndex, q140's discipline): the corpus
    // hash index grows 1x/4x/16x while a FIXED 50-image ingest batch
    // probes it. The claims: (a) the corpus is decoded exactly once, at
    // index-build time — the probe never re-decodes history (decode cost
    // follows ingest); (b) probe wall-clock follows candidate volume
    // (band-bucket density — at a saturated 16-bit certification hash
    // space, hits grow ~linearly with the corpus), never corpus decode.
    if (section == "all" || section == "media") {
      val bmp = udf { (t: String) => graft.ops.Multimodal.bmpOf(t) }
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      val batch = docsBase.filter(col("doc_id") < 50)
        .select((col("doc_id") + lit(900_000_000L)).as("doc_id"),
          bmp(col("text")).as("media")).cache()
      val nb = batch.count()
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          // per-copy text prefix: copies hash differently, so the index
          // is mult distinct populations, not mult clones of one
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            bmp(concat(lit(s"c$k "), col("text"))).as("media"))
        }.reduce(_ unionByName _)
        val idx = time(s"media mult=$mult index build (decode+hash, paid once)") {
          val i = graft.ops.PhashIndex.build(scaled).cache()
          println(s"[scale] media mult=$mult index rows=${i.count()}")
          i
        }
        time(s"media mult=$mult fixed-batch probe ($nb images)") {
          val h = graft.ops.PhashIndex.query(idx, batch, hashBits = 16)
          println(s"[scale] media mult=$mult hits=${h.count()}")
        }
        idx.unpersist()
      }
      batch.unpersist()
    }
    // WORDVEC TRAINING SCALING (wordvec): the PPMI+SVD fit at 1x/4x/16x
    // corpus. The claim: only the skip-gram pair pass is corpus-sized;
    // the PPMI matrix and the SVD are VOCAB-bounded, so model cost
    // decouples from corpus growth (per-copy disjoint vocabularies make
    // the vocab grow with mult here — the worst case for the claim; a
    // real corpus re-observes the same words and the matrix stays put).
    if (section == "all" || section == "wordvec") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("text")) // SAME vocab per copy: corpus grows, vocab fixed
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        time(s"wordvec mult=$mult fit (pairs+PPMI+SVD), rows=$rows") {
          val v = graft.ml.WordVec.fit(scaled)
          println(s"[scale] wordvec mult=$mult vocab=${v.count()}")
        }
        scaled.unpersist()
      }
    }
    // KN LM TIER (knlm): the q165 fit+score pass at growing corpus with
    // FIXED vocabulary (same-text copies) — the claim the Zipf²-sparse
    // model design earns: the bigram/continuation/discount tables follow
    // the VOCABULARY, so only the per-doc scoring join grows with the
    // corpus and the wall-clock must read linear-at-worst.
    if (section == "knlm") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("text")) // SAME vocab per copy: corpus grows, model fixed
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        time(s"knlm mult=$mult KN fit+score, rows=$rows") {
          val scored = graft.ops.Scoring.knNllOf(scaled)
          println(s"[scale] knlm mult=$mult scored=${scored.count()}")
        }
        scaled.unpersist()
      }
    }
    // TRIGRAM KN TIER (kn3): the q176 fit+score pass under the knlm
    // protocol (same-text copies, FIXED vocabulary) — the trigram model
    // tables follow the vocabulary too (Zipf³-sparse types), so like the
    // bigram tier only the per-doc scoring join may grow with the corpus.
    if (section == "kn3") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("text"))
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        time(s"kn3 mult=$mult trigram-KN fit+score, rows=$rows") {
          val scored = graft.ops.Scoring.kn3NllOf(scaled)
          println(s"[scale] kn3 mult=$mult scored=${scored.count()}")
        }
        scaled.unpersist()
      }
    }
    // SPAN DECONTAMINATION (decontam): the q175 scrub with a FIXED eval
    // set (the base corpus's doc_id < 50) while the training side grows
    // 16x — the claim the design earns: the span stream is linear in
    // corpus tokens, the eval span vocabulary is eval-sized (fixed), the
    // semi-join broadcasts, so wall-clock must read linear-at-worst.
    if (section == "decontam") {
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            col("text")) // copies land at id >= 50: all training side
        }.reduce(_ unionByName _).cache()
        val rows = scaled.count()
        time(s"decontam mult=$mult span scrub, rows=$rows") {
          val out = graft.ops.Dedup.decontamScrub(scaled)
          println(s"[scale] decontam mult=$mult scrubbed=${out.count()}")
        }
        scaled.unpersist()
      }
    }
    // PRODUCTION-WIDTH MEDIA THROUGHPUT (media64): real 256x256 PNGs
    // through the fused decodeProfile pass and the 64-bit near-dup
    // funnel — the decode-bound regime the 4x4 certification corpus
    // cannot exercise. Reports images/sec through the single-decode
    // profile (the number that prices the 100 TB media pass) and runs
    // the full funnel with the near tier ON at the width where the hash
    // space does NOT saturate.
    // 64-BIT BAND-SCHEME CANDIDATE VOLUME (phash64): the shipped
    // multi-probe scheme ((3 bands, <=2 flips): 718 probe rows/hash,
    // ~2.8e-4 random pair collision) vs the naive radius+1 single-probe
    // alternative ((9 bands, exact): 9 rows/hash, ~7e-2 collision) on
    // RANDOM 64-bit hashes — the adversarial occupancy where banding
    // earns nothing from structure. Self-join candidate counts + wall
    // at growing distinct-hash occupancy N: the naive scheme's
    // candidates grow ~0.07*N^2/2 (quadratic cliff), the shipped one
    // ~2.8e-4*N^2/2 — the ~250x gap that makes radius 8 affordable at
    // production occupancy (r20 review of the r19-verdict radius).
    if (section == "all" || section == "phash64") {
      import graft.ops.Multimodal
      for (n <- Seq(20000, 60000)) {
        val hashes = spark.range(n)
          .select(col("id").as("rep"),
            expr("xxhash64(id, 929L)").as("ahash")).cache()
        hashes.count()
        def cands(probe: DataFrame, index: DataFrame): Long =
          probe.select(col("band"), col("bhash"), col("rep").as("doc_a"))
            .join(index.select(col("band"), col("bhash"), col("rep").as("doc_b")),
              Seq("band", "bhash"))
            .filter(col("doc_a") < col("doc_b"))
            .select(col("doc_a"), col("doc_b")).distinct().count()
        val t0 = System.nanoTime()
        val shipped = cands(Multimodal.withPhashProbes(hashes, 64),
          Multimodal.withPhashBands(hashes, 64))
        val tShipped = (System.nanoTime() - t0) / 1e9
        // the naive radius+1 layout, reconstructed inline for comparison
        val naive9 = hashes.select(col("rep"), posexplode(array(
            (0 until 9).map { b =>
              val lo = b * 64 / 9
              val w = (b + 1) * 64 / 9 - lo
              shiftrightunsigned(col("ahash"), lo).bitwiseAND(lit((1L << w) - 1))
            }: _*)).as(Seq("band", "bhash")))
        val t1 = System.nanoTime()
        val naive = cands(naive9, naive9)
        val tNaive = (System.nanoTime() - t1) / 1e9
        println(f"[scale] phash64 N=$n%6d: shipped (3b,f2) $shipped%10d cands $tShipped%6.2f s | " +
          f"naive (9b,f0) $naive%10d cands $tNaive%6.2f s | ratio ${naive.toDouble / math.max(1, shipped)}%8.1f x")
        hashes.unpersist()
      }
    }
    if (section == "all" || section == "media64") {
      import spark.implicits._
      val pngFor = udf { (seed: Long) =>
        val img = new java.awt.image.BufferedImage(256, 256,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 256) {
          var x = 0
          while (x < 256) {
            // per-seed block pattern + pixel texture: distinct hashes,
            // real (non-trivial) PNG entropy
            val g = (y / 32) * 8 + (x / 32)
            val on = ((seed * 0x9E3779B97F4A7C15L) >>> (g % 60)) & 1L
            val base = if (on == 1L) 200 else 40
            val tex = ((x * 31 + y * 17 + seed) % 32).toInt
            val v = (base + tex) & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val n64 = 2000
      val media = spark.range(n64)
        .select(col("id").as("doc_id"), pngFor(col("id") % (n64 / 2)).as("media"))
        .cache()
      media.count() // materialize the PNGs outside the timed region
      val t0 = System.nanoTime()
      val prof = graft.ops.Multimodal.decodeProfile(media).cache()
      val nProf = prof.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] media64 decodeProfile: $nProf images in $secs%.2f s = ${nProf / secs}%.0f img/s (32 threads)")
      val out = java.nio.file.Files.createTempDirectory("graft-smoke-media64").toString + "/out"
      val t1 = System.nanoTime()
      val summary = graft.pipelines.MediaData.run(spark, media, out, nShards = 8,
          nearDup = true, hashBits = 64)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      println(f"[scale] media64 funnel (near tier ON, 64-bit): $summary " +
        f"total ${(System.nanoTime() - t1) / 1e9}%.2f s")
      require(summary("deduped") == n64 / 2,
        s"64-bit space must NOT percolate: expected ${n64 / 2} distinct, got ${summary("deduped")}")
      prof.unpersist(); media.unpersist()
    }
    // MEDIA CAPSTONE FUNNEL (pipelines.MediaData): the whole
    // decode→quarantine→gate→dedup→export composition at 1x/4x/16x.
    // The claim: per-stage secs track the input volume (the decode
    // happens ONCE in the profile stage; everything after is
    // metadata-only until the export rewrites keepers).
    if (section == "all" || section == "mediapipe") {
      val bmp = udf { (t: String) => graft.ops.Multimodal.bmpOf(t) }
      val docsBase = graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text"))
      for (mult <- Seq(1, 4, 16)) {
        val scaled = (0 until mult).map { k =>
          docsBase.select((col("doc_id") + lit(k * 10_000_000L)).as("doc_id"),
            bmp(concat(lit(s"c$k "), col("text"))).as("media"))
        }.reduce(_ unionByName _)
        val out = java.nio.file.Files
          .createTempDirectory(s"graft-smoke-mediapipe$mult").toString + "/out"
        val t0 = System.nanoTime()
        val summary = graft.pipelines.MediaData
          .run(spark, scaled, out, nShards = 8,
            // 4x4 corpus: admit tiny images. EXACT tier only — the
            // 16-bit certification hash space saturates, so the
            // hamming<=3 closure percolates to ONE component (measured:
            // deduped=1 at every mult); the near tier is smoke-tested
            // where it belongs, on the 64-bit production width
            gate = graft.ops.Multimodal.MediaGateConfig(minDim = 1L, minBytes = 1L),
            nearDup = false, hashBits = 16)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        println(s"[scale] ===== mediapipe mult=$mult total=" +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s =====")
        summary.foreach { case (st, n, sec) =>
          println(f"[scale] mediapipe mult=$mult $st%-12s $n%8d ${sec}%7.2f s")
        }
      }
    }
    spark.stop()
  }
}
