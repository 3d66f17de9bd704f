package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextFns, Vectors}

/** Recall/precision checks for the approximate dedup & ANN operators against
  * exhaustive truth computed in-test at sf0.001 (500 docs / 500 vectors —
  * small enough for O(n²) truth, same generator as the driver's sf0.01). */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  /** Exhaustive trigram-Jaccard pairs at the given threshold. */
  private def bruteJaccardPairs(threshold: Double): Set[(Long, Long)] = {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.sh"), col("y.sh"))).cast("double") /
          size(array_union(col("x.sh"), col("y.sh")))).as("j"))
      .filter(col("j") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix-filter join equals the exhaustive pair set at several thresholds (recall 1 by theorem)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        ops.Dedup.shingleHashes(TextFns.normText(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
      .cache()
    for (t <- Seq(0.5, 0.8, 0.95)) {
      val truth = bruteJaccardPairs(t)
      val got = ops.Dedup.exactJaccardPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(truth.nonEmpty, s"t=$t: corpus should contain planted pairs")
      assert(got == truth, s"t=$t: prefix-filter join must equal brute force")
    }
    // and the plan is an equi-join, never pair enumeration
    val p = ops.Dedup.exactJaccardPairs(docs, 0.8)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must candidate via equi-join:\n$p")
    docs.unpersist()
  }

  test("minhash LSH dedup finds exactly the >=0.8-Jaccard pairs (recall 1 at test scale)") {
    val truth = bruteJaccardPairs(0.8)
    val got = ops.Dedup.q38MinhashDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain planted near-duplicates")
    assert(got == truth)
  }

  test("simhash dedup recalls most >=0.95-Jaccard pairs with zero low-sim false positives") {
    val nearIdentical = bruteJaccardPairs(0.95)
    val loose = bruteJaccardPairs(0.5)
    val got = ops.Dedup.q40SimhashDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(nearIdentical).size.toDouble / math.max(nearIdentical.size, 1)
    assert(recall >= 0.7, s"simhash recall $recall on near-identical pairs")
    // every reported pair must be a genuine near-dup at a loose threshold
    val falsePos = got -- loose
    assert(falsePos.size <= math.max(1, got.size / 4), s"simhash false positives: $falsePos")
  }

  test("ngram jaccard blocked dedup is a subset of global truth at its threshold") {
    val truth = bruteJaccardPairs(0.5)
    val got = ops.Dedup.q39NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth))
    assert(got.nonEmpty)
  }

  test("probeSchedule's floor binds at the certified index size") {
    // the q45/q96 oracle SQL interpolates AnnNProbe literally; the engine
    // calls probeSchedule(nCells) — at the certified 32-cell index the two
    // MUST coincide or the cross-engine compare silently desyncs
    assert(graft.ops.Similarity.probeSchedule(32) == graft.ops.Similarity.AnnNProbe)
    // and the fraction takes over past the floor (the production schedule)
    assert(graft.ops.Similarity.probeSchedule(128) == 32)
    assert(graft.ops.Similarity.probeSchedule(256) == 64)
  }

  test("IVF ANN top-1 agrees with exact top-1 for a healthy fraction of vectors") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    // exact 3-nearest for EVERY query (the brute q44 ranking, unrestricted):
    // rn 1 feeds the top-1 agreement, the full set feeds recall@3
    val exactRows = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a")).orderBy(col("cos").desc, col("b"))
      e.as("x").join(e.as("y"), col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          Vectors.cosine(col("x.embedding"), col("y.embedding")).as("cos"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    }
    val exact = exactRows.collect { case (a, b, 1) => a -> b }.toMap
    val exact3 = exactRows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = ops.Similarity.q45AnnIvf(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.size == exact.size, "IVF should return one neighbor per vector")
    val hits = ivf.count { case (v, nn) => exact.get(v).contains(nn) }
    val recall = hits.toDouble / exact.size
    info(s"IVF top-1 agreement with exact: $recall")
    // KMeans codebook (32 cells, 16 probes, 2-way member replication) on
    // 500 UNIFORM vectors — the adversarial case for IVF (no cluster
    // structure to exploit). Any regression below this floor means the
    // quantizer, replication, or probe schedule broke (probe 16 + rep 2
    // measured 0.982 at sf0.1, tools.ExperimentIvf).
    assert(recall >= 0.85, s"IVF top-1 recall $recall")

    // ranked-list form (q96): rn is 1..3 per query, ordered by cosine,
    // and the exact top-1 neighbor appears in the ANN top-3 at least as
    // often as it is ranked first
    val topk = ops.Similarity.q96AnnTopk(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(topk.size == exact.size)
    topk.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      val cs = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    val contained = topk.count { case (q, rows) =>
      rows.exists(r => exact.get(q).contains(r.getLong(2)))
    }
    val r3 = contained.toDouble / exact.size
    info(s"exact top-1 contained in ANN top-3: $r3")
    assert(r3 >= recall && r3 >= 0.85, s"top-3 containment $r3")

    // recall@3: fraction of the true 3-nearest neighbors present in the
    // ANN top-3 list, averaged over queries — the standard ranked-ANN
    // metric (containment above only tracks the single best neighbor).
    // Measured 0.95+ at sf0.001 with probe 16 / rep 2 on uniform vectors.
    val recallAt3 = topk.map { case (q, rows) =>
      val ann = rows.map(_.getLong(2)).toSet
      val truth = exact3.getOrElse(q, Set.empty)
      ann.intersect(truth).size.toDouble / math.max(truth.size, 1)
    }.sum / topk.size
    info(s"ANN recall@3 vs exact top-3: $recallAt3")
    assert(recallAt3 >= 0.8, s"recall@3 $recallAt3")
  }

  test("exact cosine pairs match brute force computed independently") {
    val e = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val truth = e.as("x").join(e.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        Vectors.cosine(col("x.embedding"), col("y.embedding")).as("cos"))
      .filter(col("cos") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ops.Similarity.q43CosinePairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == truth)
    assert(got.nonEmpty)
  }

  test("substr dedup removes exactly the tokens covered by repeated 8-token spans") {
    import spark.implicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ") // the planted dup span
    val docs = Seq(
      // A and B share `shared` at different offsets; their other tokens are unique
      (0L, s"a1 a2 $shared a3 a4"),
      (1L, s"$shared b1 b2 b3 b4 b5"),
      // C is globally unique -> untouched
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
      // D and E are exact 10-token clones -> every position is covered by
      // some repeated span -> null fingerprint
      (3L, (1 to 10).map(i => s"d$i").mkString(" ")),
      (4L, (1 to 10).map(i => s"d$i").mkString(" ")),
      // F is shorter than one span -> no spans, untouched
      (5L, "f1 f2 f3"),
    ).toDF("doc_id", "text")
    val got = ops.Dedup.substrDedup(docs)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), Option(r.getString(3)))))
      .toMap
    assert(got(0L) == ((12L, 8L, Some(md5Hex("a1 a2 a3 a4")))))
    assert(got(1L) == ((13L, 8L, Some(md5Hex("b1 b2 b3 b4 b5")))))
    assert(got(2L) == ((10L, 0L, Some(md5Hex("c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")))))
    assert(got(3L) == ((10L, 10L, None)))
    assert(got(4L) == ((10L, 10L, None)))
    assert(got(5L) == ((3L, 0L, Some(md5Hex("f1 f2 f3")))))
  }

  test("decontam scrub cuts exactly the spans shared with the eval set") {
    import spark.implicits._
    val quoted = (1 to 8).map(i => s"e$i").mkString(" ") // the benchmark sentence
    val docs = Seq(
      // eval side (doc_id < 3 with evalMax = 3): defines the span vocab,
      // emits no output row
      (0L, s"$quoted x1 x2"),
      (1L, "y1 y2 y3 y4 y5 y6 y7 y8 y9"),
      // train doc quoting the eval sentence mid-text -> those 8 cut
      (10L, s"t1 t2 $quoted t3 t4"),
      // train doc that REPEATS a train-side span but shares nothing with
      // eval -> untouched (this is the q91/q175 difference)
      (11L, (1 to 8).map(i => s"r$i").mkString(" ") + " u1"),
      (12L, (1 to 8).map(i => s"r$i").mkString(" ") + " u2"),
      // train doc that IS an eval doc verbatim -> fully covered, null fp
      (13L, "y1 y2 y3 y4 y5 y6 y7 y8 y9"),
      // too short for a span -> untouched
      (14L, "z1 z2"),
    ).toDF("doc_id", "text")
    val got = ops.Dedup.decontamScrub(docs, evalMax = 3L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), Option(r.getString(3)))))
      .toMap
    assert(!got.contains(0L) && !got.contains(1L), "eval docs emit no row")
    assert(got(10L) == ((12L, 8L, Some(md5Hex("t1 t2 t3 t4")))))
    assert(got(11L) == ((9L, 0L, Some(md5Hex((1 to 8).map(i => s"r$i").mkString(" ") + " u1")))))
    assert(got(12L) == ((9L, 0L, Some(md5Hex((1 to 8).map(i => s"r$i").mkString(" ") + " u2")))))
    assert(got(13L) == ((9L, 9L, None)))
    assert(got(14L) == ((2L, 0L, Some(md5Hex("z1 z2")))))
  }

  test("hot-bucket guard: salted candidates equal the plain self-join exactly") {
    import spark.implicits._
    // a skewed bucket layout: one band hash shared by 60 docs (the
    // boilerplate-template pile the guard exists for), a 9-doc warm
    // bucket, scattered cold buckets, and docs colliding in SEVERAL
    // bands (multi-band multiplicity must still dedupe to one pair)
    val bands = (
      (0 until 60).map(i => (i.toLong, 0, 777L)) ++
      (0 until 9).map(i => ((100 + i).toLong, 1, 888L)) ++
      (0 until 12).map(i => ((200 + i).toLong, 2, 999L + i / 2)) ++
      (0 until 60 by 3).map(i => (i.toLong, 3, 555L))
    ).toDF("doc_id", "band", "bhash")
    def pairs(cap: Int): Set[(Long, Long)] =
      ops.Dedup.bucketedCandidates(bands, Nil, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap larger than every bucket = the plain self-join, bit-for-bit
    val plain = pairs(1000)
    assert(plain.size == 60 * 59 / 2 + 9 * 8 / 2 + 6, s"fixture: ${plain.size}")
    // caps that FORCE salting of the hot bucket must not change the set
    for (cap <- Seq(2, 7, 16, 59)) assert(pairs(cap) == plain, s"cap=$cap")
    // and the bound must hold: a sub-task holds rows of ≤ 2 hash-groups,
    // so the per-group split of the hot bucket is the per-task bound
    // (uneven hash split — allow 2x slack per group)
    val cap = 8
    val ng = math.ceil(60.0 / cap).toInt
    val maxGroup = bands.filter(col("band") === 0)
      .withColumn("grp", pmod(xxhash64(col("doc_id")), lit(ng.toLong)))
      .groupBy("grp").count().agg(max("count")).head.getLong(0)
    assert(maxGroup <= 2L * cap,
      s"hot bucket must split to ~cap-sized groups: max=$maxGroup cap=$cap")
    // carried columns survive the salted join intact
    val carried = ops.Dedup.bucketedCandidates(
        bands.withColumn("tag", concat(lit("v"), col("doc_id"))), Seq("tag"), cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(carried.forall { case (a, b, ta, tb) => ta == s"v$a" && tb == s"v$b" })
  }

  test("q181 kernel: syndication pairs count arithmetically, diagonal included") {
    import spark.implicits._
    val docs = Seq((1L, "s1"), (2L, "s2"), (3L, "s2"), (4L, "s1"), (5L, "s3"),
      (6L, "s1"), (7L, "s3"), (8L, "s9")).toDF("doc_id", "source")
    // comp 1 = {1,2,3}: cross (s1,s2) = 1·2, diagonal (s2,s2) = C(2,2) = 1
    // comp 4 = {4,5} and comp 6 = {6,7}: (s1,s3) twice → n_comps 2, pairs 2
    // doc 8 is in NO component (outside the closure) → s9 absent entirely
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 6L)).toDF("doc_id", "comp")
    val got = ops.Dedup.syndicationMatrixOf(docs, comps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(("s1", "s2", 1L, 2L), ("s1", "s3", 2L, 2L), ("s2", "s2", 1L, 1L)))
    // conservation: Σ n_pairs over the matrix = Σ_comp C(k, 2)
    assert(got.map(_._4).sum == 3L + 1L + 1L)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
