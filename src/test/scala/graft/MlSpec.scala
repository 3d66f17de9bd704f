package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Embed, Topics}

/** Invariants for the ML layer (M1-M5): embedding determinism + unit norm,
  * topic report contract. */
class MlSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("oracle support writers keep every table OUT of Verify's outDir") {
    // regression guard for the driver-checker breakage: ANY parquet dir
    // inside Verify's outDir — flat or nested — is enumerated as a query
    // by the driver checker (a nested _support dir still produced one
    // spurious err row per run: its pandas sort dies on array-typed
    // parameter columns). r10 contract: support tables live in the
    // SIBLING dir Verify.supportDir(outDir) = s"${outDir}_support",
    // invisible to the enumeration, and the oracle SQL reads them by
    // absolute path through the same substitution.
    val out = java.nio.file.Files.createTempDirectory("graft-support").toString
    SparkEntry.oracleSupport.foreach { case (_, w) => w(spark, sf, out) }
    val top = Option(new java.io.File(out).listFiles())
      .map(_.map(_.getName).toSet).getOrElse(Set.empty[String])
    assert(top.isEmpty, s"support writers must not write inside outDir: $top")
    val tables = new java.io.File(Verify.supportDir(out))
      .listFiles().map(_.getName).toSet
    assert(tables == Set("q94_support_features", "q94_support_centroids",
      "q94_support_stopwords", "q51_support_vocab",
      "q45_support_centroids", "q45_support_cells",
      "q100_support_sqcells", "q101_support_weights",
      "q103_support_cells", "q103_support_centroids",
      "q105_support_logratio", "q107_support_rates",
      "q112_support_codebooks", "q112_support_pqcells",
      "q112_support_cellmeans", "q122_support_sigs",
      "q123_support_bands", "q125_support_qvec",
      "q224_support_bloom", "q225_support_phash",
      "q229_support_phash64",
      "q228_support_centroids_64", "q228_support_cells_64",
      "q228_support_centroids_128", "q228_support_cells_128",
      "q228_support_centroids_50000", "q228_support_cells_50000",
      "q128_support_cells", "q128_support_centroids",
      "q132_support_qembs", "q145_support_merges",
      "q154_support_wordvec", "q211_support_pca",
      "q213_support_centroids_4", "q213_support_cells_4",
      "q213_support_centroids_8", "q213_support_cells_8",
      "q213_support_centroids_16", "q213_support_cells_16",
      "q213_support_centroids_32", "q213_support_cells_32",
      "q215_support_weights",
      "q217_support_centroids_1", "q217_support_cells_1",
      "q217_support_centroids_2", "q217_support_cells_2",
      "q217_support_centroids_3", "q217_support_cells_3"), tables)
    // and the SQL side: every {GRAFT_OUT} read resolves into the sibling
    // support dir ({GRAFT_OUT}_support/...), never into outDir itself
    SparkEntry.oracleSql.values.foreach { sql =>
      """\{GRAFT_OUT\}([^'\s]+)""".r.findAllMatchIn(sql).foreach { m =>
        assert(m.group(1).startsWith("_support/"),
          s"oracle SQL reads outside the sibling support dir: ${m.group(1)}")
      }
    }
  }

  test("WordVec learns distribution: identical-context words embed close, disjoint ones do not") {
    import spark.implicits._
    // dog and cat occur in IDENTICAL contexts -> near-identical PPMI
    // rows -> cosine ~ 1; qrs lives in a disjoint context set
    val docs = (0 until 20).flatMap(i => Seq(
        s"alpha dog beta$i gamma", s"alpha cat beta$i gamma",
        s"zeta$i qrs omega$i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val vecs = graft.ml.WordVec.fit(docs, dim = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dp / math.sqrt(na * nb)
    }
    val dogCat = cos(vecs("dog"), vecs("cat"))
    val dogQrs = cos(vecs("dog"), vecs("qrs"))
    assert(dogCat > 0.95, s"identical contexts must embed close: cos(dog,cat)=$dogCat")
    assert(dogCat > dogQrs + 0.3,
      s"disjoint contexts must embed apart: cos(dog,cat)=$dogCat vs cos(dog,qrs)=$dogQrs")
  }

  test("WordVec minCount drops rare words entirely (center AND context) instead of crashing") {
    import spark.implicits._
    // 'rare' appears once beside frequent 'alpha': with minCount = 2 the
    // pair (alpha, rare) must fold out on BOTH sides before the matrix
    // forms — a half-filtered vocab used to leave 'rare' as a context
    // word with no row index and crash the executor task
    val docs = Seq((1L, "alpha rare"), (2L, "alpha beta"), (3L, "alpha beta"),
      (4L, "beta alpha"), (5L, "alpha beta"))
      .toDF("doc_id", "text")
    val vecs = graft.ml.WordVec.fit(docs, dim = 4, minCount = 2).collect()
    val words = vecs.map(_.getString(0)).toSet
    assert(words == Set("alpha", "beta"), s"rare word must fold out: $words")
    assert(vecs.forall(_.getSeq[Double](1).nonEmpty))
  }

  test("WordVec vocab cap is code-guarded: over-cap fit fails loudly naming the remedy (r15 verdict #2)") {
    import spark.implicits._
    val docs = Seq((1L, "alpha rare"), (2L, "alpha beta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    // 3 distinct words > maxVocab = 2: the guard must fire BEFORE the
    // driver index collects, and the message must name minCount
    val ex = intercept[IllegalArgumentException] {
      graft.ml.WordVec.fit(docs, dim = 4, maxVocab = 2L)
    }
    assert(ex.getMessage.contains("minCount"), ex.getMessage)
    assert(ex.getMessage.contains("maxVocab"), ex.getMessage)
    // raising minCount below the cap is the named remedy — and it works:
    // 'rare' (one co-occurrence) folds out under minCount = 2
    val vecs = graft.ml.WordVec.fit(docs, dim = 4, minCount = 2, maxVocab = 2L)
    assert(vecs.collect().map(_.getString(0)).toSet == Set("alpha", "beta"))
  }

  test("Embedder contract: dim, unit-or-zero norm, determinism, batch-size invariance (r15 verdict #3)") {
    // the dim-parametric contract ANY Embedder implementation must pass —
    // run a new implementation through assertContract before wiring it in
    def assertContract(e: graft.ml.Embedder): Unit = {
      val texts = Seq("the quick brown fox", "hello world", "",
        "alpha beta gamma delta epsilon", "hello world")
      val once = e.encodeBatch(texts)
      once.foreach(v => assert(v.length == e.dim, s"dim ${v.length} != ${e.dim}"))
      once.foreach { v =>
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        assert(math.abs(n - 1.0) < 1e-5 || n == 0.0, s"norm must be 1 or 0: $n")
        assert(v.forall(x => !x.isNaN), "no NaN components")
      }
      // determinism across calls AND within a batch (identical texts)
      assert(e.encodeBatch(texts).map(_.toSeq) == once.map(_.toSeq))
      assert(once(1).toSeq == once(4).toSeq)
      // batch-size invariance: one-at-a-time == batched
      val single = texts.map(t => e.encodeBatch(Seq(t)).head)
      assert(single.map(_.toSeq) == once.map(_.toSeq),
        "a vector must not depend on its batch")
    }
    assertContract(graft.ml.HashingEmbedder)
  }

  test("embedder config seam: hashing default, onnx is selected-never-fallback, unknown rejected") {
    assert(graft.ml.Embed.fromConf(spark) eq graft.ml.HashingEmbedder)
    spark.conf.set("graft.embedder", "onnx:/models/minilm.onnx")
    try {
      val e = graft.ml.Embed.fromConf(spark)
      assert(e.dim == 384)
      // no weights in this environment: the plug refuses loudly, naming
      // the certified tier — never a silent degrade
      val ex = intercept[UnsupportedOperationException](e.encodeBatch(Seq("x")))
      assert(ex.getMessage.contains("hashing"), ex.getMessage)
      assert(ex.getMessage.contains("/models/minilm.onnx"), ex.getMessage)
    } finally spark.conf.set("graft.embedder", "bogus")
    try intercept[IllegalArgumentException](graft.ml.Embed.fromConf(spark))
    finally spark.conf.unset("graft.embedder")
  }

  test("embedder output is deterministic, 64-dim, L2-normalized (embeddings.py:119 invariant)") {
    val a = Embed.encodeBatch(Seq("the quick brown fox", "hello world"))
    val b = Embed.encodeBatch(Seq("the quick brown fox", "hello world"))
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    a.foreach { v =>
      assert(v.length == Embed.Dim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // empty text -> zero vector, not NaN
    val z = Embed.encodeBatch(Seq(""))
    assert(z.head.forall(_ == 0.0f))
  }

  test("embed operator runs batched over a Dataset and preserves ids") {
    val ds = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta")).toDS()
    val out = Embed.embed(ds, batchSize = 2).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    val v1 = out.find(_.getLong(0) == 1L).get.getSeq[Float](1)
    val v3 = out.find(_.getLong(0) == 3L).get.getSeq[Float](1)
    assert(v1 == v3) // same text, same vector
  }

  test("K6/M5: fitted Spark ML models persist to disk and reload") {
    import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    val emb = graft.ml.Embed.embedDocuments(spark, sf)
    val features = emb.withColumn("features",
      org.apache.spark.ml.functions.array_to_vector(col("embedding")))
      .select(col("doc_id"), col("features"))
    val model = new KMeans().setK(3).setSeed(7L).fit(features)
    model.write.overwrite().save(s"$dir/kmeans")
    val back = KMeansModel.load(s"$dir/kmeans")
    val a = model.transform(features).select("doc_id", "prediction")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = back.transform(features).select("doc_id", "prediction")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("topic pipeline emits the bertopic-shaped report tables") {
    val m = Topics.fit(spark, sf, k = 5)
    val info = m.topicInfo.collect()
    assert(info.nonEmpty)
    // percentages sum to ~100
    assert(math.abs(info.map(_.getDouble(2)).sum - 100.0) < 0.5)
    // every doc is assigned exactly one topic
    assert(m.assignments.count() ==
      Tables.documents(spark, sf).count())
    val terms = m.topTerms.collect()
    assert(terms.nonEmpty)
    // ranked 1..k within each topic
    val byTopic = terms.groupBy(_.getInt(0))
    byTopic.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
    }
    // deterministic across fits (fixed seed); different topTermsK bypasses
    // the fit memoization so this is a genuine refit
    val m2 = Topics.fit(spark, sf, k = 5, topTermsK = 6)
    assert(m2.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      m.assignments.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("topic probabilities: valid distribution, argmax = assigned topic") {
    val m = Topics.fit(spark, sf, k = 5)
    val rows = m.assignments.collect()
    assert(rows.nonEmpty)
    var sawOutlier = false
    rows.foreach { r =>
      val topic = r.getInt(1)
      if (topic == -1) {
        sawOutlier = true
        assert(r.isNullAt(2) && r.isNullAt(3), "outliers carry no distribution")
      } else {
        val prob = r.getDouble(2)
        val probs = r.getSeq[Double](3)
        assert(probs.forall(p => p > 0.0 && p <= 1.0))
        assert(math.abs(probs.sum - 1.0) < 1e-9, s"sum=${probs.sum}")
        assert(probs.indexOf(probs.max) == topic,
          s"argmax ${probs.indexOf(probs.max)} != assigned $topic")
        assert(prob == probs(topic), "prob column must be the assigned component")
      }
    }
    // the q94 surface: one row per doc, prob null iff topic = -1
    val q = SparkEntry.queries("q94_topic_probs")(spark, sf).collect()
    assert(q.length == rows.length)
    q.foreach(r => assert(r.isNullAt(2) == (r.getLong(1) == -1L)))
    if (!sawOutlier)
      System.err.println("[MlSpec] note: fixture produced no -1 outlier doc")
  }
}
