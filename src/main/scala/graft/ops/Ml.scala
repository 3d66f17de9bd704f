package graft.ops

import org.apache.spark.sql.functions._

import graft.ml.{Embed, Topics}

/** ML operator surface (SURVEY §2.10 M1-M5): the embedding operator and the
  * topic-modeling report tables. Driver check is rows-only (model outputs
  * aren't ANSI-SQL-expressible); invariants are unit-tested (MlSpec). */
object Ml {
  import Relational.Q

  /** M1: batched per-partition embedding of the documents table. Output is
    * the per-doc L2 norm (the reference's normalization invariant,
    * embeddings.py:119) plus the leading component. */
  val q49EmbedDocs: Q = (s, d) => {
    val emb = Embed.embedDocuments(s, d)
    emb.select(col("doc_id"),
        round(graft.functions.Vectors.norm2(col("embedding")), 4).as("norm"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("c0"))
      .orderBy(col("doc_id"))
  }

  /** M3/M4: topic table (topic id incl. -1 outliers, count, pct —
    * bertopicTest.py:57,107-112 contract). */
  val q50TopicInfo: Q = (s, d) =>
    Topics.fit(s, d).topicInfo

  /** M4/A7: per-topic top-5 weighted terms (bertopicTest.py:93-100). */
  val q51TopicTerms: Q = (s, d) =>
    Topics.fit(s, d).topTerms

  /** M3's distribution half: per-doc assigned topic + softmax confidence —
    * the `(topics, probs)` pair BERTopic's fit_transform returns
    * (bertopicTest.py:53-54). Outliers (-1) carry a null prob: they have
    * no cluster membership. ORACLE-CERTIFIED (the one model output that
    * is): given the fitted parameters — centroids, the feature table, the
    * stopword list, exported by [[writeQ94Support]] — the distance →
    * softmax → argmin computation AND the outlier channel are
    * deterministic, so DuckDB recomputes them from the support tables and
    * the documents text (see the oracle SQL). prob ∈ (0,1], Σprobs = 1,
    * argmax = topic stay unit-asserted (MlSpec). */
  val q94TopicProbs: Q = (s, d) =>
    Topics.fit(s, d).assignments
      .select(col("doc_id"), col("topic").cast("long").as("topic"),
        round(col("prob"), 4).as("prob"))
      .orderBy(col("doc_id"))

  /** Oracle support for q94 (run by Verify before the DuckDB compare): the
    * fitted model PARAMETERS as plain parquet under outDir — per-doc
    * feature vectors, the k centroids, and the stopword list that defines
    * the outlier channel. The oracle recomputes everything downstream of
    * these (tokenize → outlier flag; distance → softmax → argmin → round),
    * certifying the engine's serving math rather than trusting it. */
  def writeQ94Support(s: org.apache.spark.sql.SparkSession, d: String,
      outDir: String): Unit = {
    import s.implicits._
    val model = Topics.fit(s, d)
    Embed.embedDocuments(s, d)
      .write.mode("overwrite").parquet(s"$outDir/q94_support_features")
    model.centroids.zipWithIndex.map { case (c, t) => (t, c) }.toSeq
      .toDF("ctopic", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/q94_support_centroids")
    Topics.CustomStopwords.toSeq.toDF("sw").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/q94_support_stopwords")
  }

  /** K6 viz data: topic-similarity heatmap table (the data behind the
    * reference's visualize_heatmap, bertopicTest.py:153-158). k×k rows —
    * trivially small; the companion 2D maps/hierarchy live in
    * [[graft.ml.TopicViz.save]] (sinks, exercised in TopicVizSpec).
    * Rows-only driver check (model output); symmetry/diagonal/range
    * invariants are unit-asserted. */
  val q95TopicHeatmap: Q = (s, d) =>
    graft.ml.TopicViz.heatmap(s, Topics.fit(s, d))
      .orderBy(col("topic_a"), col("topic_b"))

  def queries: Map[String, Q] = Map(
    "q49_embed_docs"  -> q49EmbedDocs,
    "q50_topic_info"  -> q50TopicInfo,
    "q51_topic_terms" -> q51TopicTerms,
    "q94_topic_probs" -> q94TopicProbs,
    "q95_topic_heatmap" -> q95TopicHeatmap,
  )

  /** q94's oracle recomputes, in DuckDB, the full serving path given the
    * exported model parameters: euclidean distance to each centroid
    * (identical accumulation: element-wise square loop), min-shifted
    * softmax, argmin topic (ties to the lowest id, matching the kernel's
    * strict-< scan), and the outlier channel re-derived from documents.text
    * with the same \W+ tokenize + stopword filter the pipeline fits.
    * `{GRAFT_OUT}` is substituted by Verify with the dump directory. */
  def oracle: Map[String, String] = Map(
    "q94_topic_probs" ->
      """WITH f AS (
        |  SELECT doc_id, embedding
        |  FROM read_parquet('{GRAFT_OUT}/q94_support_features/*.parquet')),
        |c AS (
        |  SELECT ctopic, centroid
        |  FROM read_parquet('{GRAFT_OUT}/q94_support_centroids/*.parquet')),
        |sw AS (
        |  SELECT list(sw) AS sws
        |  FROM read_parquet('{GRAFT_OUT}/q94_support_stopwords/*.parquet')),
        |outl AS (
        |  SELECT d.doc_id,
        |    len([t for t in regexp_split_to_array(lower(d.text), '\W+')
        |         if len(t) > 0 AND NOT list_contains(sw.sws, t)]) = 0 AS is_outlier
        |  FROM documents d CROSS JOIN sw),
        |dist AS (
        |  SELECT f.doc_id, c.ctopic,
        |    sqrt(list_sum([
        |      (CAST(f.embedding[i] AS DOUBLE) - c.centroid[i]) *
        |      (CAST(f.embedding[i] AS DOUBLE) - c.centroid[i])
        |      for i in range(1, len(c.centroid) + 1)])) AS dd
        |  FROM f CROSS JOIN c),
        |mn AS (SELECT doc_id, min(dd) AS mnd FROM dist GROUP BY 1),
        |ez AS (
        |  SELECT dist.doc_id, ctopic, dd, exp(mn.mnd - dd) AS e
        |  FROM dist JOIN mn ON dist.doc_id = mn.doc_id),
        |z AS (SELECT doc_id, sum(e) AS zs FROM ez GROUP BY 1),
        |best AS (
        |  SELECT doc_id, ctopic, e FROM (
        |    SELECT doc_id, ctopic, e,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY dd, ctopic) AS rn
        |    FROM ez) WHERE rn = 1)
        |SELECT b.doc_id,
        |  CAST(CASE WHEN o.is_outlier THEN -1 ELSE b.ctopic END AS BIGINT) AS topic,
        |  CASE WHEN o.is_outlier THEN NULL ELSE round(b.e / z.zs, 4) END AS prob
        |FROM best b JOIN z ON b.doc_id = z.doc_id JOIN outl o ON b.doc_id = o.doc_id
        |ORDER BY b.doc_id""".stripMargin,
  )
}
