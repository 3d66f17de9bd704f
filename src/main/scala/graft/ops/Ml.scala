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
    * no cluster membership. Rows-only driver check (model output);
    * prob ∈ (0,1], Σprobs = 1, argmax = topic are unit-asserted (MlSpec). */
  val q94TopicProbs: Q = (s, d) =>
    Topics.fit(s, d).assignments
      .select(col("doc_id"), col("topic"), round(col("prob"), 6).as("prob"))
      .orderBy(col("doc_id"))

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

  def oracle: Map[String, String] = Map.empty
}
