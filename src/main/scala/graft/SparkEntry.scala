package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query surfaces (graft.ops.*) into the single
  * `queries` / `oracleSql` maps the driver's Verify/Bench harness consumes.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.SemiStructured.queries ++ ops.TextOps.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++ ops.Temporal.queries ++
      ops.Ml.queries ++ ops.Multimodal.queries ++ ops.Scoring.queries ++
      ops.Curation.queries ++ ops.CorpusReports.queries ++ sources.Bucketed.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check.
    * SQL may reference `{GRAFT_OUT}` — Verify substitutes its dump
    * directory, where the [[oracleSupport]] writers placed model-parameter
    * tables the SQL recomputes from. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.SemiStructured.oracle ++ ops.TextOps.oracle ++
      ops.Dedup.oracle ++ ops.Similarity.oracle ++ ops.Temporal.oracle ++
      ops.Ml.oracle ++ ops.Multimodal.oracle ++ ops.Scoring.oracle ++
      ops.Curation.oracle ++ ops.CorpusReports.oracle ++ sources.Bucketed.oracle

  /** TOLERANCE-banded oracle for the approx tier (r21 verdict #5): the
    * two queries whose VALUES are engine-specific sketches (q62 HLL,
    * q80 GK percentile) cannot be hash-compared, but their error
    * contracts are documented — so instead of `no_oracle`, each gets a
    * DuckDB SQL computing the EXACT answer's acceptance band: for every
    * approx output column `c` the SQL yields `c_lo`/`c_hi`; exact
    * columns (group keys, counts) appear as themselves and must match
    * exactly. Verify writes this map as `oracle_tolerance.json`;
    * `tools/check_oracle.py` adjudicates `lo ≤ value ≤ hi` per row.
    * Deliberately NOT merged into [[oracleSql]]: the driver's strict
    * hash compare must keep treating these two as rows-only — an
    * approx value can never hash-match an exact engine. */
  def oracleTolerance: Map[String, String] = ops.Relational.oracleTolerance

  /** Support-table writers for oracle SQL over model outputs: each runs
    * after the query dumps and writes parquet under Verify's outDir (the
    * fitted parameters an oracle needs to recompute a model-backed query
    * independently). Keyed by the queries each writer supports, so a
    * subset Verify run pays only the fits its selection needs. */
  def oracleSupport: Seq[(Set[String], (SparkSession, String, String) => Unit)] =
    Seq(
      (Set("q49_embed_docs", "q50_topic_info", "q51_topic_terms",
        "q94_topic_probs", "q95_topic_heatmap", "q125_hybrid_rrf",
        "q128_hybrid_served", "q132_hybrid_batch"), ops.Ml.writeEmbedSupport),
      (Set("q125_hybrid_rrf", "q128_hybrid_served"), ops.Scoring.writeHybridSupport),
      (Set("q128_hybrid_served", "q132_hybrid_batch", "q137_domain_waterfill"),
        ops.Scoring.writeServedHybridSupport),
      (Set("q132_hybrid_batch"), ops.Scoring.writeBatchHybridSupport),
      (Set("q50_topic_info", "q51_topic_terms", "q94_topic_probs",
        "q95_topic_heatmap"), ops.Ml.writeTopicSupport),
      (Set("q45_ann_ivf", "q96_ann_topk", "q99_ann_serve", "q100_ann_sq",
        "q102_ann_filtered", "q106_hard_negatives", "q111_sem_decontam",
        "q112_ann_pq", "q119_cell_balance"), ops.Similarity.writeAnnSupport),
      (Set("q100_ann_sq"), ops.Similarity.writeAnnSqSupport),
      (Set("q112_ann_pq"), ops.Similarity.writeAnnPqSupport),
      (Set("q211_pca_truncation"), ops.Similarity.writeAnnPcaSupport),
      (Set("q213_nlist_sweep"), ops.Similarity.writeAnnNlistSupport),
      (Set("q217_replica_sweep"), ops.Similarity.writeAnnReplicaSupport),
      (Set("q228_fit_sample_sweep"), ops.Similarity.writeAnnFitSupport),
      (Set("q215_heldout_auc"), ops.Curation.writeHeldoutClassifierSupport),
      (Set("q101_quality_classifier", "q108_quality_retention",
        "q142_classifier_calibration", "q160_data_card_full",
        "q166_classifier_auc", "q185_gate_agreement",
        "q186_gate_agreement_by_source", "q190_gate_venn"),
        ops.Curation.writeClassifierSupport),
      (Set("q103_semdedup", "q104_proto_prune"),
        ops.Curation.writeDedupIndexSupport),
      (Set("q105_dsir_weights"), ops.Curation.writeDsirSupport),
      (Set("q107_temp_mix"), ops.Curation.writeTempMixSupport),
      (Set("q122_lsh_calibration", "q123_lsh_bucket_profile",
        "q226_banding_sweep"), ops.Dedup.writeLshSupport),
      (Set("q224_bloom_sizing_sweep"), ops.Scoring.writeBloomSupport),
      (Set("q225_phash_radius_sweep"), ops.Multimodal.writePhashSweepSupport),
      (Set("q229_phash64_radius_sweep"), ops.Multimodal.writePhash64SweepSupport),
      (Set("q145_bpe_segment", "q146_tok_fertility", "q152_merge_curve",
        "q167_maxmatch_segment"),
        ops.TextOps.writeBpeSupport),
      (Set("q154_wordvec_neighbors", "q155_docvec_similar", "q161_sif_docvec",
        "q184_source_docvec_diversity"),
        ops.Ml.writeWordvecSupport))

  /** Support tables (`{GRAFT_OUT}_support/<name>`) an oracle SQL reads. */
  private[graft] def supportRefs(sql: String): Set[String] =
    "\\{GRAFT_OUT\\}_support/([A-Za-z0-9_]+)".r
      .findAllMatchIn(sql).map(_.group(1)).toSet

  /** The [[oracleSupport]] entries a SUBSET Verify selection needs: keyed
    * directly, or transitively — a selected query's oracle reads a support
    * table that one of a writer's own keyed queries also reads. Derived
    * from the SQL text, so a new query reusing an exported model (the
    * q201-reads-q45's-index pattern) is covered without a manual key
    * (r16 verdict #3: a `Verify ... q201_ann_recall_sweep`-only run
    * previously skipped writeAnnSupport and failed its oracle). */
  private[graft] def supportEntriesFor(selected: Set[String])
      : Seq[(Set[String], (SparkSession, String, String) => Unit)] = {
    val wanted = selected.flatMap(n => supportRefs(oracleSql.getOrElse(n, "")))
    oracleSupport.filter { case (keys, _) =>
      keys.exists(selected) ||
        keys.exists(k => supportRefs(oracleSql.getOrElse(k, "")).exists(wanted))
    }
  }
}
