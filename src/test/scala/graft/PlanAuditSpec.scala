package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality audit: asserts the physical plans keep the properties the
  * 100 TB deployment depends on — predicate pushdown into the parquet scan,
  * column pruning, broadcast joins for small sides, pre-aggregation below
  * joins, and no accidental cartesian products anywhere in the surface. */
class PlanAuditSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  // audit the REAL computation plans: with the default cache lifecycle the
  // builders return an eager localCheckpoint (a LogicalRDD scan), which
  // would hide the join/shuffle/pushdown shape from every assertion below
  // — and silently blind the whole-surface cartesian sweep
  override def beforeAll(): Unit = {
    spark.conf.set(graft.ops.Caching.PassthroughKey, "true")
    super.beforeAll()
  }
  override def afterAll(): Unit = {
    spark.conf.unset(graft.ops.Caching.PassthroughKey)
    super.afterAll()
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: shipdate filter is pushed to the parquet scan; columns pruned") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "unused columns must not be read")
  }

  test("q09: contains-filter reaches the scan as StringContains") {
    val p = plan("q09_filter_contains")
    assert(p.contains("StringContains(text,join)"), p)
  }

  test("q12: semi-join executes as broadcast") {
    val p = plan("q12_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q13: revenue is pre-aggregated below the joins; nation is broadcast") {
    val p = plan("q13_join_revenue")
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(joinIdx >= 0 && aggIdx > joinIdx,
      "expected a HashAggregate (lineitem pre-reduce) below the join tree")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q06: ranking window is partitioned (no single-partition window)") {
    val p = plan("q06_topk_per_group")
    assert(p.contains("Window"), p)
    assert(!p.contains("Window [", p.indexOf("partitionBy")) ||
      p.contains("hashpartitioning(lang"), p)
  }

  test("q75: chunking is a pure narrow scan — no hash shuffle anywhere") {
    val p = plan("q75_chunk")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle (only the final sort's range exchange):\n$p")
  }

  test("q76: packing shuffles ONCE on source; the group-by reuses the window's partitioning") {
    val p = plan("q76_pack")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (window by source), got $hashExchanges:\n$p")
  }

  test("q77: vocabulary is TakeOrdered (no global sort) and joins as broadcast") {
    val p = plan("q77_oov_rate")
    assert(p.contains("TakeOrderedAndProject"), s"top-K vocab must not full-sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"K-row vocab must broadcast:\n$p")
  }

  test("no unexpected cartesian products across the whole query surface") {
    // intended nested-loop plans: q44's q<>c non-equi condition, and the
    // broadcast cross-joins with a 1-row scalar total (the q04 pattern,
    // also q57's corpus count and q50's topic-pct total)
    // q84/q85/q93 add the same broadcast-1-row-scalar shape (corpus stats /
    // unigram grand total / persisted index stats)
    // q125/q126 compose the q84/q85 kernels, inheriting the same shape
    // q135 broadcasts its 1-row percentile-cut table; q138 composes the
    // q131 scorer (its 1-row corpus-stats broadcast) — same scalar shape
    val allowedNestedLoop =
      Set("q44_knn_brute", "q04_ratio_of_total", "q57_tfidf", "q50_topic_info",
        // q201's exact reference is the q44 intended shape (50-row
        // broadcast batch x corpus, non-equi), plus the probe scalar;
        // q207/q208/q209 reuse the same exact reference across the
        // tier/shortlist/dimension tables
        "q201_ann_recall_sweep", "q207_quant_recall",
        "q208_shortlist_sweep", "q209_dim_ablation",
        "q210_pq_shortlist_sweep", "q211_pca_truncation",
        "q84_bm25", "q85_perplexity", "q93_bm25_indexed",
        "q125_hybrid_rrf", "q126_curriculum", "q128_hybrid_served",
        "q131_batched_bm25", "q132_hybrid_batch",
        "q135_ccnet_buckets", "q156_bigram_buckets", "q138_retrieval_metrics",
        // q147 broadcasts its 1-row vocabulary-size scalar (the q85 shape)
        "q147_bigram_perplexity",
        // q157 composes q147's vocab scalar + q156's 1-row cut broadcast
        "q157_ppl_gate_funnel",
        // q171 is the q157 shape on the KN tier: the q165 Ney-discount
        // scalar + the same 1-row cut broadcast
        "q171_kn_gate_funnel",
        // q194 is the q171 shape one order up: the q176 scalar pair
        // inside the score artifact + the same 1-row cut broadcast
        "q194_kn3_gate_funnel",
        // q185/q186 compose the q157 cut broadcast with the q101 weight
        // scalars; pair rows explode from the count agg
        "q185_gate_agreement", "q186_gate_agreement_by_source",
        "q190_gate_venn",
        // q173 compares both tiers' gates: two 1-row cut broadcasts;
        // q192 is the same shape one order up (kn vs kn3 cuts)
        "q173_tier_flips", "q192_order3_flips",
        // q158 now carries the CCNet leg (r14 #5): the q147 vocab scalar
        // + the q156 1-row cut broadcast inside the funnel
        "q158_multimodal_funnel",
        // q160 composes the same 1-row cut broadcast onto the q150 card
        "q160_data_card_full",
        // q163 broadcasts the train-split vocab scalar (the q147 shape)
        "q163_heldout_ppl",
        // q206 composes the q163 split with the q165/q176 scalar pairs
        // (three 1-row broadcasts: discount, D3, train vocab)
        "q206_heldout_ladder",
        // q165 broadcasts its 1-row Ney-discount scalar (the q147 shape)
        "q165_kn_perplexity",
        // q176 composes TWO 1-row discount scalars (the bigram D inside
        // its P2 projection + the trigram D3); q177 reads both memoized
        // artifacts, inheriting the same scalar shapes on first fit
        "q176_kn3_perplexity", "q177_order_ladder",
        // q179 broadcasts the 1-row global-vocabulary scalar (q147 shape)
        "q179_source_lm_specificity",
        // q170 folds against its 1-row decile-cut broadcast (q135 shape)
        "q170_vocab_growth",
        // q198 folds against its 1-row quartile-cut broadcast (q135 shape)
        "q198_quality_length",
        // q204 folds against its 1-row three-cut broadcast (q135 shape)
        "q204_ppl_cut_sweep",
        // q183 broadcasts its 1-row (tot, Z) normalizer scalar (q85 shape)
        "q183_temperature_mix",
        // q172 is q170's fold over the media hash table — same 1-row
        // decile-cut broadcast
        "q172_media_hash_growth",
        // q153's ha < hb pair join runs over DISTINCT hash values only —
        // bounded by hash-space occupancy, the q44-class intended shape
        "q153_hamming_hist",
        // q154's neighbor join is vocab × vocab — vocabulary-bounded
        "q154_wordvec_neighbors",
        // q155's serve is a 10-row broadcast probe × corpus (q140 shape)
        "q155_docvec_similar",
        // q161 = the q155 probe shape + a 1-row corpus-total broadcast
        "q161_sif_docvec",
        // q184 shares q161's pooling fold (same 1-row corpus-total scalar)
        "q184_source_docvec_diversity",
        // q212 joins its 1-row exact-distinct broadcast onto the 1-row
        // sketch agg (the q04 scalar shape, both sides single-row)
        "q212_kmv_error_curve",
        // q213/q217/q228 compose the q201 exact-reference shape with two
        // 1-row scalar broadcasts per sweep point (scan count, member total)
        "q213_nlist_sweep", "q217_replica_sweep", "q228_fit_sample_sweep",
        // q216 replays q183's 1-row (tot, Z) normalizer per temperature
        "q216_temp_sweep",
        // q218 replays the q131 scorer (its 1-row corpus-stats
        // broadcast) once per (k1, b) — the q138 composition shape
        "q218_bm25_param_sweep",
        // q220 joins each w's 1-row distinct-count scalar onto its
        // 1-row totals row (the q04 scalar shape)
        "q220_winnow_sweep",
        // q221 joins the 1-row truth-count scalar onto each cut's 1-row
        // counts (the q04 scalar shape)
        "q221_simhash_threshold_sweep",
        // q224 broadcasts the 1-row n_eval scalar (filter size) and the
        // 6-row config grid onto the gram stream, plus the 1-row
        // n_true/n_probe scalars onto the 6-row result (q04 shapes)
        "q224_bloom_sizing_sweep",
        // q225/q229's value-pair join is DISTINCT orig-hash × DISTINCT
        // stamped-hash values under the hd predicate — bounded by
        // hash-space occupancy (the q153 intended shape; q229's 64-bit
        // value sets are ≤ the 500-image corpus size), plus per-radius
        // 1-row scalar cross-joins (q04 shape)
        "q225_phash_radius_sweep", "q229_phash64_radius_sweep",
        // q226 joins the 1-row truth-count scalar onto the 4-row banding
        // fold (the q221 shape)
        "q226_banding_sweep",
        // q230 broadcasts the 1-row n_total scalar onto each width's
        // vocab-sized estimate fold (the q04 scalar shape)
        "q230_cms_sizing_sweep")
    SparkEntry.queries.keys.foreach { name =>
      val p =
        try plan(name)
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
      if (!allowedNestedLoop(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("no unpartitioned window over unbounded input anywhere in the surface") {
    // a Window with an empty partitionSpec serializes its whole input
    // through ONE task — only acceptable when the input is statically
    // bounded (e.g. q11: TakeOrderedAndProject limits to 200 rows first)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    SparkEntry.queries.keys.foreach { name =>
      val optimized = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
      optimized.foreach {
        case w: LWindow if w.partitionSpec.isEmpty =>
          assert(w.child.maxRows.isDefined,
            s"$name plans an unpartitioned Window over unbounded input:\n$w")
        case _ =>
      }
    }
  }

  test("q57: ranking runs through the native bounded-heap operator") {
    val p = plan("q57_tfidf")
    assert(p.contains("TopKPerGroup"), s"q57 must use the heap operator:\n$p")
    // the rank window reuses the operator's hash distribution: no hash
    // exchange between the window (printed above) and the operator (below)
    val wIdx = p.indexOf("Window")
    val tIdx = p.indexOf("TopKPerGroup")
    assert(wIdx >= 0 && tIdx > wIdx, s"expected Window over TopKPerGroup:\n$p")
    assert(!p.substring(wIdx, tIdx).contains("Exchange hashpartitioning"),
      s"window must not re-shuffle the operator output:\n$p")
  }

  test("q92: sketch-only — the Expand-based multi-distinct plan must not return") {
    // the exact-countDistinct ride-along forced Expand + a full-cardinality
    // shuffle; the registered query is sketch-only by design (the exact
    // comparison lives in ExpressionsSpec)
    val p = plan("q92_kmv_distinct")
    assert(!p.contains("Expand"), s"q92 plans an Expand (multi-distinct ride-along?):\n$p")
  }

  test("q93: term lookup reaches the postings scan as a pushed In-filter") {
    val p = plan("q93_bm25_indexed")
    assert(p.contains("In(term"), s"postings isin must push to the scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"df/doclen joins must broadcast:\n$p")
  }

  test("q45: the IVF member scan partition-prunes on the probed cells") {
    // the saved index is cell-partitioned (IvfIndex.save) and search filters
    // on the batch's probed-cell set — the scan must carry that as a
    // PARTITION filter, not a post-scan predicate, so a small batch reads
    // only its probed fraction of the index
    val p = plan("q45_ann_ivf")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a partition filter on cell in q45's member scan:\n$p")
  }

  test("q99: the small-batch serve probes a STRICT subset of the index cells") {
    // q45/q96 use the whole corpus as the query batch, so every cell is
    // probed and the partition filter selects everything — q99 is the
    // production shape (10 queries × 3 probes < 32 cells by construction),
    // and the scan must both CARRY the partition filter and SELECT fewer
    // partitions than the index has
    val p = plan("q99_ann_serve")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a partition filter on cell in q99's member scan:\n$p")
    val probed = graft.ops.IvfIndex.probedCells(spark,
      graft.ops.IvfIndex.load(spark, graft.ops.SessionArtifacts.existing("ivf-q45", spark, sf)
        .getOrElse(fail("q45 index dir missing after planning q99"))),
      Tables.embeddings(spark, sf)
        .filter(org.apache.spark.sql.functions.col("vec_id") < 10)
        .select("vec_id", "embedding"),
      nProbe = 3)
    assert(probed.length < 32 && probed.nonEmpty,
      s"expected a strict subset of the 32 cells, probed ${probed.length}")
  }

  test("q96: the ranked merge costs one exchange beyond the cell shuffle") {
    // fused probe shuffle (by cell) + one bounded per-query merge (by
    // vec_id) — the r7 rework removed the extra (vec_id, cand_id) exchange
    // the groupBy-then-window form paid
    val p = plan("q96_ann_topk")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 2, s"expected at most 2 hash exchanges (cell probe + query merge), got $n:\n$p")
  }

  test("q99/q100: both serving tiers stay within the 2-exchange budget") {
    // q99: cell shuffle + query merge. q100: the SQ coarse scan's cell
    // shuffle + the shortlist merge — the exact rerank must add ZERO
    // exchanges (broadcast joins on the bounded candidate set; the rank
    // window reuses the merge's vec_id partitioning)
    for (q <- Seq("q99_ann_serve", "q100_ann_sq")) {
      val p = plan(q)
      val n = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(n <= 2, s"$q: expected at most 2 hash exchanges, got $n:\n$p")
    }
  }

  test("q112: the PQ serving tier stays within the same 2-exchange budget") {
    // ADC coarse scan's cell shuffle + the shortlist merge; the shared
    // exact rerank (IvfSq.exactRerank) must add ZERO exchanges, exactly
    // as in q100 — extraction into a shared helper must not cost a plan
    val p = plan("q112_ann_pq")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 2, s"q112: expected at most 2 hash exchanges, got $n:\n$p")
  }

  test("q111: the threshold search partition-prunes its member scan") {
    val p = plan("q111_sem_decontam")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a cell partition filter on q111's member scan:\n$p")
  }

  test("q116: frequency histogram is pure partial aggregation — no window, no sort before agg") {
    // the whole point of the bin-length bucket design: a rank-based Zipf
    // report would need one unpartitioned window over the vocabulary;
    // this plan must stay two map-side-combined aggregations
    val p = plan("q116_token_freq_hist")
    assert(!p.contains("Window"), s"q116 must not plan a window:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial aggs:\n$p")
  }

  test("q117: the corpus gram table feeds a semi join — no distinct pass over it") {
    val p = plan("q117_eval_saturation")
    assert(p.contains("LeftSemi"), s"expected a left-semi hit probe:\n$p")
  }

  test("q121: the waterfill windows run over the source dimension, after the corpus agg") {
    // the unpartitioned windows are fine ONLY because their input is the
    // per-source aggregate (≤ #sources rows); assert the aggregation sits
    // below the first window so corpus rows never reach it
    val p = plan("q121_budget_waterfill")
    val aggIdx = p.lastIndexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"expected the per-source aggregate BELOW the window:\n$p")
  }

  test("q110: the boilerplate set joins back broadcast; one df aggregation") {
    // the join of gram occurrences against the qualifying-gram set must
    // be BROADCAST (the set is bounded by grams-per-doc / df-fraction
    // regardless of corpus size) — a shuffle join here would mean the
    // full band of gram occurrences reshuffles against a tiny side
    val p = plan("q110_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the qualifying-gram join to broadcast:\n$p")
    // the gram-occurrence side must never sort-merge against the tiny
    // qualifying set (the doc-keyed coverage join may choose its own
    // strategy — it is doc-count-sized on both sides)
    assert(!p.contains("SortMergeJoin LeftSemi") &&
      "SortMergeJoin".r.findAllIn(p).size <= 1,
      s"gram-occurrence join must not sort-merge:\n$p")
  }

  test("q74: dedup edges come from the persisted index, not an embeddings block sweep") {
    // the r10 rework: edge generation reads the session's SAVED dedup index
    // (cell-pair bound + per-cell sweep) — the plan must scan the index
    // artifact and must NOT scan the embeddings table (the old O(N²) block
    // sweep read embeddings.parquet directly and replicated every row to
    // every block task)
    val p = graft.ops.Similarity.ivfDedupEdges(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft-ivf-dedup"),
      s"q74 edges must scan the persisted dedup index:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"q74 edges must not re-scan the embeddings table:\n$p")
  }

  test("q101: classifier scoring is a single narrow scan — no join, no hash shuffle") {
    // the weights are four broadcast scalars folded into the projection;
    // anything else (a join against a weights table, a shuffle) would be
    // the wrong plan class for a 100 TB scoring pass
    val p = plan("q101_quality_classifier")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"scoring must not hash-shuffle (only the final sort's range exchange):\n$p")
  }

  test("q102: the filtered member scan prunes partitions AND pushes the label predicate") {
    val p = plan("q102_ann_filtered")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a partition filter on cell in q102's member scan:\n$p")
    assert("PushedFilters: \\[[^\\]]*In\\(label".r.findFirstIn(p).isDefined,
      s"expected the label In-predicate pushed into the parquet scan:\n$p")
  }

  test("q105: DSIR scoring is a single narrow scan — no join, no hash shuffle") {
    // the whole 256-bucket model folds into the projection as a broadcast
    // map literal; a join against the model table or any hash exchange
    // would be the wrong plan class for a 100 TB selection pass
    val p = plan("q105_dsir_weights")
    assert(!p.contains("Join"), s"DSIR scoring must not join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"DSIR scoring must not hash-shuffle (only the final sort's range exchange):\n$p")
  }

  test("q107: the rate table broadcasts; one hash exchange for the rollup") {
    // the fitted per-language rates are a handful of rows — a sort-merge
    // join or a second corpus shuffle would be the wrong plan class for
    // a 100 TB admission pass
    val p = plan("q107_temp_mix")
    assert(p.contains("BroadcastHashJoin"), s"rate join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"rate join must not sort-merge:\n$p")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashExchanges <= 1,
      s"expected at most one hash exchange (the funnel rollup), got $hashExchanges:\n$p")
  }

  test("q106: ONE fused member scan, partition-pruned to the probed cells") {
    val p = plan("q106_hard_negatives")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a partition filter on cell in q106's member scan:\n$p")
    // the fused group-exclusion kernel reads the label-carrying cell table
    // exactly once per batch; a per-label loop of filtered searches would
    // show one scan per distinct batch label (measured (L−1)× read
    // amplification for identical answers)
    val memberScans = "graft-ivf-filtered-cells".r.findAllIn(p).size
    assert(memberScans == 1,
      s"expected exactly one member scan, found $memberScans:\n$p")
  }

  test("q103/q104: cluster-scoped curation reads the index artifact, not the embeddings table") {
    val members = graft.ops.IvfIndex.load(spark,
      graft.ops.Similarity.dedupIvfDir(spark, sf)).cells
      .select(org.apache.spark.sql.functions.col("cell").cast("long").as("cell"),
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val edges = graft.ops.Curation.withinCellEdges(spark, members,
      graft.ops.Curation.SemDedupCosT).queryExecution.executedPlan.toString
    assert(edges.contains("graft-ivf-dedup") && !edges.contains("embeddings.parquet"),
      s"q103 edges must scan the persisted dedup index only:\n$edges")
    val p = plan("q104_proto_prune")
    assert(p.contains("graft-ivf-dedup") && !p.contains("embeddings.parquet"),
      s"q104 must scan the persisted dedup index only:\n$p")
    assert(p.contains("hashpartitioning(cell"),
      s"q104's rank window must partition by cell (no global window):\n$p")
  }

  test("aggregations use partial (map-side) aggregation") {
    val p = plan("q03_group_count")
    // two HashAggregates (partial + final) around the exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q126: the ordinal's sort stage is a range exchange; the final plan has no global window") {
    import org.apache.spark.sql.functions.col
    // the zipWithIndex hop hides the sort stage behind an RDD scan, so
    // audit the stage itself for the TeraSort shape…
    val stagePlan = graft.ops.Ordinal.rangeSortedStage(
        graft.Tables.documents(spark, sf).select(col("doc_id")),
        Seq(col("doc_id")), 32)
      .queryExecution.executedPlan.toString
    assert(stagePlan.contains("rangepartitioning"),
      s"q126's total order must come from a range exchange:\n$stagePlan")
    // …and the full query for the anti-pattern's absence: position
    // assignment must never be an unpartitioned row_number window
    val p = plan("q126_curriculum")
    assert(!p.contains("Window"),
      s"q126 must take positions from zipWithIndex, not a window:\n$p")
  }

  test("q125: each fusion arm is TakeOrdered; windows only over the limited frames") {
    val p = plan("q125_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"both hybrid arms must top-k via TakeOrderedAndProject (no global sort):\n$p")
  }

  test("q127: the contamination arm joins the eval vocabulary as LEFT SEMI") {
    val p = plan("q127_gate_funnel")
    assert(p.contains("LeftSemi"),
      s"q127's contamination probe must be a semi join (no fan-out):\n$p")
  }

  test("q131: batch scoring joins broadcast query terms; top-5 cut is the native plan") {
    val p = plan("q131_batched_bm25")
    assert(p.contains("TopKPerGroup ["),
      s"q131's per-query cut must run on the native plan (no window sort):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q131's 30-row query-term table must broadcast into the postings join:\n$p")
  }

  test("q132: the batch dense arm routes ALL queries in one pruned member scan") {
    val p = plan("q132_hybrid_batch")
    assert(p.contains("PartitionFilters: [") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected one partition-pruned member scan for the whole batch:\n$p")
    // exactly one doc-index member scan — a per-query loop would show ten
    val memberScans = "graft-ivf-doc".r.findAllIn(plan("q132_hybrid_batch")).size
    assert(memberScans <= 2, // probe side + member side of the one search
      s"expected one fused batch search, found $memberScans index scans:\n$p")
  }

  test("q128: the served dense arm partition-prunes the doc index; no corpus text scan") {
    val p = plan("q128_hybrid_served")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"expected a partition filter on cell in q128's member scan:\n$p")
    assert(!p.contains("documents.parquet"),
      s"q128 must answer from artifacts only — corpus text scan found:\n$p")
  }

  test("q135: the tercile split is cut-based — no window, no global sort below the 3-row output") {
    val p = plan("q135_ccnet_buckets")
    assert(!p.contains("Window"),
      s"terciles must come from percentile cuts, not a ranking window:\n$p")
    // exactly one broadcast of the 1-row cut table into the corpus-sized side
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the cuts must broadcast:\n$p")
  }

  test("q137: domains come from the persisted doc-index assignment, not a re-clustering") {
    val p = plan("q137_domain_waterfill")
    assert(p.contains("graft-ivf-doc"),
      s"expected a scan of the doc IVF index artifact:\n$p")
  }

  test("q138: the per-query rank window partitions on query_id (the term window is limit-30-bounded)") {
    val p = plan("q138_retrieval_metrics")
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(query_id"),
      s"the per-query rank window must partition on query_id:\n$p")
  }

  test("q146: the vocabulary segmentation joins as BROADCAST onto the source-word counts") {
    // the vocab-sized n_syms table must broadcast: a shuffle join here
    // would move the corpus-sized (source, word) aggregate for a
    // Zipf-bounded build side
    val p = plan("q146_tok_fertility")
    assert(p.contains("BroadcastHashJoin"), s"vocab side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join for a vocab-sized side:\n$p")
  }

  test("q144: every join in the cross-modal closure is an equi-join (hash or sort-merge)") {
    val p = plan("q144_cross_modal_near")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the near tier must stay banded — no pair enumeration:\n$p")
  }

  test("q134: the bucketed join needs ZERO exchanges — the write-time layout is the shuffle") {
    import org.apache.spark.sql.functions.col
    // force the sort-merge path: a broadcast join would also skip the
    // shuffle, but for the wrong (size-dependent) reason — the bucketed
    // layout must carry the co-location on its own
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (docsT, statsT) = graft.sources.Bucketed.tables(spark, sf)
      val p = spark.table(docsT).join(spark.table(statsT), Seq("doc_id"))
        .select(col("doc_id"), col("n_chars"), col("n_toks"))
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"both sides are bucketed on the join key — no exchange may appear:\n$p")
      assert("SelectedBucketsCount".r.findAllIn(p).size == 2,
        s"both scans must read as bucketed scans:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q222: the whole gap sweep rides ONE per-user window exchange (r17 verdict #6)") {
    // all four gaps' indicators and running session-ids are side-by-side
    // columns over the SAME (user_id, ts) window — one exchange and one
    // sort of the event set; the prior form re-windowed four times
    val p = plan("q222_session_gap_sweep")
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(userExchanges == 1,
      s"expected exactly ONE user_id window exchange, got $userExchanges:\n$p")
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n <= 3, s"expected ≤3 hash exchanges (window + two aggs), got $n:\n$p")
  }
}
