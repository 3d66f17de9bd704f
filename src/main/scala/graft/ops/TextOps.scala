package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Html, TextFns}

/** Text-analysis operator surface — SURVEY §2.8 C3-C9 + the north-star
  * text-analysis block (language stats, quality scoring, token counting,
  * fingerprinting, exact dedup) over the `documents` table.
  *
  * Everything except `html_post_text` is built-in expressions — codegen'd,
  * narrow (no shuffle until the final group-by), pushdown-friendly. At
  * 100 TB these are single-pass scans; the group-bys key on low-cardinality
  * columns (lang/status) so the shuffle is the partial-agg output, not data.
  */
object TextOps {
  import Relational.Q

  /** HTML→text extraction (C8/C9, htmlConverter.py:12-43). Post-card HTML is
    * constructed around each document's text (script + whitelisted/dropped
    * imgs + a decoy div), extracted with the scanner UDF, and fingerprinted;
    * the oracle recomputes the expected text independently — validating
    * selector scoping, script-stripping, and the alt-text markers. */
  val q30HtmlExtract: Q = (s, d) => {
    val html = concat(
      lit("""<html><body><div class="post--card--wrapper"><script>var x = 1 < 2;</script><p>"""),
      col("text"),
      lit("""</p><img alt="Impressions"><img src="a.png" alt="decorative"></div>"""),
      lit("""<div class="other">IGNORED</div></body></html>"""))
    Tables.documents(s, d)
      .withColumn("extracted", Html.html_post_text(html))
      .select(col("doc_id"), md5(col("extracted")).as("fp"),
        length(col("extracted")).as("n_extracted"))
      .orderBy(col("doc_id"))
  }

  /** Token counting + whitespace normalization + fingerprint (C4/C5 +
    * north-star token counting / document fingerprinting). */
  val q31Tokens: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        TextFns.tokenCount(col("text")).as("n_tokens"),
        length(TextFns.normText(col("text"))).as("n_chars_norm"),
        TextFns.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }

  /** String scalar battery (C2/C3/C5/C6: concat, extension rewrite, trim,
    * length — htmlConverter.py:49 `.replace(".html",".txt")`). */
  val q32StringFuncs: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("fname", concat(lit("doc_"), col("doc_id"), lit(".html")))
      .select(col("doc_id"),
        regexp_replace(col("fname"), "\\.html$", ".txt").as("txt_name"),
        concat_ws(":", col("source"), col("lang")).as("tag"),
        length(trim(col("text"))).as("len"))
      .orderBy(col("doc_id"))
  }

  /** Per-language corpus stats (M9 north-star text stats). */
  val q33LangStats: Q = (s, d) => {
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"),
        graft.ops.ExactMean.meanInt(col("n_chars"), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))
  }

  /** Quality scoring (north-star): token count, average word length,
    * stopword ratio → composite score. Mirrors the length/stopword heuristics
    * a pretraining-data pipeline applies before training. */
  /** The q34 quality heuristic's stopword list and score — ONE
    * definition: q34 certifies it, q150 (data card) and q151 (dedup-bias
    * audit) aggregate it. A change here moves all three together; a
    * textual copy could silently desynchronize the release reports from
    * the certified per-doc score. Rounded to 4 (the certified value). */
  private[graft] val QualityStopwords = Seq("the", "a", "of", "and", "or", "to", "in")
  private[graft] def qualityCol: org.apache.spark.sql.Column = {
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(QualityStopwords: _*))).cast("double")
    round(least(nTok / 50.0, lit(1.0)) * (lit(1.0) - nStop / nTok), 4)
  }

  val q34Quality: Q = (s, d) => {
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(QualityStopwords: _*))).cast("double")
    val charsNoSpace = length(regexp_replace(TextFns.normText(col("text")), " ", "")).cast("double")
    Tables.documents(s, d)
      .select(col("doc_id"),
        nTok.cast("long").as("n_tokens"),
        round(charsNoSpace / nTok, 4).as("avg_word_len"),
        round(nStop / nTok, 4).as("stop_ratio"),
        qualityCol.as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style rule-gate calibration (Rae et al. 2021, "Scaling
    * Language Models"): word-count bounds, mean-word-length bounds, minimum
    * stopword presence, symbol-to-word ratio cap. The DEFAULTS are q97's
    * corpus-calibrated instance (the synthetic docs run 10-99 words, so
    * both outcomes occur at test scale); pipelines pass their own. */
  case class RuleGateConfig(
      minWords: Long = 30L, maxWords: Long = 90L,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      stopwords: Seq[String] = Seq("the", "a", "of"), minStopHits: Long = 1L,
      symbol: String = "#", maxSymbolRatio: Double = 0.1)

  private def ruleGateSignals(cfg: RuleGateConfig) = {
    val toks = TextFns.tokens(col("text"))
    val nW = size(toks).cast("long")
    val norm = TextFns.normText(col("text"))
    val meanW = round(length(regexp_replace(norm, " ", "")).cast("double") / nW, 4)
    val stopHits = cfg.stopwords.map(w => array_contains(toks, w).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val symbolRatio = round(
      (length(col("text")) - length(regexp_replace(col("text"),
        java.util.regex.Pattern.quote(cfg.symbol), ""))).cast("double") / nW, 4)
    (nW, meanW, stopHits, symbolRatio)
  }

  /** The gate's keep/drop DECISION as a filter predicate — the form a
    * pipeline composes (pipelines.TrainingData stage 0). Pure codegen'd
    * scan: at 100 TB this is a predicate pass, no shuffle. Null-text docs
    * are DROPPED (null signals propagate null through the conjunction;
    * coalesce pins the verdict to false — mirrored by the oracle's CASE,
    * which emits 0 for them). */
  def ruleGateKeep(cfg: RuleGateConfig = RuleGateConfig()): org.apache.spark.sql.Column = {
    val (nW, meanW, stopHits, symbolRatio) = ruleGateSignals(cfg)
    coalesce(
      nW.between(cfg.minWords, cfg.maxWords) &&
        meanW.between(cfg.minMeanWordLen, cfg.maxMeanWordLen) &&
        stopHits >= cfg.minStopHits && symbolRatio <= cfg.maxSymbolRatio,
      lit(false))
  }

  /** The gate as a REPORT: per-doc signals + verdict over a
    * (doc_id, text) frame. All four signals and the verdict are
    * integer/4-decimal exact, so the DuckDB oracle certifies the GATE
    * itself, not just the features; the rule STRUCTURE is the production
    * shape. */
  def ruleGate(docs: org.apache.spark.sql.DataFrame,
      cfg: RuleGateConfig = RuleGateConfig()): org.apache.spark.sql.DataFrame = {
    val (nW, meanW, stopHits, _) = ruleGateSignals(cfg)
    docs.select(col("doc_id"),
      nW.as("n_words"),
      meanW.as("mean_wlen"),
      stopHits.as("stop_hits"),
      ruleGateKeep(cfg).cast("long").as("keep"))
  }

  /** q34 scores, THIS one decides: the document-level heuristic filter
    * every pretraining pipeline runs before model-based scoring —
    * [[ruleGate]] at its calibrated defaults. */
  val q97GopherRules: Q = (s, d) =>
    ruleGate(Tables.documents(s, d)).orderBy(col("doc_id"))

  /** Language-ID heuristic (north-star): stopword-marker voting. The corpus
    * is synthetic so the markers key on the generator's vocabulary; the
    * operator shape (per-language marker hit counts → argmax) is the real
    * n-gram language-ID structure. */
  val q35LangId: Q = (s, d) => {
    val norm = TextFns.normText(col("text"))
    val guess = when(norm.contains(" the "), "en")
      .when(norm.contains(" la "), "es")
      .when(norm.contains(" der "), "de")
      .otherwise("und")
    Tables.documents(s, d)
      .withColumn("guess", guess)
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guess"))
  }

  /** Exact deduplication (north-star M6): group by content fingerprint,
    * keep the smallest doc_id as canonical. One shuffle on the hash key —
    * the 100 TB-standard exact-dedup plan (hash-partition by digest). */
  val q36DedupExact: Q = (s, d) => {
    Tables.documents(s, d)
      .groupBy(TextFns.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("fp"))
  }

  /** Dedup summary: corpus size before/after exact dedup. */
  val q37DedupSummary: Q = (s, d) => {
    Tables.documents(s, d)
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(TextFns.fingerprint(col("text"))).as("n_unique"))
  }

  /** Engagement-metric extraction (C9, htmlConverter.py:31-32): the alt-text
    * markers inline `[Impressions]: 1234`-style counts into post text; this
    * pulls them back out as typed columns via regexp_extract. Marker text is
    * constructed from known columns so the oracle can run the identical
    * regex extraction in SQL. */
  val q55Engagement: Q = (s, d) => {
    val marked = concat(col("text"),
      lit(" [Impressions]: "), col("n_chars"),
      lit(" [Post Upvotes]: "), col("doc_id") % 1000)
    Tables.documents(s, d)
      .withColumn("marked", marked)
      .select(col("doc_id"),
        regexp_extract(col("marked"), "\\[Impressions\\]:\\s*(\\d+)", 1).cast("long").as("impressions"),
        regexp_extract(col("marked"), "\\[Post Upvotes\\]:\\s*(\\d+)", 1).cast("long").as("upvotes"))
      .orderBy(col("doc_id"))
  }

  /** TF-IDF keyword extraction: top-3 weighted terms per document (A7 at
    * document granularity — the per-doc twin of the topic pipeline's
    * c-TF-IDF report). One tokenize pass: the document-frequency table
    * derives FROM the tf table (df(term) = count of tf rows), so the corpus
    * is scanned once; the corpus size folds in as a broadcast 1-row
    * aggregate (the q04 pattern — no driver action at plan-build time). The
    * df side is vocabulary-sized and unbounded at 100 TB, so no broadcast
    * hint — AQE picks the join strategy from runtime sizes. */
  val q57Tfidf: Q = (s, d) => {
    val terms = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    // cache: tf feeds both the join left side and the df aggregation —
    // without the barrier the tokenize+explode+groupBy replays per branch
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).cache()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = Tables.documents(s, d).agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 4))
    // top-3 via the native bounded-heap operator (third production use
    // beyond q58/q87): map-side partial top-k thins the exchange to ≤3
    // rows per doc per partition, and no per-doc full term sort happens —
    // the rank window then runs over ≤3 rows per group, reusing the
    // operator's hash distribution (local sort only, no second exchange)
    val top = graft.plans.TopKPerGroup(scored, Seq("doc_id"),
      Seq(graft.plans.TopKPerGroup.Key("tfidf", desc = true),
        graft.plans.TopKPerGroup.Key("term")), 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    Caching.materializeAndRelease(
      top
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("rn"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rn")),
      tf)
  }

  /** BPE-style pre-tokenization counts next to whitespace counts (the
    * north-star token-counting pair): the GPT-2-shaped regex is RE2-safe so
    * the oracle runs the IDENTICAL pattern — certifying the tokenizer, not
    * just the count plumbing. */
  val q65BpeTokens: Q = (s, d) => {
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(TextFns.bpeTokens(col("text"))).as("n_bpe"),
        TextFns.tokenCount(col("text")).as("n_ws"))
      .orderBy(col("doc_id"))
  }

  /** q113: tokenizer economics per language — the fertility report that
    * drives multilingual tokenizer and mixture decisions (a language
    * whose BPE fertility runs high pays more compute per word and gets
    * under-represented at a fixed token budget; q107's temperature
    * rebalance consumes exactly this kind of table). Per language:
    * document count, whitespace words, BPE-ish tokens (the q65-certified
    * kernel), fertility = bpe/words, chars-per-token. One narrow kernel
    * scan + a partial-aggregated groupBy on a low-cardinality key — the
    * shuffle carries one row per language. */
  val q113TokEconomics: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"),
        size(TextFns.bpeTokens(col("text"))).as("n_bpe"),
        TextFns.tokenCount(col("text")).as("n_ws"),
        length(col("text")).as("n_chars_raw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("ws_tokens"),
        sum(col("n_bpe")).as("bpe_tokens"),
        round(sum(col("n_bpe")).cast("double") / sum(col("n_ws")), 4)
          .as("fertility"),
        round(sum(col("n_chars_raw")).cast("double") / sum(col("n_bpe")), 4)
          .as("chars_per_token"))
      .orderBy(col("lang"))

  /** Winnowing fingerprint profile (north-star rolling-hash document
    * fingerprinting): distinct winnowed fingerprints per document, plus the
    * first fingerprint as a value witness. The oracle recomputes the exact
    * md5 rolling-hash winnow in DuckDB list comprehensions — value-level
    * certification of the MOSS construction. */
  val q66Winnow: Q = (s, d) => {
    // cache: size() and array_min() both reference the fingerprint array,
    // and CollapseProject would otherwise re-run the md5 rolling-hash
    // kernel once PER REFERENCE (the q38/q40 signature-table pattern;
    // measured ~2x on this query). The cached column is doc_id + a small
    // string array — bounded by the winnowed print count, not the text.
    val prints = Tables.documents(s, d)
      .select(col("doc_id"),
        TextFns.winnowedFingerprints(col("text"), k = 8, w = 4).as("fp")) // priced by q220 (density rides 2/(w+1); w=4 ≈ 40% of prints)
      .cache()
    Caching.materializeAndRelease(
      prints
        .select(col("doc_id"),
          size(col("fp")).as("n_prints"),
          array_min(col("fp")).as("min_print"))
        .orderBy(col("doc_id")),
      prints)
  }

  /** Window sizes for the q220 winnow sweep (the certified q66 point is
    * w = 4). */
  private[ops] val SweepWinnowWs = Seq(2, 4, 8, 16)

  /** q220: the winnowing WINDOW sweep — the fingerprint-index size knob
    * priced in exact integers: per window size w, how many documents
    * fingerprint at all (a doc needs k+w−1 code points for one window),
    * the total print count (the per-doc shuffle payload a fingerprint
    * index ships), and the distinct print count (the index's key space).
    * Winnowing guarantees ~2/(w+1) selection density, so each doubling
    * of w roughly halves the index — this table measures where that
    * curve actually sits on our text, next to the q66-certified w = 4
    * point. No rounding anywhere: every cell is a BIGINT, so
    * certification is exact by construction. */
  val q220WinnowSweep: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text")).cache()
    // each w's print table feeds TWO aggs (totals + distinct); cache the
    // kernel output per w and release everything after materialization
    val perW = SweepWinnowWs.map { w =>
      val prints = docs.select(
        TextFns.winnowedFingerprints(col("text"), k = 8, w = w).as("fp"))
        .cache()
      val totals = prints.agg(
        sum((size(col("fp")) > 0).cast("long")).cast("long").as("n_docs"),
        sum(size(col("fp"))).cast("long").as("total_prints"))
      val distinctPrints = prints.select(explode(col("fp")).as("p"))
        .agg(count_distinct(col("p")).cast("long").as("distinct_prints"))
      (totals.crossJoin(broadcast(distinctPrints))
        .select(lit(w.toLong).as("w"), col("n_docs"), col("total_prints"),
          col("distinct_prints")), prints)
    }
    Caching.materializeAndRelease(
      perW.map(_._1).reduce(_ unionByName _).orderBy(col("w")),
      (docs +: perW.map(_._2)): _*)
  }

  /** Deterministic per-stratum hash sampling (the training-data MIXING
    * primitive: upsample rare sources, downsample bulk ones,
    * reproducibly). A row is kept iff the first 2 hex chars of
    * md5(doc_id) fall under its language's threshold — rates in 256ths,
    * no RNG state, stable across reruns/engines/cluster sizes, and a pure
    * codegen'd scan filter: at 100 TB sampling is a predicate, not a
    * shuffle. (Spark's native sample()/sampleBy() remain available; their
    * per-partition RNG is engine-specific, hence not oracle-checkable.) */
  val q67HashSample: Q = (s, d) => {
    // en: 128/256, de: 64/256, everything else: 25/256
    val h2 = substring(md5(col("doc_id").cast("string")), 1, 2)
    val threshold = when(col("lang") === "en", "80")
      .when(col("lang") === "de", "40")
      .otherwise("19")
    Tables.documents(s, d)
      .filter(h2 < threshold)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Repetition quality signals (the Gopher-rule family a pretraining
    * pipeline filters on): per document, the fraction of all token
    * occurrences taken by the single most frequent unigram/bigram, and the
    * fraction of trigram occurrences that are repeats. The statistic is
    * doc-LOCAL, so it is computed doc-locally: one JVM kernel pass per
    * document (a per-n hash-count map bounded by doc length) — no gram
    * explode, no shuffle at all before the final presentation sort. The
    * round-4 form exploded every gram occurrence into (doc_id, n, hash)
    * rows and re-assembled per-doc stats through two groupBys and a pivot:
    * three shuffles of a corpus-sized intermediate to recompute what each
    * map task already had in hand (measured 2.2 s → scan-bound at sf0.1).
    * At 100 TB this is the difference between a map-only pass and
    * shuffling ~3 rows per corpus token. Gram identity is 64-bit FNV-1a
    * over the token window, collision scope is a single document, and a
    * collision would miscount vs the string-exact oracle loudly. */
  val q68Repetition: Q = (s, d) => {
    // exact integer counts, not rounded ratios: arbitrary small-integer
    // ratios land on decimal half-boundaries where double rounding diverges
    // cross-engine (the round(avg,4) trap); consumers divide themselves.
    // Docs with < 3 tokens have no trigram tier and are excluded (the
    // oracle's inner join across the three tiers does the same).
    val statsKernel = udf { (s: String) =>
      if (s == null) None
      else {
        val toks = s.split(' ')
        if (toks.length < 3) None
        else {
          val tokHash = toks.map { t =>
            var h = 0xcbf29ce484222325L
            var c = 0
            while (c < t.length) { h ^= t.charAt(c); h *= 0x100000001b3L; c += 1 }
            h
          }
          def mix(a: Long, b: Long): Long = { var h = a ^ (b + 0x9e3779b97f4a7c15L); h *= 0x100000001b3L; h }
          // (top, tot, dup) for n-grams of the given order in one map pass
          def tier(n: Int): (Long, Long, Long) = {
            val m = new java.util.HashMap[java.lang.Long, Array[Long]]()
            var i = 0
            val lim = toks.length - (n - 1)
            while (i < lim) {
              var h = tokHash(i)
              var j = 1
              while (j < n) { h = mix(h, tokHash(i + j)); j += 1 }
              val slot = m.get(h)
              if (slot == null) m.put(h, Array(1L)) else slot(0) += 1L
              i += 1
            }
            var top = 0L
            val it = m.values().iterator()
            while (it.hasNext) { val c = it.next()(0); if (c > top) top = c }
            (top, lim.toLong, lim.toLong - m.size)
          }
          val (top1, tot1, _) = tier(1)
          val (top2, tot2, _) = tier(2)
          val (_, tot3, dup3) = tier(3)
          Some((top1, tot1, top2, tot2, dup3, tot3))
        }
      }
    }
    Tables.documents(s, d)
      .select(col("doc_id"), statsKernel(TextFns.normText(col("text"))).as("r"))
      .filter(col("r").isNotNull)
      .select(col("doc_id"),
        col("r._1").as("top1"), col("r._2").as("tot1"),
        col("r._3").as("top2"), col("r._4").as("tot2"),
        col("r._5").as("dup3"), col("r._6").as("tot3"))
      .orderBy(col("doc_id"))
  }

  /** Train/eval contamination check (the n-gram decontamination every
    * LLM-data pipeline runs before training): for each candidate training
    * document, how many of its distinct word 5-grams also occur in the
    * held-out set (here: doc_id < 50 stands in for the eval set). One
    * explode + one equi-join on the gram — the eval side is
    * distinct-reduced first, so the join input is the eval set's gram
    * VOCABULARY, not its corpus; AQE broadcasts it when genuinely small.
    * The join key is the 64-bit gram hash, not the string — the shuffle
    * ships 8 bytes per gram instead of the text (measured 2× on this
    * query; collisions are vanishing and the string-exact oracle would
    * catch one at test scale). */
  val q69Contamination: Q = (s, d) => {
    // distinct 5-gram hashes per doc, one JVM kernel pass (the shared
    // TextFns.distinctGramHashes kernel): FNV-1a runs over the token window
    // directly — no per-gram string join, no interpreted HOF slicing
    // (measured ~4× over the wordShingles expression form on this query).
    // Distinctness is by hash; a collision would merge two grams and the
    // string-exact oracle would catch the miscount.
    // cache: BOTH join branches (eval vocabulary + train side) derive from
    // the gram table — without the barrier the generation runs twice.
    // 16 bytes/row — the persisted gram-index pattern at scale.
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), // priced by q223 (order sweep: n=3 floods 430/450 flags, n=13 starves; 5 is the knee)
        explode(TextFns.distinctGramHashes(col("text"), 5)).as("gh"))
      .cache()
    val eval_ = sh.filter(col("doc_id") < 50).select(col("gh")).distinct()
    Caching.materializeAndRelease(
      sh.filter(col("doc_id") >= 50)
        .join(eval_.withColumn("hit", lit(1)), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .orderBy(col("doc_id")),
      sh)
  }

  /** Gram orders for the q223 sweep (the certified q69 point is n = 5). */
  private[ops] val SweepGramNs = Seq(3, 5, 8, 13)

  /** q223: the contamination-DETECTION n-gram order sweep — q69 flags
    * train/eval overlap at 5-grams; this prices the order: per n, how
    * many train docs get flagged at all, the overlapping-gram mass, and
    * the gram universe size. Short grams over-block (common phrases
    * count as contamination), long grams under-block (only verbatim
    * spans match) — q205 priced the SCRUB span length; this is the
    * matching curve for the DETECTOR, so the two knobs are read off the
    * same corpus. Each order runs the q69 kernel (hash-distinct grams,
    * one JVM pass; the string-exact oracle catches any collision);
    * every output cell is a BIGINT. Docs shorter than n tokens drop out
    * of that order's universe — mirrored by the oracle's length
    * guard. */
  val q223DecontamOrderSweep: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text")).cache()
    val perN = SweepGramNs.map { n =>
      val sh = docs
        .select(col("doc_id"), explode(TextFns.distinctGramHashes(col("text"), n)).as("gh"))
        .cache()
      val eval_ = sh.filter(col("doc_id") < 50).select(col("gh")).distinct()
      val row = sh.filter(col("doc_id") >= 50)
        .join(eval_.withColumn("hit", lit(1)), Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum((col("n_overlap") > 0).cast("long")).cast("long").as("n_flagged"),
          sum(col("n_overlap")).cast("long").as("total_overlap"),
          sum(col("n_grams")).cast("long").as("total_grams"))
        .select(lit(n.toLong).as("n"), col("n_docs"), col("n_flagged"),
          col("total_overlap"), col("total_grams"))
      (row, sh)
    }
    Caching.materializeAndRelease(
      perN.map(_._1).reduce(_ unionByName _).orderBy(col("n")),
      (docs +: perN.map(_._2)): _*)
  }

  /** URL / email scrubbing (the PII-redaction pass a pretraining pipeline
    * applies): count and redact with sentinel tokens. Markers are
    * constructed from known columns (the q55 pattern) so the oracle can
    * verify the redaction byte-for-byte; patterns avoid lookaround so
    * DuckDB's RE2 runs them identically. Pure codegen'd regexp scan. */
  val q71Scrub: Q = (s, d) => {
    val UrlRe = """https?://[^\s]+"""
    val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val marked = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or"),
      lit(" https://example.com/p/"), col("doc_id"), lit(" now"))
    Tables.documents(s, d)
      .withColumn("marked", marked)
      .select(col("doc_id"),
        size(regexp_extract_all(col("marked"), lit(UrlRe), lit(0))).as("n_urls"),
        size(regexp_extract_all(col("marked"), lit(EmailRe), lit(0))).as("n_emails"),
        md5(regexp_replace(regexp_replace(col("marked"), UrlRe, "<URL>"),
          EmailRe, "<EMAIL>")).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  /** Token budget report (the first question of any pretraining data
    * effort: how many tokens, by source and language, with subtotals).
    * Rollup grouping sets in one shuffle; token counting is the codegen'd
    * scan expression. */
  val q73TokenBudget: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("n_tokens", TextFns.tokenCount(col("text")).cast("long"))
      .rollup(col("source"), col("lang"))
      .agg(sum(col("n_tokens")).as("tokens"), count(lit(1)).as("docs"))
      .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
  }

  /** Context-window chunking (the sliding-window split that turns documents
    * into training sequences): 64-token chunks on a 48-token stride (16
    * tokens of overlap), each chunk witnessed by its md5. Pure narrow ops —
    * sequence → explode → slice — no UDF, no shuffle before the final sort:
    * at 100 TB this is a scan-shaped map with output ~1.3× input tokens.
    * Chunk grid and slicing are 1-based on the normalized token array so
    * the DuckDB oracle reproduces chunks byte-for-byte. */
  val q75Chunk: Q = (s, d) => {
    val toks = TextFns.tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("toks")), lit(48))).as("chunk_start"),
        col("toks"))
      .select(col("doc_id"), col("chunk_start"),
        slice(col("toks"), col("chunk_start"), lit(64)).as("chunk"))
      .select(col("doc_id"), col("chunk_start"),
        size(col("chunk")).as("chunk_toks"),
        md5(array_join(col("chunk"), " ")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_start"))
  }

  /** Greedy sequence packing by token budget (the data-mixing step that
    * bins documents into fixed-budget training sequences): within each
    * source, documents in deterministic doc_id order are packed into
    * 512-token bins by cumulative count — bin = prior-cumsum div budget.
    * ONE shuffle (the per-source window); the window is PARTITIONED, so no
    * global serialization point — each source packs in parallel, the
    * sharding unit a real pipeline would use. Exact integer outputs. */
  /** The greedy streaming packer's running token count: per-source
    * cumulative sum in doc_id order — ONE definition shared by q76 (the
    * packing itself) and q114 (the efficiency report), so a packer change
    * can never silently desynchronize the report from the packing. */
  private def packCum: org.apache.spark.sql.Column =
    sum(col("n_tokens")).over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** Bin id at `sz` given the cumulative count: a doc starts in the bin
    * its preceding tokens fill. The twin of [[duckPackBin]]. */
  private def packBin(sz: Long): org.apache.spark.sql.Column =
    ((col("cum") - col("n_tokens")) / lit(sz)).cast("long")

  /** The oracle's form of the same packer (q76/q114 share it too). */
  private def duckPackBin(sz: Long): String =
    s"""(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // $sz""".stripMargin

  val q76Pack: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("n_tokens", TextFns.tokenCount(col("text")).cast("long"))
      .withColumn("cum", packCum)
      .withColumn("bin", packBin(512L))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  /** q114: packing-efficiency report — the knob-tuning table for q76's
    * bin size: for each candidate sequence length, how many bins the
    * greedy streaming packer produces and the fill rate relative to
    * ideal (tokens / (bins × size); > 1 means docs overflow their bin
    * and would truncate or spill, < 1 means tail padding waste). A
    * training pipeline reads this once per corpus to pick its sequence
    * length; computing it is three window passes over ONE cached
    * (source, doc_id, n_tokens) projection — token counting, the
    * expensive part, happens once. */
  val q114PackEfficiency: Q = (s, d) => {
    // the cached projection carries the CUMULATIVE count (packCum), so
    // the per-source window sort is paid ONCE and each per-size pass is a
    // pure map over it — token counting AND the sort, the expensive
    // parts, happen once (not once per candidate size)
    val toks = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum", packCum)
      .cache()
    val per = Seq(256L, 512L, 1024L).map { sz =>
      toks
        .withColumn("bin", packBin(sz))
        .groupBy(col("source"), col("bin"))
        .agg(sum(col("n_tokens")).as("bin_tokens"))
        .agg(lit(sz).as("bin_size"),
          count(lit(1)).as("n_bins"),
          sum(col("bin_tokens")).as("tokens"),
          round(sum(col("bin_tokens")).cast("double") / (count(lit(1)) * lit(sz)), 4)
            .as("fill_rate"))
    }
    Caching.materializeAndRelease(
      per.reduce(_ unionByName _).orderBy(col("bin_size")), toks)
  }

  /** Out-of-vocabulary rate against the corpus-global top-K token
    * vocabulary (K=16 here: the synthetic corpus draws from ~31 distinct
    * tokens, so a smaller K keeps real OOV mass; production uses 10^3-10^5
    * and the plan is unchanged) (the unigram-LM quality signal in integer form: a doc full
    * of rare tokens is noise; log-prob variants differ only by the final
    * per-token weight, and integers are cross-engine hash-exact where
    * summed logs are not). Two passes over one cached token table: (1)
    * partial-agg token counts → global top-k via orderBy+limit (planned as
    * TakeOrdered — no full sort shuffle), deterministically tie-broken;
    * (2) per-doc LEFT join against the BROADCAST K-row vocabulary.
    * At 100 TB the vocabulary is still K rows — the broadcast is
    * size-bounded by construction, not by luck. */
  val q77OovRate: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("tok"))
      .cache()
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(16)
      .select(col("tok"), lit(1).as("iv"))
    Caching.materializeAndRelease(
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("iv").isNull, 1).otherwise(0)).cast("long").as("n_oov"))
        .orderBy(col("doc_id")),
      toks)
  }

  /** q110: frequent-n-gram boilerplate scrub (the RefinedWeb/CCNet-style
    * template-removal pass a web-scale corpus needs BEFORE dedup and
    * quality scoring): a word trigram occurring in ≥ 1% of documents is
    * template text (navigation, banners, licence footers — content no
    * model should memorize per-copy), and every token position covered by
    * a boilerplate-trigram occurrence is dropped from the document.
    *
    * Scale shape: one gram pass (narrow posexplode), ONE shuffle for the
    * document-frequency aggregation, and the boilerplate set joins back
    * BROADCAST — its size is bounded by construction: at doc-frequency
    * fraction f, at most (avg grams per doc)/f grams can qualify
    * (Σ df ≤ total occurrences), independent of corpus size. Coverage is
    * a per-doc collect_set of dropped positions (bounded by doc length)
    * and reassembly is the index-aware `filter` HOF — no window, no
    * second wide join. The relative threshold (df·100 ≥ N, integer math,
    * cross-engine exact) keeps the same semantics at every corpus size. */
  val q110Boilerplate: Q = (s, d) =>
    boilerplateScrubOf(Tables.documents(s, d))

  /** q133: in-document repetition scrub — collapse every run of
    * consecutive identical tokens to a single occurrence and report the
    * longest run. This is the REMEDIATION for the pathology q68 measures
    * (q68 scores duplicate n-gram mass; Gopher-style gates drop on it —
    * this pass repairs instead of dropping, the "scrub" tier of the same
    * policy, complementing q110's corpus-level template scrub with a
    * purely document-local one).
    *
    * Scale shape: a map-ONLY pass — built-in array HOFs (`filter` with the
    * index lambda, `aggregate` carrying (prev, run, best)), no UDF, no
    * shuffle except the presentation sort. A token survives iff it differs
    * from its predecessor, so the output is order-preserving and
    * idempotent. At 100 TB this runs at scan speed and composes with any
    * gate (`max_run` is the drop-threshold signal a repetition gate keys
    * on). */
  val q133RunCollapse: Q = (s, d) =>
    runCollapseOf(Tables.documents(s, d))

  /** The q133 kernel over an arbitrary (doc_id, text, ...) frame — shared
    * with the planted-runs unit. */
  private[graft] def runCollapseOf(input: DataFrame): DataFrame =
    runCollapseKernel(input).orderBy(col("doc_id"))

  /** The kernel WITHOUT the presentation sort: a stateless narrow map,
    * legal as-is inside a streaming micro-batch — the streaming twin
    * ([[graft.streaming.Incremental.continuousRunCollapse]]) runs this
    * very Column tree, so stream and batch cannot drift (no JVM re-twin
    * to keep in sync). */
  private[graft] def runCollapseKernel(input: DataFrame): DataFrame =
    input
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      // keep position 0 and every token that breaks its predecessor's run
      .withColumn("clean",
        expr("filter(toks, (t, i) -> i = 0 OR t != toks[i - 1])"))
      // longest run via one fold: (prev token, current run, best run)
      .withColumn("max_run", expr(
        """aggregate(toks,
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          |  (acc, t) -> named_struct(
          |    'prev', t,
          |    'run',  IF(t <=> acc.prev, acc.run + 1, 1),
          |    'best', greatest(acc.best, IF(t <=> acc.prev, acc.run + 1, 1))),
          |  acc -> acc.best)""".stripMargin))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        (size(col("toks")) - size(col("clean"))).cast("long").as("n_collapsed"),
        col("max_run").cast("long").as("max_run"),
        concat_ws(" ", col("clean")).as("clean_text"))

  /** q143: effective token YIELD — what the text-reduction cascade
    * actually buys, token-weighted per source: raw tokens → after the
    * in-doc run collapse (q133) → after the corpus boilerplate scrub
    * (q110, fit on the COLLAPSED corpus — cascade order is part of the
    * semantics) → the final yield counting only exact-dedup canonical
    * survivors (q36's fingerprint on the fully-scrubbed text, so
    * scrub-induced convergence collapses too). q127 accounts DOCUMENTS
    * per gate; this accounts the TOKENS a trainer will actually see —
    * the number a mixture planner (q121/q137) should budget against,
    * not raw corpus size. Composes three certified kernels unchanged;
    * the oracle recomputes the whole cascade relationally. */
  val q143TokenYield: Q = (s, d) =>
    tokenYieldOf(Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text")))

  /** The q143 kernel over an arbitrary (doc_id, source, text) frame —
    * shared by the certified query and the capstone pipeline's run
    * report ([[graft.pipelines.TrainingData]]), so the tokens a mixture
    * planner budgets against are computed by the same certified
    * cascade. */
  private[graft] def tokenYieldOf(docs: DataFrame): DataFrame = {
    // cache: the collapse kernel (per-doc run-fold HOF, the cascade's
    // most expensive narrow pass) feeds BOTH the scrub stage and the
    // final per-source join — uncached, the self-join re-ran it (r21)
    val collapsed = runCollapseKernel(docs)
      .select(col("doc_id"), col("n_toks").as("n_raw"),
        (col("n_toks") - col("n_collapsed")).as("n_coll"), col("clean_text"))
      .cache()
    val scrubbed = boilerplateScrubOf(
        collapsed.select(col("doc_id"), col("clean_text").as("text")))
      .select(col("doc_id"),
        (col("n_tokens") - col("n_dropped")).as("n_scrub"),
        TextFns.fingerprint(col("clean_text")).as("fp"))
    val canon = scrubbed.groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
    Caching.materializeAndRelease(
      docs.select(col("doc_id"), col("source"))
        .join(collapsed.select(col("doc_id"), col("n_raw"), col("n_coll")), Seq("doc_id"))
        .join(scrubbed.join(canon, Seq("fp"))
          .select(col("doc_id"), col("n_scrub"),
            (col("doc_id") === col("keep_id")).as("is_canon")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(sum(col("n_raw")).cast("long").as("n_raw"),
          sum(col("n_coll")).cast("long").as("n_collapsed"),
          sum(col("n_scrub")).cast("long").as("n_scrubbed"),
          sum(when(col("is_canon"), col("n_scrub")).otherwise(lit(0L)))
            .cast("long").as("n_yield"))
        .orderBy(col("source")),
      collapsed)
  }

  /** Positioned trigram rows of a tokenized corpus — shared by the scrub
    * and the gram-set export. */
  private def gramRowsOf(docs: DataFrame): DataFrame =
    docs.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .as(Seq("pos", "gram")))

  /** The qualifying boilerplate grams (df·100 ≥ N, integer math). */
  private def boilerOf(grams: DataFrame, nDocs: Long): DataFrame =
    grams.select(col("gram"), col("doc_id")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") * 100 >= lit(nDocs))
      .select(col("gram"))

  /** The corpus's boilerplate gram SET alone (gram: string) — the fit a
    * batch pass exports so the streaming twin
    * ([[graft.streaming.Incremental.continuousBoilerplateScrub]]) can
    * scrub incoming documents map-side under a FROZEN set (the DSIR
    * frozen-model discipline: per-copy template frequency is a
    * corpus-global statistic, so the stream serves a batch fit). */
  private[graft] def boilerplateGramsOf(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks")).cache()
    val nDocs = docs.count()
    Caching.materializeAndRelease(boilerOf(gramRowsOf(docs), nDocs), docs)
  }

  /** The q110 kernel over an arbitrary (doc_id, text, ...) frame — shared
    * by the table-reading query and the planted-template unit. */
  private[graft] def boilerplateScrubOf(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks")).cache()
    val nDocs = docs.count()
    val grams = gramRowsOf(docs)
    val boiler = boilerOf(grams, nDocs)
    val cov = grams.join(broadcast(boiler), Seq("gram"))
      .select(col("doc_id"),
        explode(array(col("pos"), col("pos") + 1, col("pos") + 2)).as("cp"))
      .groupBy(col("doc_id")).agg(collect_set(col("cp")).as("cov"))
    Caching.materializeAndRelease(
      docs.join(cov, Seq("doc_id"), "left")
        .withColumn("cov", coalesce(col("cov"), typedLit(Array.empty[Int])))
        .withColumn("clean",
          filter(col("toks"), (_, i) => !array_contains(col("cov"), i)))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          (size(col("toks")) - size(col("clean"))).cast("long").as("n_dropped"),
          concat_ws(" ", col("clean")).as("clean_text"))
        .orderBy(col("doc_id")),
      docs)
  }

  /** q129: BPE-training pair statistics — the round-1 merge table of the
    * distributed tokenizer trainer ([[graft.ml.BpeTrain]]): adjacent
    * CHARACTER pairs across the vocabulary, weighted by word frequency,
    * top-20 by weight with pair tiebreak (the trainer's deterministic
    * argmax ordering). Shares the trainer's word-count kernel, so the
    * certified statistics are exactly what `fit` consumes; BpeTrainSpec
    * pins fit()'s first merge to this table's head row. One corpus
    * tokenize pass → vocabulary-sized pair aggregation (Zipf-bounded —
    * the corpus-size-independent shape that makes tokenizer training
    * cheap at 100 TB). */
  /** The round-1 pair table over a (w, n) word-count frame, shared by
    * q129 (the statistics report) and q130 (which merges the head pair). */
  private def bpeRound1Pairs(wc: DataFrame): DataFrame =
    wc
      // single-char words have no pairs — and must be EXCLUDED before the
      // index sequence: Spark's sequence(1, 0) DESCENDS (two rows, one a
      // phantom substr) where the oracle's range(1, 1) is empty
      .filter(length(col("w")) > 1)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"),
        col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).cast("long").as("weight"))

  val q129BpePairs: Q = (s, d) =>
    bpeRound1Pairs(graft.ml.BpeTrain.wordCounts(Tables.documents(s, d)))
      .orderBy(col("weight").desc, col("pair"))
      .limit(20)

  /** q130: first-merge compression report — the effect of applying the
    * trainer's FIRST learned merge (q129's head pair) across the
    * vocabulary: words touched, merge occurrences (weighted by word
    * frequency — each occurrence saves one symbol), total characters
    * before, total symbols after. This certifies the trainer's merge
    * KERNEL ([[graft.ml.BpeTrain]] `applyMerge`) cross-engine: the
    * oracle recomputes the same greedy left-to-right pass with plain
    * `replace` — on round-1 (single-character symbols) non-overlapping
    * string replacement IS the greedy pair merge, so the two
    * implementations must agree occurrence-for-occurrence. One
    * vocab-sized pass plus a one-row argmax collect (the trainer's own
    * round shape). */
  val q130MergeCompression: Q = (s, d) => {
    val wc = graft.ml.BpeTrain.wordCounts(Tables.documents(s, d))
      .filter(length(col("w")) > 1)
      .cache() // argmax AND stats read it — one corpus tokenize pass
    val top = bpeRound1Pairs(wc)
      .orderBy(col("weight").desc, col("pair")).limit(1).collect()(0).getString(0)
    // split by CODEPOINT: the pair was built with SQL substr (codepoint
    // semantics), so a supplementary-plane head char spans two UTF-16
    // units — substring(0, 1) would hand the kernel a broken surrogate
    val headLen = Character.charCount(top.codePointAt(0))
    val (a, b) = (top.substring(0, headLen), top.substring(headLen))
    val occ = length(col("w")) -
      size(graft.ml.BpeTrain.applyMergeUdf(expr("filter(split(w, ''), s -> s <> '')"),
        lit(a), lit(b)))
    Caching.materializeAndRelease(
      wc.select(col("n"), length(col("w")).cast("long").as("len"), occ.cast("long").as("occ"))
        .agg(
          first(lit(top)).as("pair"),
          sum(when(col("occ") > 0, 1L).otherwise(0L)).cast("long").as("words_hit"),
          sum(col("n") * col("occ")).cast("long").as("occurrences"),
          sum(col("n") * col("len")).cast("long").as("chars_before"),
          (sum(col("n") * col("len")) - sum(col("n") * col("occ"))).cast("long").as("symbols_after")),
      wc)
  }

  /** q145 trains this many merges — far past the round-1 tier q129/q130
    * certify (multi-character symbols appear within a few rounds on any
    * natural corpus), small enough that the driver loop stays a few
    * vocab-sized aggregations. */
  private[graft] val Q145Merges = 8

  /** Session memo for the fitted merge list: q145/q146/q152 and the
    * support writer (and a Bench re-pass) share one deterministic fit.
    * Routed through [[SessionArtifacts]] — NOT a bare TrieMap — so the
    * key carries the Spark applicationId (a long-lived JVM that
    * regenerates the dataset at the same path gets a fresh fit in its
    * new session) and the Holder guarantees the expensive multi-round
    * fit runs at most once even under concurrent first callers. */
  private[graft] def bpeMergesOf(s: SparkSession, d: String): Seq[(String, String)] = {
    val p = SessionArtifacts.dir("bpemerges", s, d) { t =>
      import s.implicits._
      graft.ml.BpeTrain.fit(Tables.documents(s, d), Q145Merges).zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("merge_no", "a", "b")
        .coalesce(1).write.mode("overwrite").parquet(s"$t/merges")
    }
    s.read.parquet(s"$p/merges").orderBy(col("merge_no"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** q145: the FULL trained tokenizer, certified — fit the distributed
    * BPE trainer ([[graft.ml.BpeTrain]]) for [[Q145Merges]] rounds, then
    * segment the entire vocabulary with the learned merge list. q129/q130
    * certify round 1; here DuckDB REPLAYS every round: the merge list is
    * exported as oracle support and the oracle folds it over each word
    * with a recursive CTE on a separator-framed symbol string (symbols
    * joined by a doubled chr(31) frame; a merge rewrites
    * `␟a␟␟b␟ → ␟ab␟`, which equals the greedy left-to-right merge scan —
    * the frame anchors both symbol boundaries, so a symbol whose text
    * merely CONTAINS a's text as a suffix, or b's as a prefix, cannot
    * false-match, and single-pass replace's no-rescan-of-output matches
    * the kernel's no-re-pair rule; consecutive disjoint occurrences each
    * keep a full frame because the rewrite consumes one ␟ of each
    * boundary pair and restores it). [[graft.ml.BpeTrain]].wordCounts
    * strips control characters, so chr(31) cannot occur inside a symbol
    * and the framing is collision-free. Scale shape: one corpus tokenize
    * pass, then everything — training rounds AND the final segmentation —
    * is vocabulary-sized (Zipf-bounded). */
  val q145BpeSegment: Q = (s, d) => {
    val merges = bpeMergesOf(s, d)
    val segUdf = udf { (w: String) =>
      graft.ml.BpeTrain.segment(w, merges).mkString(" ")
    }
    graft.ml.BpeTrain.wordCounts(Tables.documents(s, d))
      .select(col("w"), col("n").cast("long").as("n"),
        segUdf(col("w")).as("segmented"))
      .withColumn("n_syms", size(split(col("segmented"), " ")).cast("long"))
      .orderBy(col("w"))
  }

  /** q167: greedy longest-match segmentation — the OTHER production
    * tokenizer-inference family (WordPiece's MaxMatch rule, Wu et al.
    * 2016) run against the vocabulary the q145 BPE training induces:
    * every corpus codepoint plus each learned merge's symbol. BPE
    * inference replays merge ORDER; MaxMatch ignores order and greedily
    * takes the longest vocab prefix at each position — the two disagree
    * exactly where merge priority beats greed (e.g. merges learned
    * `ab` then `bc`: BPE segments "abc" as `ab c`, MaxMatch agrees; but
    * vocab {ab, abc…}: MaxMatch grabs the longest regardless of when it
    * was learned). Shipping both lets a pipeline measure how much the
    * cheaper order-free inference costs in fidelity before swapping it
    * in at serve time. Oracle: DuckDB rebuilds the same vocab and walks
    * each word with a recursive longest-prefix CTE (per-position best
    * match precomputed with max_by — unique because two equal-length
    * matches at one position are the same string).
    *
    * Scale shape: one corpus tokenize pass into the Zipf-bounded word
    * counts; the vocab is charset + merges (collected: charset-bounded,
    * a few hundred rows); segmentation is a vocab-sized UDF apply.
    * Nothing corpus-quadratic; no windows. */
  val q167MaxmatchSegment: Q = (s, d) => {
    val merges = bpeMergesOf(s, d)
    val wc = graft.ml.BpeTrain.wordCounts(Tables.documents(s, d)).cache()
    // corpus charset: split('') is codepoint-safe (the q159 probe), and
    // the collect is alphabet-bounded — NOT vocab- or corpus-sized
    val singles = wc.select(explode(split(col("w"), "")).as("c"))
      .distinct().collect().map(_.getString(0))
    val vocab = singles.toSet ++ merges.map { case (a, b) => a + b }
    val maxLen = vocab.iterator
      .map(v => graft.ml.BpeTrain.codePointSyms(v).length).max
    val segUdf = udf { (w: String) =>
      graft.ml.BpeTrain.maxMatch(w, vocab, maxLen).mkString(" ")
    }
    Caching.materializeAndRelease(
      wc.select(col("w"), col("n").cast("long").as("n"),
          segUdf(col("w")).as("segmented"))
        .withColumn("n_syms", size(split(col("segmented"), " ")).cast("long"))
        .orderBy(col("w")),
      wc)
  }

  /** q146: tokenizer FERTILITY by source — pieces per word token under
    * the q145-trained tokenizer, the metric that tells a pipeline which
    * domains its tokenizer serves poorly (a source with fertility 2×
    * the corpus mean pays 2× the sequence length for the same text —
    * exactly what a vocab retrain or a mixture re-weight should see).
    * Composes two certified kernels: the q145 segmentation (vocab-sized
    * UDF apply over the learned merges) broadcast-joined onto per-
    * (source, word) token counts (one corpus pass, map-side combined),
    * then one aggregation per source. Scale shape: corpus pass +
    * vocab-sized apply + source-sized output; nothing quadratic, no
    * windows. */
  val q146TokFertility: Q = (s, d) => {
    val merges = bpeMergesOf(s, d)
    val nSymsUdf = udf { (w: String) =>
      graft.ml.BpeTrain.segment(w, merges).length.toLong
    }
    val sourceWords = Tables.documents(s, d)
      .select(col("source"), explode(TextFns.tokens(col("text"))).as("w0"))
      .select(col("source"), regexp_replace(col("w0"), "[\\x00-\\x1f]", "").as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("n"))
      .cache()
    // the vocabulary IS the distinct words of the per-(source, word)
    // counts already in hand — deriving it there keeps the query at ONE
    // corpus tokenize pass (a second wordCounts scan would double the
    // dominant cost for an identical word set)
    val vocabSyms = sourceWords.select(col("w")).distinct()
      .select(col("w"), nSymsUdf(col("w")).as("n_syms"))
    Caching.materializeAndRelease(
      sourceWords.join(broadcast(vocabSyms), Seq("w"))
        .groupBy(col("source"))
        .agg(sum(col("n")).cast("long").as("n_tokens"),
          sum(col("n") * col("n_syms")).cast("long").as("n_pieces"))
        .select(col("source"), col("n_tokens"), col("n_pieces"),
          round(col("n_pieces") / col("n_tokens"), 4).as("fertility"))
        .orderBy(col("source")),
      sourceWords)
  }

  /** The q145 training replay as oracle CTE text ending in
    * wc(w, n) / m(merge_no, a, b) / fin(w, segmented) — shared by the
    * q145 certification and q146's fertility aggregation. */
  private val bpeReplayCtes =
    """wc AS (
      |  SELECT w, count(*) AS n FROM (
      |    SELECT regexp_replace(w0, '[\x00-\x1f]', '', 'g') AS w FROM (
      |      SELECT unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS w0
      |      FROM documents))
      |  WHERE length(w) > 0 GROUP BY 1),
      |m AS (SELECT merge_no, a, b
      |      FROM read_parquet('{GRAFT_OUT}_support/q145_support_merges/*.parquet')),
      |seg(w, i, r) AS (
      |  SELECT w, 0,
      |    chr(31) || chr(31) || regexp_replace(w, '(.)', '\1' || chr(31) || chr(31), 'g')
      |  FROM wc
      |  UNION ALL
      |  SELECT s.w, s.i + 1,
      |    replace(s.r,
      |      chr(31) || m.a || chr(31) || chr(31) || m.b || chr(31),
      |      chr(31) || m.a || m.b || chr(31))
      |  FROM seg s JOIN m ON m.merge_no = s.i + 1),
      |fin AS (
      |  SELECT w, trim(replace(r, chr(31) || chr(31), ' ')) AS segmented
      |  FROM seg WHERE i = (SELECT count(*) FROM m))""".stripMargin

  /** q152: the BPE COMPRESSION CURVE — total corpus symbol count after
    * each merge round (round 0 = characters), token-weighted over the
    * vocabulary: the marginal value of every learned merge, the table a
    * tokenizer-budget decision reads (where the curve flattens, stop
    * paying for vocab). ONE vocab-sized pass computes the whole curve
    * (the fold UDF applies the merge list incrementally and emits all
    * round sizes at once — no per-round jobs); the oracle reads the SAME
    * per-round states the q145 replay already materializes (`seg` at
    * every i), so the certification covers every INTERMEDIATE state of
    * the trainer, not just the final segmentation. */
  val q152MergeCurve: Q = (s, d) => {
    val merges = bpeMergesOf(s, d)
    val sizesUdf = udf { (w: String) =>
      // code-point init (BpeTrain.codePointSyms): String.split("") would
      // shear supplementary-plane characters into lone surrogates
      var syms: Seq[String] = graft.ml.BpeTrain.codePointSyms(w)
      val out = scala.collection.mutable.ArrayBuffer[Int](syms.length)
      merges.foreach { case (a, b) =>
        syms = graft.ml.BpeTrain.applyMerge(syms, a, b)
        out += syms.length
      }
      out.toSeq
    }
    graft.ml.BpeTrain.wordCounts(Tables.documents(s, d))
      .select(col("n"), posexplode(sizesUdf(col("w"))).as(Seq("merge_no", "n_syms")))
      .groupBy(col("merge_no").cast("long").as("merge_no"))
      .agg(sum(col("n") * col("n_syms")).cast("long").as("total_symbols"))
      .orderBy(col("merge_no"))
  }

  /** Oracle support for q145: the learned merge list (merge_no 1-based,
    * a, b) — what the recursive replay folds over. */
  def writeBpeSupport(s: SparkSession, d: String, outDir: String): Unit = {
    import s.implicits._
    bpeMergesOf(s, d).zipWithIndex
      .map { case ((a, b), i) => (i + 1L, a, b) }
      .toDF("merge_no", "a", "b")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${graft.Verify.supportDir(outDir)}/q145_support_merges")
  }

  /** The non-ASCII certification fixture (r13 verdict #3) — one row per
    * divergence class the ASCII corpus contract hides: 2-byte accents,
    * 3-byte CJK, 4-byte supplementary-plane (math alphanumerics, emoji —
    * surrogate PAIRS in the JVM, the UTF-16 shear class), NFD-vs-NFC
    * combining marks (the kernels do NOT normalize: the two spellings
    * stay distinct, pinned here), and a fingerprint-equal duplicate.
    * ONE Scala constant feeds BOTH the Spark frame and the oracle's
    * VALUES list, so engine and oracle can never disagree on the bytes. */
  private[graft] val UnicodeFixture: Seq[(Long, String)] = Seq(
    (1L, "café naïve résumé déjà-vu"),
    (2L, "日本語 の テキスト 分析"),
    (3L, "😀😀😀 𝕋𝕖𝕩𝕥 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 😀"),
    (4L, "é vs é composed"),
    (5L, "año 2024 год 𝛼𝛽𝛾 café"),
    (6L, "café naïve résumé déjà-vu"))

  /** The two literal merges the q159 BPE-segment leg applies: a Latin
    * pair and a supplementary-plane pair (the greedy no-re-pair scan on
    * 😀😀😀 must yield [😀😀, 😀]). */
  private[graft] val UnicodeMerges: Seq[(String, String)] =
    Seq(("c", "a"), ("😀", "😀"))

  /** q159: the NON-ASCII kernel contract, oracle-certified — drives
    * tokenize → char shingles → BPE pre-tokens → BPE segment (code-point
    * init + the shared greedy merge kernel) → word-gram sets → winnow
    * fingerprints → dedup fingerprint over [[UnicodeFixture]] PLUS a
    * corpus slice rewritten with multibyte substitutions (e→é, o→😀 on
    * doc_id < 10), reconciling Spark's string kernels with DuckDB's
    * codepoint semantics at the kernel level (the q130 fix pattern,
    * applied surface-wide — this query is what caught the
    * `String.split("")` surrogate shear in BpeTrain.segment).
    * Counts are integers, strings exact; no floats anywhere. */
  val q159UnicodeKernels: Q = (s, d) => {
    import s.implicits._
    val fixture = UnicodeFixture.toDF("fid", "txt")
    val slice = Tables.documents(s, d).filter(col("doc_id") < 10)
      .select((col("doc_id") + 100).as("fid"),
        regexp_replace(regexp_replace(col("text"), "e", "é"), "o", "😀").as("txt"))
    val segUdf = udf { (w: String) =>
      graft.ml.BpeTrain.segment(w, UnicodeMerges).mkString(" ")
    }
    val norm = graft.functions.TextFns.normText(col("txt"))
    fixture.unionByName(slice).select(col("fid"),
        TextFns.tokenCount(col("txt")).cast("long").as("n_toks"),
        length(norm).cast("long").as("n_chars"),
        TextFns.fingerprint(col("txt")).as("fp"),
        element_at(TextFns.charShingles(col("txt"), 3), 1).as("sh3"),
        size(TextFns.charShingles(col("txt"), 3)).cast("long").as("n_sh3"),
        size(TextFns.bpeTokens(col("txt"))).cast("long").as("n_bpe"),
        element_at(TextFns.bpeTokens(col("txt")), 1).as("first_bpe"),
        size(TextFns.distinctGramHashes(col("txt"), 2)).cast("long").as("n_g2"),
        segUdf(element_at(TextFns.tokens(col("txt")), 1)).as("seg1"),
        size(TextFns.winnowedFingerprints(col("txt"), 3, 2)).cast("long").as("n_winnow"))
      .orderBy(col("fid"))
  }

  /** q162: Shannon-ENTROPY quality signals — the distributional
    * repetitiveness detectors the rule gate's surface ratios can't see
    * (M9 family, alongside q34/q97/q85/q147): per document, the
    * character-level entropy of the normalized text (a low value means
    * few symbols dominate — aaaa-style degenerate content) and the
    * token-level entropy (low = the same words over and over, even when
    * each word is long and the mean-word-length gate passes). Exact
    * integer counts into one ln/division fold per doc (the q85
    * arithmetic discipline, round 4); char splitting is per CODE POINT
    * on both engines (the q159-certified contract). One corpus pass per
    * granularity, map-side combined, no windows, no driver data. */
  val q162Entropy: Q = (s, d) => entropySignals(Tables.documents(s, d))

  /** The q162 kernel over an arbitrary (doc_id, text) frame — shared
    * with the discriminative unit (degenerate/repetitive fixtures). */
  private[graft] def entropySignals(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val norm = TextFns.normText(col("text"))
    def entropyOf(unit: org.apache.spark.sql.Column) = {
      val counts = docs
        .select(col("doc_id"), explode(unit).as("u"))
        .groupBy(col("doc_id"), col("u")).agg(count(lit(1)).as("k"))
      val tot = counts.groupBy(col("doc_id")).agg(sum(col("k")).as("n"))
      counts.join(tot, Seq("doc_id"))
        .groupBy(col("doc_id"))
        .agg(first(col("n")).cast("long").as("n"),
          round(-sum((col("k") / col("n")) * log(col("k") / col("n"))), 4)
            .as("h"))
    }
    val ch = entropyOf(split(norm, ""))
      .select(col("doc_id"), col("n").as("n_chars"), col("h").as("char_entropy"))
    val tk = entropyOf(TextFns.tokens(col("text")))
      .select(col("doc_id"), col("n").as("n_toks"), col("h").as("tok_entropy"))
    ch.join(tk, Seq("doc_id")).orderBy(col("doc_id"))
  }

  def queries: Map[String, Q] = Map(
    "q162_entropy" -> q162Entropy,
    "q159_unicode_kernels" -> q159UnicodeKernels,
    "q129_bpe_pairs"    -> q129BpePairs,
    "q130_merge_compression" -> q130MergeCompression,
    "q145_bpe_segment"  -> q145BpeSegment,
    "q146_tok_fertility" -> q146TokFertility,
    "q167_maxmatch_segment" -> q167MaxmatchSegment,
    "q152_merge_curve"  -> q152MergeCurve,
    "q110_boilerplate"  -> q110Boilerplate,
    "q133_run_collapse" -> q133RunCollapse,
    "q143_token_yield"  -> q143TokenYield,
    "q30_html_extract"  -> q30HtmlExtract,
    "q75_chunk"         -> q75Chunk,
    "q76_pack"          -> q76Pack,
    "q77_oov_rate"      -> q77OovRate,
    "q68_repetition"    -> q68Repetition,
    "q69_contamination" -> q69Contamination,
    "q223_decontam_order_sweep" -> q223DecontamOrderSweep,
    "q71_scrub"         -> q71Scrub,
    "q73_token_budget"  -> q73TokenBudget,
    "q65_bpe_tokens"    -> q65BpeTokens,
    "q113_tok_econ"     -> q113TokEconomics,
    "q114_pack_eff"     -> q114PackEfficiency,
    "q66_winnow"        -> q66Winnow,
    "q220_winnow_sweep" -> q220WinnowSweep,
    "q67_hash_sample"   -> q67HashSample,
    "q55_engagement"    -> q55Engagement,
    "q57_tfidf"         -> q57Tfidf,
    "q31_tokens"        -> q31Tokens,
    "q32_string_funcs"  -> q32StringFuncs,
    "q33_lang_stats"    -> q33LangStats,
    "q34_quality"       -> q34Quality,
    "q97_gopher_rules"  -> q97GopherRules,
    "q35_lang_id"       -> q35LangId,
    "q36_dedup_exact"   -> q36DedupExact,
    "q37_dedup_summary" -> q37DedupSummary,
  )

  /** The q159 fixture as a SQL VALUES body — generated from the ONE
    * Scala constant so the two engines read identical bytes. */
  private def unicodeValuesSql: String = UnicodeFixture
    .map { case (fid, t) => s"($fid, '${t.replace("'", "''")}')" }
    .mkString(", ")

  def oracle: Map[String, String] = Map(
    // both entropies recomputed from integer counts with the same
    // k/n · ln(k/n) fold; char units via codepoint substr (q159 contract)
    "q162_entropy" ->
      """WITH nm AS (
        |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest([substr(s, i, 1) for i in range(1, length(s) + 1)]) AS u
        |  FROM nm),
        |cc AS (SELECT doc_id, u, count(*) AS k FROM ch GROUP BY 1, 2),
        |ct AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM cc GROUP BY 1),
        |ce AS (
        |  SELECT cc.doc_id, ct.n AS n_chars,
        |    round(-sum((k / CAST(ct.n AS DOUBLE)) * ln(k / CAST(ct.n AS DOUBLE))), 4) AS char_entropy
        |  FROM cc JOIN ct USING (doc_id) GROUP BY 1, 2),
        |tk AS (
        |  SELECT doc_id, unnest(string_split(s, ' ')) AS u FROM nm),
        |tc AS (SELECT doc_id, u, count(*) AS k FROM tk GROUP BY 1, 2),
        |tt AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM tc GROUP BY 1),
        |te AS (
        |  SELECT tc.doc_id, tt.n AS n_toks,
        |    round(-sum((k / CAST(tt.n AS DOUBLE)) * ln(k / CAST(tt.n AS DOUBLE))), 4) AS tok_entropy
        |  FROM tc JOIN tt USING (doc_id) GROUP BY 1, 2)
        |SELECT ce.doc_id, ce.n_chars, ce.char_entropy, te.n_toks, te.tok_entropy
        |FROM ce JOIN te USING (doc_id) ORDER BY doc_id""".stripMargin,
    // every kernel leg replayed codepoint-wise: substr/length are
    // codepoint-based in DuckDB; the BPE segment leg reuses the q145
    // chr(31) framing (RE2 '(.)' frames per CODE POINT) with the two
    // literal merges; winnow = md5 char-grams + sliding pairwise min;
    // first shingle is positional substr(s,1,3) (array_distinct keeps
    // first-occurrence order on the engine side)
    "q159_unicode_kernels" -> (
      """WITH f(fid, txt) AS (VALUES """ + unicodeValuesSql + """),
        |c AS (
        |  SELECT doc_id + 100 AS fid,
        |    regexp_replace(regexp_replace(text, 'e', 'é', 'g'), 'o', '😀', 'g') AS txt
        |  FROM documents WHERE doc_id < 10),
        |a AS (SELECT CAST(fid AS BIGINT) AS fid, txt FROM f
        |      UNION ALL SELECT fid, txt FROM c),
        |n AS (SELECT fid, txt, trim(regexp_replace(txt, '\s+', ' ', 'g')) AS s FROM a),
        |tk AS (SELECT fid, string_split(s, ' ') AS toks FROM n),
        |wn AS (SELECT fid, CASE WHEN length(s) >= 4
        |        THEN [md5(substr(s, i, 3)) for i in range(1, length(s) - 1)]
        |        ELSE [] END AS g FROM n),
        |sg AS (SELECT fid,
        |    chr(31) || chr(31) ||
        |      regexp_replace(string_split(s, ' ')[1], '(.)', '\1' || chr(31) || chr(31), 'g') AS f0
        |  FROM n),
        |sg2 AS (SELECT fid,
        |    replace(f0, chr(31) || 'c' || chr(31) || chr(31) || 'a' || chr(31),
        |      chr(31) || 'ca' || chr(31)) AS f1 FROM sg),
        |sg3 AS (SELECT fid,
        |    replace(f1, chr(31) || '😀' || chr(31) || chr(31) || '😀' || chr(31),
        |      chr(31) || '😀😀' || chr(31)) AS f2 FROM sg2)
        |SELECT n.fid,
        |  CAST(len(tk.toks) AS BIGINT) AS n_toks,
        |  CAST(length(n.s) AS BIGINT) AS n_chars,
        |  md5(n.s) AS fp,
        |  CASE WHEN length(n.s) >= 3 THEN substr(n.s, 1, 3) END AS sh3,
        |  CAST(CASE WHEN length(n.s) >= 3 THEN len(list_distinct(
        |    [substr(n.s, i, 3) for i in range(1, length(n.s) - 1)])) ELSE 0 END AS BIGINT) AS n_sh3,
        |  CAST(len(regexp_extract_all(n.txt, '""" + TextFns.BpePattern.replace("'", "''") + """')) AS BIGINT) AS n_bpe,
        |  regexp_extract_all(n.txt, '""" + TextFns.BpePattern.replace("'", "''") + """')[1] AS first_bpe,
        |  CAST(CASE WHEN len(tk.toks) >= 2 THEN len(list_distinct(
        |    [tk.toks[i] || ' ' || tk.toks[i+1] for i in range(1, len(tk.toks))])) ELSE 0 END AS BIGINT) AS n_g2,
        |  trim(replace(sg3.f2, chr(31) || chr(31), ' ')) AS seg1,
        |  CAST(CASE WHEN len(wn.g) >= 2 THEN len(list_distinct(
        |    [least(wn.g[i], wn.g[i+1]) for i in range(1, len(wn.g))])) ELSE 0 END AS BIGINT) AS n_winnow
        |FROM n JOIN tk USING (fid) JOIN wn USING (fid) JOIN sg3 USING (fid)
        |ORDER BY fid""").stripMargin,
    "q129_bpe_pairs" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS n FROM (
        |    SELECT regexp_replace(w0, '[\x00-\x1f]', '', 'g') AS w FROM (
        |      SELECT unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS w0
        |      FROM documents))
        |  WHERE length(w) > 0 GROUP BY 1),
        |p AS (
        |  SELECT unnest([substr(w, i, 2) for i in range(1, length(w))]) AS pair, n
        |  FROM wc WHERE length(w) > 1)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS weight
        |FROM p GROUP BY 1 ORDER BY weight DESC, pair LIMIT 20""".stripMargin,
    // the FULL training replay: fold the exported merge list over every
    // vocabulary word with a recursive CTE. Symbols are framed
    // ␟␟s1␟␟s2␟␟ (chr(31), stripped from words by the trainer); merge
    // (a,b) rewrites ␟a␟␟b␟ → ␟ab␟ — both boundaries anchored, so
    // single-pass replace equals the greedy no-re-pair merge scan, and
    // each disjoint occurrence keeps a full frame (the rewrite consumes
    // one ␟ of each boundary pair and restores it)
    "q145_bpe_segment" ->
      s"""WITH RECURSIVE
        |$bpeReplayCtes
        |SELECT wc.w, wc.n, fin.segmented,
        |  CAST(len(string_split(fin.segmented, ' ')) AS BIGINT) AS n_syms
        |FROM wc JOIN fin USING (w)
        |ORDER BY w""".stripMargin,
    // the replay's INTERMEDIATE states, token-weighted: seg holds every
    // round's framed representation, so the curve is one aggregation
    // over what q145's certification already materializes
    "q152_merge_curve" ->
      s"""WITH RECURSIVE
        |$bpeReplayCtes
        |SELECT CAST(seg.i AS BIGINT) AS merge_no,
        |  CAST(sum(wc.n *
        |    len(string_split(trim(replace(seg.r, chr(31) || chr(31), ' ')), ' '))) AS BIGINT)
        |    AS total_symbols
        |FROM seg JOIN wc USING (w)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // fertility: the q145 replay's per-word symbol counts, token-weighted
    // per source — sw recounts (source, word) with the same control-strip
    "q146_tok_fertility" ->
      s"""WITH RECURSIVE
        |$bpeReplayCtes,
        |sw AS (
        |  SELECT source, w, count(*) AS n FROM (
        |    SELECT source, regexp_replace(w0, '[\\x00-\\x1f]', '', 'g') AS w FROM (
        |      SELECT source,
        |        unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS w0
        |      FROM documents))
        |  WHERE length(w) > 0 GROUP BY 1, 2),
        |sy AS (
        |  SELECT w, CAST(len(string_split(segmented, ' ')) AS BIGINT) AS n_syms
        |  FROM fin)
        |SELECT sw.source,
        |  CAST(sum(sw.n) AS BIGINT) AS n_tokens,
        |  CAST(sum(sw.n * sy.n_syms) AS BIGINT) AS n_pieces,
        |  round(sum(sw.n * sy.n_syms) / sum(sw.n), 4) AS fertility
        |FROM sw JOIN sy USING (w)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // MaxMatch replayed: rebuild the vocab (corpus codepoints + merge
    // symbols), precompute the longest vocab match at every word
    // position (max_by is unambiguous — equal-length matches at one
    // position are the same string), then a recursive pointer walk
    // emits the greedy segmentation. DuckDB len/substr/string_split
    // are codepoint-based, matching the engine's codePointSyms lengths.
    "q167_maxmatch_segment" ->
      """WITH RECURSIVE
        |wc AS (
        |  SELECT w, count(*) AS n FROM (
        |    SELECT regexp_replace(w0, '[\x00-\x1f]', '', 'g') AS w FROM (
        |      SELECT unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS w0
        |      FROM documents))
        |  WHERE length(w) > 0 GROUP BY 1),
        |m AS (SELECT merge_no, a, b
        |      FROM read_parquet('{GRAFT_OUT}_support/q145_support_merges/*.parquet')),
        |vocab AS (
        |  SELECT DISTINCT v FROM (
        |    SELECT unnest(string_split(w, '')) AS v FROM wc
        |    UNION ALL
        |    SELECT a || b AS v FROM m)),
        |pos AS (SELECT w, unnest(range(1, len(w) + 1)) AS i FROM wc),
        |best AS (
        |  SELECT p.w, p.i, max_by(v.v, len(v.v)) AS v,
        |    CAST(max(len(v.v)) AS BIGINT) AS l
        |  FROM pos p JOIN vocab v ON substr(p.w, p.i, len(v.v)) = v.v
        |  GROUP BY 1, 2),
        |walk(w, i, segs) AS (
        |  SELECT w, CAST(1 AS BIGINT), CAST('' AS VARCHAR) FROM wc
        |  UNION ALL
        |  SELECT x.w, x.i + b.l, x.segs || ' ' || b.v
        |  FROM walk x JOIN best b ON b.w = x.w AND b.i = x.i),
        |fin AS (SELECT w, trim(segs) AS segmented FROM walk WHERE i = len(w) + 1)
        |SELECT wc.w, wc.n, fin.segmented,
        |  CAST(len(string_split(fin.segmented, ' ')) AS BIGINT) AS n_syms
        |FROM wc JOIN fin USING (w)
        |ORDER BY w""".stripMargin,
    // round-1 symbols are single characters, so non-overlapping string
    // replace IS the greedy left-to-right pair merge — the oracle
    // recomputes the trainer kernel's occurrence count independently
    "q130_merge_compression" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS n FROM (
        |    SELECT regexp_replace(w0, '[\x00-\x1f]', '', 'g') AS w FROM (
        |      SELECT unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS w0
        |      FROM documents))
        |  WHERE length(w) > 1 GROUP BY 1),
        |pr AS (
        |  SELECT unnest([substr(w, i, 2) for i in range(1, length(w))]) AS pair, n
        |  FROM wc),
        |top AS (
        |  SELECT pair FROM (
        |    SELECT pair, CAST(sum(n) AS BIGINT) AS weight FROM pr GROUP BY 1)
        |  ORDER BY weight DESC, pair LIMIT 1),
        |m AS (
        |  SELECT n, length(w) AS len,
        |    length(w) - length(replace(w, (SELECT pair FROM top), 'X')) AS occ
        |  FROM wc)
        |SELECT (SELECT pair FROM top) AS pair,
        |  CAST(sum(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS words_hit,
        |  CAST(sum(n * occ) AS BIGINT) AS occurrences,
        |  CAST(sum(n * len) AS BIGINT) AS chars_before,
        |  CAST(sum(n * len) - sum(n * occ) AS BIGINT) AS symbols_after
        |FROM m""".stripMargin,
    // Boilerplate scrub recomputed end-to-end: same tokenization, same
    // trigram construction, the same integer-math threshold (df*100 >= N),
    // and reassembly by position anti-join — string_agg ORDER BY position
    // mirrors the engine's index-filtered concat_ws exactly.
    "q110_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
        |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
        |  FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
        |  WHERE len(toks) >= 3),
        |b AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING count(DISTINCT doc_id) * 100 >= (SELECT count(*) FROM t)),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.pos + o.o AS cp
        |  FROM g JOIN b USING (gram), unnest([0, 1, 2]) AS o(o)),
        |tok AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos1, toks[i] AS tok
        |  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
        |keep AS (
        |  SELECT k.doc_id, k.pos1, k.tok
        |  FROM tok k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.cp = k.pos1 - 1
        |  WHERE c.doc_id IS NULL)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  CAST(len(t.toks) - count(k.tok) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(k.tok, ' ' ORDER BY k.pos1), '') AS clean_text
        |FROM t LEFT JOIN keep k USING (doc_id)
        |GROUP BY t.doc_id, t.toks
        |ORDER BY t.doc_id""".stripMargin,
    // Run collapse replayed relationally: positions + lag give the
    // keep-set; gaps-and-islands (pos - row_number per token) gives the
    // longest run — the window-based restatement of the engine's fold.
    "q133_run_collapse" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks[i] AS tok, i AS pos
        |  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
        |l AS (
        |  SELECT doc_id, tok, pos,
        |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM u),
        |runs AS (
        |  SELECT doc_id, tok,
        |    pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS isl
        |  FROM u),
        |mr AS (
        |  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS max_run FROM (
        |    SELECT doc_id, count(*) AS cnt FROM runs GROUP BY doc_id, tok, isl)
        |  GROUP BY doc_id)
        |SELECT l.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(count(*) FILTER (WHERE prev = tok) AS BIGINT) AS n_collapsed,
        |  mr.max_run,
        |  string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE prev IS NULL OR tok != prev) AS clean_text
        |FROM l JOIN mr USING (doc_id)
        |GROUP BY l.doc_id, mr.max_run
        |ORDER BY l.doc_id""".stripMargin,
    // the whole cascade relationally: collapse (lag keep-set), boiler df
    // over the COLLAPSED corpus (q110's CTEs re-rooted on ctoks), exact
    // fingerprint of the final text, canonical = min doc_id per fp
    "q143_token_yield" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, toks[i] AS tok, i AS pos
        |  FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
        |l AS (
        |  SELECT doc_id, tok, pos,
        |    lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        |  FROM u),
        |ck AS (
        |  SELECT doc_id, list(tok ORDER BY pos) AS ctoks
        |  FROM l WHERE prev IS NULL OR tok != prev GROUP BY doc_id),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
        |    ctoks[i] || ' ' || ctoks[i+1] || ' ' || ctoks[i+2] AS gram
        |  FROM ck, unnest(range(1, len(ctoks) - 1)) AS r(i)
        |  WHERE len(ctoks) >= 3),
        |b AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING count(DISTINCT doc_id) * 100 >= (SELECT count(*) FROM t)),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.pos + o.o AS cp
        |  FROM g JOIN b USING (gram), unnest([0, 1, 2]) AS o(o)),
        |tok2 AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos1, ctoks[i] AS tok
        |  FROM ck, unnest(range(1, len(ctoks) + 1)) AS r(i)),
        |keep AS (
        |  SELECT k.doc_id, k.pos1, k.tok
        |  FROM tok2 k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.cp = k.pos1 - 1
        |  WHERE c.doc_id IS NULL),
        |fin AS (
        |  SELECT ck.doc_id, len(ck.ctoks) AS n_coll,
        |    count(k.tok) AS n_scrub,
        |    md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.pos1), '')) AS fp
        |  FROM ck LEFT JOIN keep k USING (doc_id) GROUP BY ck.doc_id, ck.ctoks),
        |cn AS (SELECT fp, min(doc_id) AS keep_id FROM fin GROUP BY 1)
        |SELECT t.source,
        |  CAST(sum(len(t.toks)) AS BIGINT) AS n_raw,
        |  CAST(sum(fin.n_coll) AS BIGINT) AS n_collapsed,
        |  CAST(sum(fin.n_scrub) AS BIGINT) AS n_scrubbed,
        |  CAST(sum(CASE WHEN fin.doc_id = cn.keep_id THEN fin.n_scrub ELSE 0 END) AS BIGINT) AS n_yield
        |FROM t JOIN fin USING (doc_id) JOIN cn USING (fp)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The rule gate recomputed signal by signal: identical tokenization,
    // identical rounding BEFORE the threshold comparisons, verdict as 0/1.
    "q97_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    round(length(replace(array_to_string(toks, ' '), ' ', '')) * 1.0 / len(toks), 4) AS mean_wlen,
        |    CAST(list_contains(toks, 'the') AS BIGINT)
        |      + CAST(list_contains(toks, 'a') AS BIGINT)
        |      + CAST(list_contains(toks, 'of') AS BIGINT) AS stop_hits,
        |    round((length(text) - length(replace(text, '#', ''))) * 1.0 / len(toks), 4) AS symbol_ratio
        |  FROM t)
        |SELECT doc_id, n_words, mean_wlen, stop_hits,
        |  CAST(CASE WHEN n_words BETWEEN 30 AND 90 AND mean_wlen BETWEEN 3 AND 10
        |    AND stop_hits >= 1 AND symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    "q77_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS tok
        |  FROM documents),
        |v AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM tok GROUP BY 1
        |    ORDER BY c DESC, tok LIMIT 16))
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM tok t LEFT JOIN v ON t.tok = v.tok
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q75_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, unnest(range(1, len(toks) + 1, 48)) AS chunk_start, toks FROM t)
        |SELECT doc_id, chunk_start,
        |  len(toks[chunk_start : chunk_start + 63]) AS chunk_toks,
        |  md5(array_to_string(toks[chunk_start : chunk_start + 63], ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_start""".stripMargin,
    "q76_pack" ->
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens
         |  FROM documents),
         |b AS (
         |  SELECT source,
         |    ${duckPackBin(512L)} AS bin,
         |    n_tokens
         |  FROM t)
         |SELECT source, CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q73_token_budget" ->
      """SELECT source, lang,
        |  CAST(sum(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) AS BIGINT) AS tokens,
        |  count(*) AS docs
        |FROM documents GROUP BY ROLLUP (source, lang)
        |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin,
    "q71_scrub" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or' ||
        |    ' https://example.com/p/' || doc_id || ' now' AS marked
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(marked, 'https?://[^\s]+')) AS n_urls,
        |  len(regexp_extract_all(marked, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  md5(regexp_replace(regexp_replace(marked, 'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')) AS clean_fp
        |FROM m ORDER BY doc_id""".stripMargin,
    // the q69 CTEs replayed per gram order (concat width and length
    // guard parameterized), one all-BIGINT summary row per n
    "q223_decontam_order_sweep" -> {
      def gramExpr(n: Int): String =
        (0 until n).map(k => if (k == 0) "toks[i]" else s"toks[i+$k]")
          .mkString(" || ' ' || ")
      val chains = TextOps.SweepGramNs.map { n =>
        s"""sh$n AS (
           |  SELECT doc_id, unnest(list_distinct(
           |    [${gramExpr(n)}
           |     for i in range(1, len(toks) - ${n - 2})])) AS g
           |  FROM t WHERE len(toks) >= $n),
           |ev$n AS (SELECT DISTINCT g FROM sh$n WHERE doc_id < 50),
           |pd$n AS (
           |  SELECT sh$n.doc_id, count(*) AS n_grams,
           |    CAST(sum(CASE WHEN ev$n.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
           |  FROM sh$n LEFT JOIN ev$n ON sh$n.g = ev$n.g
           |  WHERE sh$n.doc_id >= 50 GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      val rows = TextOps.SweepGramNs.map { n =>
        s"""  SELECT CAST($n AS BIGINT) AS n,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(CASE WHEN n_overlap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           |    CAST(sum(n_overlap) AS BIGINT) AS total_overlap,
           |    CAST(sum(n_grams) AS BIGINT) AS total_grams
           |  FROM pd$n""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM documents),
         |$chains
         |$rows
         |ORDER BY n""".stripMargin
    },
    "q69_contamination" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]
        |     for i in range(1, len(toks) - 3)])) AS g
        |  FROM t WHERE len(toks) >= 5),
        |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id < 50)
        |SELECT sh.doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
        |FROM sh LEFT JOIN ev ON sh.g = ev.g
        |WHERE sh.doc_id >= 50 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q68_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g1 AS (SELECT doc_id, unnest(toks) AS g FROM t),
        |g2 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
        |                              for i in range(1, len(toks))]) AS g
        |       FROM t WHERE len(toks) >= 2),
        |g3 AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                              for i in range(1, len(toks) - 1)]) AS g
        |       FROM t WHERE len(toks) >= 3),
        |s1 AS (SELECT doc_id, max(c) AS top1, CAST(sum(c) AS BIGINT) AS tot1 FROM
        |        (SELECT doc_id, g, count(*) AS c FROM g1 GROUP BY 1, 2) GROUP BY 1),
        |s2 AS (SELECT doc_id, max(c) AS top2, CAST(sum(c) AS BIGINT) AS tot2 FROM
        |        (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        |s3 AS (SELECT doc_id, CAST(sum(c) - count(*) AS BIGINT) AS dup3,
        |               CAST(sum(c) AS BIGINT) AS tot3 FROM
        |        (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1)
        |SELECT doc_id, top1, tot1, top2, tot2, dup3, tot3
        |FROM s1 JOIN s2 USING (doc_id) JOIN s3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q67_hash_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |  CASE WHEN lang = 'en' THEN '80' WHEN lang = 'de' THEN '40' ELSE '19' END
        |ORDER BY doc_id""".stripMargin,
    "q65_bpe_tokens" ->
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '${TextFns.BpePattern.replace("'", "''")}')) AS n_bpe,
         |  len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_ws
         |FROM documents ORDER BY doc_id""".stripMargin,
    // q65's kernels re-aggregated per language; integer sums are exact, so
    // the two rounded ratios divide identical operands on both engines.
    "q113_tok_econ" ->
      s"""WITH t AS (
         |  SELECT lang,
         |    len(regexp_extract_all(text, '${TextFns.BpePattern.replace("'", "''")}')) AS n_bpe,
         |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_ws,
         |    length(text) AS n_chars_raw
         |  FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
         |  CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
         |  round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_ws), 4) AS fertility,
         |  round(CAST(sum(n_chars_raw) AS DOUBLE) / sum(n_bpe), 4) AS chars_per_token
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    // q76's packing CTE evaluated at each candidate size, rolled up to the
    // per-size efficiency row; integer sums keep fill_rate's operands
    // identical on both engines.
    "q114_pack_eff" -> {
      def one(sz: Long) =
        s"""SELECT CAST($sz AS BIGINT) AS bin_size,
           |  CAST(count(*) AS BIGINT) AS n_bins,
           |  CAST(sum(bin_tokens) AS BIGINT) AS tokens,
           |  round(CAST(sum(bin_tokens) AS DOUBLE) / (count(*) * $sz), 4) AS fill_rate
           |FROM (
           |  SELECT source, bin, sum(n_tokens) AS bin_tokens FROM (
           |    SELECT source,
           |      ${duckPackBin(sz)} AS bin,
           |      n_tokens FROM t) GROUP BY 1, 2)""".stripMargin
      s"""WITH t AS (
         |  SELECT source, doc_id,
         |    len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens
         |  FROM documents)
         |${Seq(256L, 512L, 1024L).map(one).mkString("\nUNION ALL\n")}
         |ORDER BY bin_size""".stripMargin
    },
    // the q66 winnow CTE replayed per window size (slice width and both
    // length guards parameterized the same way the engine kernel is),
    // one all-BIGINT row per w
    "q220_winnow_sweep" -> {
      val rows = TextOps.SweepWinnowWs.map { w =>
        s"""  SELECT CAST($w AS BIGINT) AS w,
           |    CAST(count(CASE WHEN len(wins) > 0 THEN 1 END) AS BIGINT) AS n_docs,
           |    CAST(sum(len(wins)) AS BIGINT) AS total_prints,
           |    (SELECT CAST(count(DISTINCT p) AS BIGINT)
           |     FROM (SELECT unnest(wins) AS p FROM win$w)) AS distinct_prints
           |  FROM win$w""".stripMargin
      }.mkString("\nUNION ALL\n")
      val wins = TextOps.SweepWinnowWs.map { w =>
        s"""g$w AS (
           |  SELECT doc_id, CASE WHEN length(s) >= ${7 + w}
           |    THEN [md5(s[i:i+7]) for i in range(1, length(s) - 6)]
           |    ELSE [] END AS grams FROM t),
           |win$w AS (
           |  SELECT doc_id, CASE WHEN len(grams) >= $w
           |    THEN list_distinct([list_min(grams[j:j+${w - 1}])
           |                        for j in range(1, len(grams) - ${w - 2})])
           |    ELSE [] END AS wins FROM g$w)""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (
         |  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS s FROM documents),
         |$wins
         |$rows
         |ORDER BY w""".stripMargin
    },
    "q66_winnow" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS s FROM documents),
        |g AS (
        |  SELECT doc_id, CASE WHEN length(s) >= 11
        |    THEN [md5(s[i:i+7]) for i in range(1, length(s) - 6)]
        |    ELSE [] END AS grams FROM t),
        |win AS (
        |  SELECT doc_id, CASE WHEN len(grams) >= 4
        |    THEN list_distinct([list_min(grams[j:j+3]) for j in range(1, len(grams) - 2)])
        |    ELSE [] END AS wins FROM g)
        |SELECT doc_id, len(wins) AS n_prints, list_min(wins) AS min_print
        |FROM win ORDER BY doc_id""".stripMargin,
    "q57_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, rn, term, tfidf FROM (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC, tf.term) AS rn
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,
    "q55_engagement" ->
      """SELECT doc_id,
        |  CAST(regexp_extract(marked, '\[Impressions\]:\s*(\d+)', 1) AS BIGINT) AS impressions,
        |  CAST(regexp_extract(marked, '\[Post Upvotes\]:\s*(\d+)', 1) AS BIGINT) AS upvotes
        |FROM (SELECT doc_id,
        |        text || ' [Impressions]: ' || n_chars || ' [Post Upvotes]: ' || (doc_id % 1000) AS marked
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q30_html_extract" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(text, '\s+', ' ', 'g')) || ' [Impressions]:') AS fp,
        |  length(trim(regexp_replace(text, '\s+', ' ', 'g')) || ' [Impressions]:') AS n_extracted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_tokens" ->
      """SELECT doc_id,
        |  len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS n_tokens,
        |  length(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS n_chars_norm,
        |  md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_string_funcs" ->
      """SELECT doc_id,
        |  regexp_replace('doc_' || doc_id || '.html', '\.html$', '.txt') AS txt_name,
        |  source || ':' || lang AS tag,
        |  length(trim(text)) AS len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_lang_stats" ->
      s"""SELECT lang, source, count(*) AS n,
        |  ${graft.ops.ExactMean.meanIntSql("n_chars", 2)} AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q34_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS toks,
        |    trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS n_tok,
        |    CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','or','to','in'))) AS DOUBLE) AS n_stop,
        |    CAST(length(replace(norm, ' ', '')) AS DOUBLE) AS chars_ns
        |  FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |  round(chars_ns / n_tok, 4) AS avg_word_len,
        |  round(n_stop / n_tok, 4) AS stop_ratio,
        |  round(least(n_tok / 50.0, 1.0) * (1.0 - n_stop / n_tok), 4) AS quality
        |FROM u ORDER BY doc_id""".stripMargin,
    "q35_lang_id" ->
      """SELECT lang,
        |  CASE WHEN contains(trim(regexp_replace(text, '\s+', ' ', 'g')), ' the ') THEN 'en'
        |       WHEN contains(trim(regexp_replace(text, '\s+', ' ', 'g')), ' la ') THEN 'es'
        |       WHEN contains(trim(regexp_replace(text, '\s+', ' ', 'g')), ' der ') THEN 'de'
        |       ELSE 'und' END AS guess,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q36_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q37_dedup_summary" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique
        |FROM documents""".stripMargin,
  )
}
