package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Persistable INVERTED INDEX — the retrieval twin of the persisted
  * MinHash index (fuzzy dedup) and Bloom sketch (decontamination): build
  * once over the corpus, save as plain parquet, serve BM25 queries from
  * the index WITHOUT re-reading the corpus text. This is the production
  * split of q84 (which tokenizes inline): index build is the one corpus
  * pass, and each query is then hit-sized, not corpus-sized.
  *
  * Layout (all plain parquet — no engine-private format, readable by any
  * tool):
  *   - `postings/`  (term, doc_id, tf) — range-partitioned and sorted BY
  *     TERM, so a term lookup footer-prunes to ~one file (the disk shape
  *     of a postings list without a custom format);
  *   - `doclens/`   (doc_id, dl);
  *   - `stats/`     one row (n_docs, avgdl).
  *
  * Scale: build is tokenize → partial-agg count keyed on (term, doc_id) —
  * one shuffle; the term-range write is the same layout pass as
  * [[graft.sources.Compaction]]. Queries filter postings with a codegen'd
  * isin at the scan (PushedFilters on the sorted term column), join the
  * ≤|query|-row df side broadcast, and take top-k via TakeOrdered. */
object InvertedIndex {

  /** Two corpus passes (postings, doclens) → the three index tables under
    * `dir`.
    *
    * doclens comes from the DOCS frame (tokenCount per row), exactly
    * mirroring the inline q84 scorer — NOT from the exploded token stream,
    * which would silently drop docs that tokenize to nothing and skew
    * n_docs/avgdl away from the inline/oracle contract on such corpora
    * (hence the second pass). stats then READS BACK the just-written
    * doclens parquet — a doc-count-sized scan, never a third tokenize of
    * the corpus. */
  def build(spark: SparkSession, docs: DataFrame, dir: String,
      nPostingFiles: Int = 8): Unit = {
    docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .repartitionByRange(nPostingFiles, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/postings")
    docs.select(col("doc_id"), TextFns.tokenCount(col("text")).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$dir/doclens")
    spark.read.parquet(s"$dir/doclens")
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl")) // float-mean: intermediate
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Append a document batch to a SAVED index without re-reading the
    * indexed corpus — the continuous-ingest maintenance op: the batch's
    * postings write as NEW term-range-sorted files next to the existing
    * ones (term lookups still footer-prune per file), doclens appends, and
    * stats recomputes from the full doclens table (a doc-count-sized scan,
    * never a corpus re-tokenize). Postings are per-doc (no corpus-level
    * fit), so an appended index serves EXACTLY the same scores as a fresh
    * build over the union corpus (asserted in InvertedIndexSpec). */
  def append(spark: SparkSession, docs: DataFrame, dir: String,
      nPostingFiles: Int = 8): Unit = {
    import graft.sources.SwapProtocol
    // append INTO the resolved live dirs: after a pointer-publishing
    // Compaction.compact of postings/doclens, the literal subdir path is
    // a retired plain dir (or absent) — an append there would be
    // invisible to the resolving searchBm25 (r18 review finding); a
    // never-compacted plain dir resolves to itself, so fresh indexes are
    // unaffected
    val postingsDir = SwapProtocol.resolve(spark, s"$dir/postings")
    val doclensDir = SwapProtocol.resolve(spark, s"$dir/doclens")
    // append is the documented exception to "committed versions are
    // immutable": it mutates the resolved LIVE dir in place (per-doc
    // postings make the appended index serve exactly as a fresh build,
    // so a versioned republish per batch would be pure write
    // amplification). The crash residue that leaves behind is a
    // `_temporary` committer dir inside a committed version — invisible
    // to Spark readers (underscore paths are hidden) but never
    // reconciled by recoverPointed, so THIS writer prunes it before its
    // own append (r18 ADVICE; single-writer discipline means residue
    // here is necessarily a crash, never a live append).
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Seq(postingsDir, doclensDir).foreach { d =>
      val residue = new org.apache.hadoop.fs.Path(d, "_temporary")
      if (fsys.exists(residue)) fsys.delete(residue, true)
    }
    docs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .repartitionByRange(nPostingFiles, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("append").parquet(postingsDir)
    docs.select(col("doc_id"), TextFns.tokenCount(col("text")).cast("long").as("dl"))
      .write.mode("append").parquet(doclensDir)
    // stats is LIVE-index state: publish through the crash-recoverable
    // swap (mode("overwrite") deletes before writing — a crash in that
    // window would fail every searchBm25 until a manual recompute).
    // stats stays RENAME-managed (1-row table, never compacted).
    val dst = new org.apache.hadoop.fs.Path(s"$dir/stats")
    val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
    graft.sources.SwapProtocol.writeSwapped(fs, dst) { tmp =>
      spark.read.parquet(doclensDir)
        .agg(count(lit(1)).cast("double").as("n_docs"),
          avg(col("dl")).as("avgdl")) // float-mean: intermediate
        .write.parquet(tmp.toString)
    }
  }

  /** Table maintenance for the two ACCUMULATING index tables: [[append]]
    * adds new term-range files per batch (correct but file-count-growing),
    * and this re-establishes few files covering disjoint sorted ranges —
    * postings keyed on term (the lookup key footer-pruning serves by),
    * doclens on doc_id. Both publish through pointer mode
    * ([[graft.sources.Compaction.compact]] in place), which is what later
    * migrates the subdirs the plain [[build]] wrote; stats is NOT routed
    * here — it is a 1-row rename-managed table refreshed by every append.
    *
    * `retain` pins the reader-lifetime contract AT THIS SITE (the r18
    * verdict #6 doctrine, applied to the last pointed site without it):
    * a BM25 server resolves its postings path once per serve window and
    * footer-prunes against those files, so a compacted-away version must
    * outlive the longest in-flight QUERY WINDOW — seconds-to-minutes of
    * lookups, not the training epochs ShardExport must survive. The
    * default retain=2 (one further maintenance cycle of grace) is
    * therefore sized to serve windows ≪ maintenance cadence; a deployment
    * whose servers cache the resolved path across cycles sizes it up.
    * Returns the compacted postings file count. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20, retain: Int = 2): Int = {
    val n = graft.sources.Compaction.compact(
      spark, s"$dir/postings", s"$dir/postings", "term", targetBytes, retain)
    graft.sources.Compaction.compact(
      spark, s"$dir/doclens", s"$dir/doclens", "doc_id", targetBytes, retain)
    n
  }

  /** BM25 top-k over a saved index — the corpus text is never touched.
    * Same math, rounding, and tie-break as the inline q84 scorer.
    * Every table read resolves through [[graft.sources.SwapProtocol]]:
    * stats completes a crashed append's rename-mode swap, and postings/
    * doclens may be pointer-managed versions when the index has been
    * maintained by [[graft.sources.Compaction.compact]] (which publishes
    * pointed) — a plain dir resolves to itself, so fresh builds are
    * unaffected. */
  def searchBm25(spark: SparkSession, dir: String, terms: Seq[String],
      // k1/b priced by q218 ((1.2, 0.75) ties the best measured recall@5/MRR@5/nDCG@5 on the q138 qrels)
      k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import graft.sources.SwapProtocol
    val postings = spark.read.parquet(SwapProtocol.resolve(spark, s"$dir/postings"))
      .filter(col("term").isin(terms: _*)) // footer-pruned on the sorted term
    val doclens = spark.read.parquet(SwapProtocol.resolve(spark, s"$dir/doclens"))
    val stats = spark.read.parquet(SwapProtocol.resolve(spark, s"$dir/stats"))
    val df_ = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    postings
      .join(broadcast(df_), Seq("term"))
      .join(doclens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("score_t",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + (col("dl") / col("avgdl") * b + (1 - b)) * k1))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score_t")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }
}
