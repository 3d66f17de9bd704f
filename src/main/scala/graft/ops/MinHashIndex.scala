package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Persistable MinHash signature index — the PRODUCTION shape of fuzzy
  * dedup at 100 TB: the corpus signature table is computed once, stored as
  * plain Parquet, and every new ingest batch is deduplicated AGAINST it
  * without touching corpus text again (the batch-vs-corpus twin of q38's
  * within-corpus pairs; reference dedup intent, create_metadata_df.py
  * corpus assembly). Same construction as q38 — word-trigram shingles →
  * FNV-1a hashes → 32-permutation MinHash, 16 bands × 2 rows — so an index
  * built today keeps matching batches scored tomorrow.
  *
  * Scale shape: the index is (doc_id, hs, sig) — hs (the sorted shingle
  * hash set) rides along for exact Jaccard verification, so query() is
  * candidates (band equi-join, linear) → verify (sorted-merge kernel on
  * candidates only). Partition the saved Parquet by band-bucket prefix for
  * co-located candidate joins at cluster scale.
  */
object MinHashIndex {

  /** Signature table (doc_id, hs, sig) for a (doc_id, text) corpus. */
  def build(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.shingleHashes(TextFns.normText(col("text"))).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), col("hs"), Dedup.minhashSig(col("hs")).as("sig"))

  /** Persist the index. A dir that table maintenance has since migrated
    * to pointer management ([[graft.sources.Compaction.compact]] in
    * place) must be RE-saved through the pointer too — a plain overwrite
    * there would be invisible to resolving loaders, silently serving the
    * stale pre-rebuild version (r18 review finding). */
  def save(index: DataFrame, dir: String): Unit = {
    import graft.sources.SwapProtocol
    val dst = new org.apache.hadoop.fs.Path(dir)
    val fs = dst.getFileSystem(index.sparkSession.sessionState.newHadoopConf())
    if (SwapProtocol.isPointerManaged(fs, dst))
      SwapProtocol.writePointed(fs, dst)(v => index.write.parquet(v.toString))
    else index.write.mode("overwrite").parquet(dir)
  }

  /** Load a saved index; resolves through
    * [[graft.sources.SwapProtocol.resolve]] so a dir maintained by
    * [[graft.sources.Compaction.compact]] (pointer-published versions)
    * loads transparently — a plain dir resolves to itself. */
  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(graft.sources.SwapProtocol.resolve(spark, dir))

  /** Near-duplicate pairs between a NEW batch (doc_id, text) and the
    * indexed corpus: (batch_id, corpus_id, jaccard) with exact trigram
    * Jaccard ≥ `threshold`. LSH recall follows q38's band layout
    * (P(candidate) = 1-(1-s²)¹⁶ ≈ 1 for s ≥ 0.8). */
  def query(index: DataFrame, batch: DataFrame, threshold: Double = 0.8): DataFrame = {
    // cache both signature tables: bands + verify each read them twice,
    // and CollapseProject would re-inline the signature kernels otherwise.
    // BUT an ALREADY-cached index belongs to the caller — who loads once
    // and probes many batches; unpersisting it here would evict that
    // shared cache after the first probe. Cache only what we cached.
    val indexWasCached = index.storageLevel.useMemory || index.storageLevel.useDisk
    val corpus = if (indexWasCached) index else index.cache()
    val fresh = build(batch).cache()
    val cand = Dedup.bandsOf(fresh)
      .toDF("batch_id", "band", "bhash")
      .join(Dedup.bandsOf(corpus).toDF("corpus_id", "band", "bhash"),
        Seq("band", "bhash"))
      .select(col("batch_id"), col("corpus_id"))
      .distinct()
    Caching.materializeAndRelease(
      cand
        .join(fresh.select(col("doc_id").as("batch_id"), col("hs").as("hs_a")), Seq("batch_id"))
        .join(corpus.select(col("doc_id").as("corpus_id"), col("hs").as("hs_b")), Seq("corpus_id"))
        .select(col("batch_id"), col("corpus_id"),
          round(Dedup.jaccardSorted(col("hs_a"), col("hs_b")), 4).as("jaccard"))
        .filter(col("jaccard") >= threshold),
      (Seq(fresh) ++ (if (indexWasCached) Nil else Seq(corpus))): _*)
  }
}
