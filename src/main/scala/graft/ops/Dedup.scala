package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns

/** Fuzzy-deduplication operator surface (north-star M6/M7: the dedup family
  * a pretraining-data pipeline runs before training — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard).
  *
  * Scale design: every variant is generate-candidates → verify, where
  * candidate generation is a hash-bucket equi-join (shuffle on the bucket
  * key, linear in corpus size) and verification touches only candidate
  * pairs. Nothing here is O(n²) at 100 TB — the brute-force pair scan
  * exists only inside the DuckDB oracle, which is the point: LSH recall is
  * checked against exhaustive truth at test scale, then the same plan runs
  * at data scale.
  */
object Dedup {
  import Relational.Q

  private val NumHashes = 32
  private val Bands = 16   // 16 bands x 2 rows of the 32-hash signature
  private val RowsPerBand = NumHashes / Bands

  /** (doc_id, shingles) with distinct word-trigram shingles. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextFns.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** MinHash signature: sig_i = min over shingles of xxhash64(shingle, i).
    * Pure codegen'd expressions — the signature is computed in one narrow
    * pass over the scan, no model fit, no shuffle. */
  private def minhashSig: Column =
    array((0 until NumHashes).map(i =>
      array_min(transform(col("sh"), x => xxhash64(x, lit(i))))): _*)

  /** MinHash+LSH near-duplicate pairs (M7). Candidates: equal band-hash in
    * any of the 16 bands (2-row bands → P(candidate) = 1-(1-s²)¹⁶, ≈1 for
    * s ≥ 0.8). Verification: exact trigram Jaccard ≥ 0.8 on the pair.
    * Output is therefore exactly the ≥0.8-Jaccard pairs as long as LSH
    * recall is 1 — which the oracle's exhaustive scan certifies at sf. */
  val q38MinhashDedup: Q = (s, d) => {
    val docs = shingled(s, d).withColumn("sig", minhashSig)
    val bands = docs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map { j =>
        xxhash64((lit(j) +: (0 until RowsPerBand).map(r =>
          element_at(col("sig"), j * RowsPerBand + r + 1))): _*)
      }: _*)).as(Seq("band", "bhash")))
      .select(col("doc_id"), col("band"), col("bhash"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sh = shingled(s, d)
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Blocked n-gram Jaccard dedup: exact pairwise Jaccard within a blocking
    * key (lang, length bucket). The block join is an equi-join — at 100 TB
    * the block key bounds each bucket's pair count; the oracle mirrors the
    * same blocking so results match exactly. */
  val q39NgramJaccard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 100).cast("long").as("bucket"),
        TextFns.wordShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    docs.as("x").join(docs.as("y"),
        col("x.lang") === col("y.lang") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        round(jaccard(col("x.sh"), col("y.sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val SimBits = 48
  private val SimBands = 4          // 4 bands x 12 bits: recall=1 for Hamming<=3
  private val SimBandBits = SimBits / SimBands

  /** 48-bit SimHash from whitespace tokens: per-bit majority vote of
    * per-token pseudo-random signs (xxhash64(token, bit) parity). Pure
    * expressions with an array accumulator — one narrow pass. */
  private def simhashBits(tokens: Column): Column = {
    val perToken = transform(tokens, t =>
      transform(sequence(lit(0), lit(SimBits - 1)), k =>
        when(pmod(xxhash64(t, k), lit(2)) === 0, lit(-1L)).otherwise(lit(1L))))
    val counts = aggregate(perToken,
      array_repeat(lit(0L), SimBits),
      (acc, arr) => zip_with(acc, arr, (a, b) => a + b))
    transform(counts, c => when(c > 0, lit(1L)).otherwise(lit(0L)))
  }

  private def packBits(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)

  /** SimHash near-duplicate pairs: candidates share at least one of 4
    * 12-bit bands (pigeonhole: guarantees recall for Hamming ≤ 3);
    * verification keeps Hamming ≤ 3. Features are word-trigram shingles —
    * unigram tokens are too shared across a same-domain corpus to separate
    * near-dups from topic-mates. No SQL oracle (engine-specific hash) —
    * precision/recall vs the Jaccard truth set is unit-tested instead. */
  val q40SimhashDedup: Q = (s, d) => {
    val docs = shingled(s, d)
      .select(col("doc_id"), col("sh").as("toks"))
      .withColumn("bits", simhashBits(col("toks")))
      .withColumn("simhash", packBits(col("bits")))
    val bands = docs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until SimBands).map(j =>
        packBits(slice(col("bits"), j * SimBandBits + 1, SimBandBits))): _*))
        .as(Seq("band", "bhash")))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def queries: Map[String, Q] = Map(
    "q38_minhash_dedup" -> q38MinhashDedup,
    "q39_ngram_jaccard" -> q39NgramJaccard,
    "q40_simhash_dedup" -> q40SimhashDedup,
  )

  /** DuckDB word-trigram shingle expression (mirrors TextFns.wordShingles). */
  private val DuckShingles =
    """list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |               for i in range(1, greatest(len(toks) - 1, 1))])""".stripMargin

  def oracle: Map[String, String] = Map(
    // Exhaustive-truth oracle: every pair with trigram Jaccard >= 0.8.
    // Matches q38 iff LSH recall is 1 at this scale (certified by this check).
    "q38_minhash_dedup" ->
      s"""WITH t AS (
         |  SELECT doc_id, $DuckShingles AS sh
         |  FROM (SELECT doc_id, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
         |        FROM documents)
         |  WHERE len(toks) >= 3)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |        len(list_distinct(a.sh || b.sh)), 4) AS jaccard
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |      len(list_distinct(a.sh || b.sh)) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q39_ngram_jaccard" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, bucket, $DuckShingles AS sh
         |  FROM (SELECT doc_id, lang, n_chars // 100 AS bucket,
         |          string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
         |        FROM documents)
         |  WHERE len(toks) >= 3)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |          len(list_distinct(a.sh || b.sh)), 4) AS jaccard
         |  FROM t a JOIN t b
         |    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin,
  )
}
