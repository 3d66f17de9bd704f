package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / tokenization / fingerprinting scalars
  * (SURVEY C4/C5 + north-star text analysis).
  *
  * All pure built-in expressions — codegen'd, no UDFs, so they stay inside
  * WholeStageCodegen and vectorize over the parquet scan.
  */
object TextFns {

  /** Whitespace-normalize: collapse runs to single spaces, then trim
    * (reference `" ".join(text.split())`, htmlConverter.py:38). Collapse
    * must come first: Spark `trim` strips only 0x20, so a leading tab would
    * otherwise survive as a space. */
  def normText(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Content fingerprint of the normalized text (engine M6 dedup key).
    * md5 chosen for cross-engine oracle parity; xxhash64 is the cheaper
    * in-plan alternative when no oracle is needed. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Character n-gram shingles of the normalized text (dedup/minhash input).
    * Implemented with sequence+transform — stays in codegen, no UDF.
    * Texts shorter than n chars yield an empty array. */
  def charShingles(c: Column, n: Int): Column = {
    val s = normText(c)
    when(length(s) >= n,
      array_distinct(transform(
        sequence(lit(0), length(s) - n),
        i => s.substr(i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Word n-gram shingles joined by single spaces. Texts with fewer than n
    * tokens yield an empty array (no partial shingles). */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }
}
