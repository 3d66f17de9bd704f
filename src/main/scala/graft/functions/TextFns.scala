package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / tokenization / fingerprinting scalars
  * (SURVEY C4/C5 + north-star text analysis).
  *
  * Built-in expressions wherever they stay fast — codegen'd, inside
  * WholeStageCodegen, vectorized over the parquet scan. The one exception
  * is the winnowing kernel, where nested array HOFs go quadratic in the
  * interpreted evaluator (see its doc).
  */
object TextFns {

  /** Whitespace-normalize: collapse runs to single spaces, then trim
    * (reference `" ".join(text.split())`, htmlConverter.py:38). Collapse
    * must come first: Spark `trim` strips only 0x20, so a leading tab would
    * otherwise survive as a space. */
  def normText(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  private val WsRun = java.util.regex.Pattern.compile("\\s+")

  /** The JVM twin of [[normText]] for kernel/UDF code paths (the winnow
    * SQL registration, the streaming boilerplate scrub): collapse \s+
    * runs, strip the single boundary space the collapse can leave —
    * byte-identical to the Column form on every input. ONE shared copy:
    * a drifted hand-rolled twin silently breaks the stream/batch
    * row-equality contracts that build on it. Pattern precompiled — this
    * runs once per document on ingest hot paths. */
  def normTextJvm(s: String): String =
    WsRun.matcher(s).replaceAll(" ").stripPrefix(" ").stripSuffix(" ")

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

  /** BPE-style pre-tokenization pattern (north-star "whitespace + a BPE-ish
    * regex"): the GPT-2 pre-tokenizer shape — contraction suffixes, then
    * optionally space-prefixed letter runs, digit runs, and punctuation
    * runs. No lookahead (kept RE2-compatible so the DuckDB oracle runs the
    * identical pattern); stray whitespace is simply unmatched. */
  val BpePattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""

  /** All BPE-style pre-tokens of the raw text. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(BpePattern), lit(0))

  /** Winnowing fingerprint (the rolling-hash document fingerprint of the
    * north-star list, per Schleimer/Wilkerson/Aiken's MOSS): hash every
    * k-char gram of the normalized text, take the MINIMUM hash in each
    * sliding window of w consecutive grams, dedupe. Any shared substring of
    * length ≥ k+w-1 between two documents yields at least one shared
    * fingerprint — the chunk-granular near-dup primitive. md5 (not
    * xxhash64) so the DuckDB oracle reproduces values exactly.
    *
    * Deliberately a one-pass JVM kernel, NOT nested transform() expressions:
    * an inner HOF lambda referencing the gram-array expression re-evaluates
    * the whole array per window in the interpreted evaluator — O(n²) md5
    * calls per document (measured as a multi-minute hang at sf0.01; the
    * round-1 HOF-vs-kernel trap again). Gram slicing is by CODE POINT to
    * match Spark/DuckDB character semantics, not UTF-16 units. */
  def winnowedFingerprints(c: Column, k: Int = 8, w: Int = 4): Column = {
    val kernel: org.apache.spark.sql.expressions.UserDefinedFunction =
      udf(winnowKernelFn(k, w))
    kernel(normText(c))
  }

  /** The winnow kernel on a PRE-NORMALIZED string (the SQL registration in
    * GraftExtensions wraps it with the JVM twin of normText). */
  private[graft] def winnowKernelFn(k: Int, w: Int): String => Array[String] = {
    (s: String) =>
      if (s == null) null
      else {
        // per-code-point byte offsets into the UTF-8 encoding: gram i is the
        // byte range [off(i), off(i+k)) — no per-gram string materialization
        val utf8 = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val nCps = s.codePointCount(0, s.length)
        if (nCps < k + w - 1) Array.empty[String]
        else {
          val off = new Array[Int](nCps + 1)
          var ci = 0 // char index (UTF-16)
          var bi = 0 // byte index (UTF-8)
          var p = 0  // code point index
          while (p < nCps) {
            off(p) = bi
            val cp = s.codePointAt(ci)
            ci += Character.charCount(cp)
            bi += (if (cp < 0x80) 1 else if (cp < 0x800) 2 else if (cp < 0x10000) 3 else 4)
            p += 1
          }
          off(nCps) = bi
          val md = java.security.MessageDigest.getInstance("MD5")
          val hexDigits = "0123456789abcdef".toCharArray
          val nGrams = nCps - k + 1
          val grams = new Array[String](nGrams)
          var i = 0
          while (i < nGrams) {
            md.update(utf8, off(i), off(i + k) - off(i))
            val digest = md.digest() // digest() resets the instance
            val hex = new Array[Char](32)
            var b = 0
            while (b < 16) {
              val v = digest(b) & 0xff
              hex(2 * b) = hexDigits(v >>> 4)
              hex(2 * b + 1) = hexDigits(v & 15)
              b += 1
            }
            grams(i) = new String(hex)
            i += 1
          }
          // sliding min per window of w, deduped (order is irrelevant to
          // consumers: counts, mins, and set intersections only)
          val out = scala.collection.mutable.LinkedHashSet.empty[String]
          var j = 0
          while (j + w <= nGrams) {
            var m = grams(j)
            var x = j + 1
            while (x < j + w) { if (grams(x) < m) m = grams(x); x += 1 }
            out += m
            j += 1
          }
          out.toArray
        }
      }
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

  /** Distinct word n-gram hashes in one JVM kernel pass: FNV-1a over the
    * token window with a space folded after each token (so the hash equals
    * FNV-1a of the space-joined shingle + trailing space — the q69
    * construction). Sorted-dedup in place; no gram string is ever
    * materialized, so the downstream shuffle key is (doc_id, 8 bytes).
    * A collision would merge two gram counts — vanishing at 64 bits, and
    * the string-exact oracles on its call sites would catch one loudly.
    * Input must already be normText'd (single-space tokens). */
  def distinctGramHashKernel(n: Int): String => Array[Long] = { s =>
    if (s == null) Array.empty[Long]
    else {
      val toks = s.split(' ')
      if (toks.length < n) Array.empty[Long]
      else {
        val m = toks.length - (n - 1)
        val hs = new Array[Long](m)
        var i = 0
        while (i < m) {
          var h = 0xcbf29ce484222325L
          var j = i
          while (j < i + n) {
            val t = toks(j)
            var c = 0
            while (c < t.length) { h ^= t.charAt(c); h *= 0x100000001b3L; c += 1 }
            h ^= ' '.toInt; h *= 0x100000001b3L
            j += 1
          }
          hs(i) = h
          i += 1
        }
        java.util.Arrays.sort(hs)
        // dedup the sorted hashes in place
        var w = 0
        var r = 0
        while (r < m) {
          if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(hs, w)
      }
    }
  }

  /** Column form of [[distinctGramHashKernel]]. */
  def distinctGramHashes(c: Column, n: Int): Column = {
    val kernel = org.apache.spark.sql.functions.udf(distinctGramHashKernel(n))
    kernel(normText(c))
  }
}
