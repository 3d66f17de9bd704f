package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed BPE tokenizer TRAINING — the missing half of the engine's
  * tokenizer stack (q65 applies a fixed BPE-style segmentation; q113
  * reports its economics; this LEARNS the merge table those consume).
  *
  * Classic byte-pair encoding (Sennrich et al. 2016) trains on the WORD
  * FREQUENCY table, not the corpus: each vocabulary word is a symbol
  * sequence (initially characters), and each round merges the
  * highest-weighted adjacent symbol pair. The engine shape follows that
  * structure exactly:
  *
  *   - ONE corpus pass builds the (word, count) table — the only
  *     corpus-sized job; everything after runs over the VOCABULARY, which
  *     is Zipf-bounded (orders of magnitude smaller than the corpus and
  *     sublinear in it).
  *   - Each merge round is a pair-count aggregation over the vocab table
  *     (map-side combined) plus a 1-ROW `TakeOrdered` collect (the argmax
  *     pair — driver state is the merge list, nMerges rows, never data).
  *   - The merge applies as a narrow map kernel; every `ckptEvery` rounds
  *     the state localCheckpoints so the lineage (and the replanning cost)
  *     stays O(ckptEvery) instead of O(rounds).
  *
  * At 100 TB the corpus pass dominates and parallelizes trivially; the
  * loop's per-round cost follows the vocabulary, exactly like the
  * reference implementations running on one machine over a counted vocab
  * — except the vocab here may itself be sharded.
  *
  * Pair keys are a two-field STRUCT (a, b), never a concatenated string:
  * a separator-joined key is ambiguous the moment a symbol can contain
  * the separator, and [[wordCounts]] additionally strips control
  * characters (whitespace-collapse alone does not exclude them) so the
  * oracle's separator-framed replay representation is collision-free too.
  * Symbols are UTF-16 code units on the engine side (Spark's `split`),
  * matching the corpus's BMP/ASCII contract (the same contract q124's
  * byte-length oracle relies on).
  *
  * The round-1 pair statistics are the certified q129 surface
  * ([[graft.ops.TextOps]] `q129PairStats`); the FULL merge table and the
  * trained segmentation are certified by q145 (DuckDB replays every merge
  * round over the exported merge list — see `TextOps.q145BpeSegment`).
  * `BpeTrainSpec` pins the loop to the textbook example and asserts
  * round-1 agreement with the query kernel. Ties break (weight desc,
  * (a, b) asc) so training is deterministic on any engine.
  */
object BpeTrain {

  /** The (word, count) base table: the single corpus-sized pass. Control
    * characters are stripped (they survive whitespace collapse but would
    * poison separator-framed replay representations downstream — and no
    * tokenizer vocabulary wants them as symbols). */
  private[graft] def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TextFns.tokens(col("text"))).as("w0"))
      .select(regexp_replace(col("w0"), "[\\x00-\\x1f]", "").as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Adjacent symbol pairs of the current sequences, weighted by word
    * count: zip_with over the two shifted slices keeps the whole pair
    * generation inside SQL HOFs (no per-row UDF allocation). Keys are
    * (a, b) structs — unambiguous for any symbol content. */
  private def pairWeights(state: DataFrame): DataFrame =
    state
      .select(explode(expr(
        "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1)," +
          " (a, b) -> struct(a, b))")).as("pair"), col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("weight"))

  /** ONE merge pass over one symbol sequence: collapse every
    * left-to-right occurrence of (a, b) adjacent into the single symbol
    * a+b — the standard greedy scan (a merged symbol does not re-pair
    * with the following symbol within the same pass). The single copy of
    * the kernel: the distributed UDF and the driver-side [[segment]] both
    * call it, so train-side and apply-side semantics cannot drift. */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private[graft] val applyMergeUdf = udf { (syms: Seq[String], a: String, b: String) =>
    applyMerge(syms, a, b)
  }

  /** Learn `nMerges` merges from a (doc_id, text) frame. Returns the
    * ordered merge list; stops early when no pair repeats (weight < 2 —
    * merging a unique pair buys nothing). */
  def fit(docs: DataFrame, nMerges: Int, ckptEvery: Int = 8): Seq[(String, String)] = {
    var state = wordCounts(docs)
      .select(expr("filter(split(w, ''), s -> s <> '')").as("syms"), col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val top = pairWeights(state)
        .orderBy(col("weight").desc, col("pair.a"), col("pair.b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) < 2L) done = true
      else {
        val pair = top(0).getStruct(0)
        val (a, b) = (pair.getString(0), pair.getString(1))
        merges += ((a, b))
        state = state.select(applyMergeUdf(col("syms"), lit(a), lit(b)).as("syms"), col("n"))
        round += 1
        if (round % ckptEvery == 0) state = state.localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Code-point symbols of a word — the JVM twin of the SQL-side
    * `split(w, '')` init at [[fit]] (which Spark evaluates per CODE
    * POINT, verified against a supplementary-plane probe) and of the
    * oracle's RE2 `(.)` framing. `String.split("")` is NOT that: it
    * yields UTF-16 units, shearing a supplementary-plane character into
    * two lone surrogates — a silent engine/oracle desync on any corpus
    * with astral content (the r13 verdict's predicted failure class,
    * reproduced in FunctionsSpec before this fix). */
  private[graft] def codePointSyms(word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Tokenize a word with a learned merge list (the apply side — unit
    * parity surface: training then applying must reproduce the training
    * corpus segmentation). Same kernel as the training UDF, folded. */
  def segment(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(codePointSyms(word)) {
      case (syms, (a, b)) => applyMerge(syms, a, b)
    }

  /** Greedy longest-prefix-match segmentation — the WordPiece INFERENCE
    * rule (Wu et al. 2016; the `tokenizers` WordPiece model's algorithm)
    * applied against an arbitrary symbol vocabulary: at each position
    * take the longest vocab entry that prefixes the remaining suffix,
    * emit it, advance. Codepoint-based throughout (prefix lengths are
    * counted in codepoints, so an astral symbol can never be sheared —
    * the [[codePointSyms]] contract). A codepoint absent from the vocab
    * is emitted as its own symbol (can't happen when the vocab contains
    * the corpus charset, which [[graft.ops.TextOps]]'s q167 guarantees
    * by construction). `maxLen` is the longest vocab entry in
    * codepoints — pass it precomputed so per-word work is
    * O(len · maxLen), not O(len · |vocab|). */
  def maxMatch(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
    val syms = codePointSyms(word)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      var l = math.max(1, math.min(maxLen, syms.length - i))
      while (l > 1 && !vocab.contains(syms.slice(i, i + l).mkString)) l -= 1
      out += syms.slice(i, i + l).mkString
      i += l
    }
    out.result()
  }
}
