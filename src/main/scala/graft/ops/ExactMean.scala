package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The shared EXACT-MEAN idiom for averaging already-rounded-4 scores
  * (r14 verdict #1/#2 — the q171 boundary trap).
  *
  * Averaging values that were themselves rounded to 4 decimals lands the
  * true decimal mean exactly ON a .00005 rounding boundary with ~10 %
  * probability per cell (the inputs are integer ten-thousandths, so the
  * mean is a rational with a small denominator). At that boundary,
  * `round(avg(x), 4)` is decided by FLOAT SUMMATION ORDER — Spark's
  * partial-aggregation tree and DuckDB's sequential fold land on opposite
  * sides of the half (judge repro on q171: spark 3.3696 vs duck 3.3697
  * from a true mean of exactly 3.36965), so certification was a coin
  * flip on data. The fix is to do the whole computation in EXACT integer
  * arithmetic: the inputs are integer-valued ×10⁴ by construction, so
  *
  *   mean4(v) = halfUp(Σ round(v·10⁴) / n) / 10⁴
  *
  * where the half-up division is the pure-integer
  * `(2·|s| + n) div (2·n)` (integral division on a decimal(38,0) /
  * HUGEINT accumulator) with the sign reapplied — no float enters the
  * rounding path at ANY group size, so the result is identical on any
  * engine and any aggregation order. Matches `round(avg(v), 4)` semantics exactly
  * (HALF_UP away from zero, the Spark/DuckDB `round` contract), returns
  * 0.0 over an empty/all-null input (the q151 empty-branch discipline).
  *
  * Used by the whole funnel family — q151, q157, q160, q163, q168, q171
  * — on BOTH the engine side ([[mean4]]) and the DuckDB-oracle side
  * ([[mean4Sql]]): one algebra, two renderings.
  *
  * Also correct for 0/1 indicator shares (q160's tercile/gate shares):
  * round(ind·10⁴) is exactly 0 or 10⁴, so mean4 computes the exactly-
  * rounded share k/n with no float division in the rounding path.
  *
  * ==The EXACTNESS LEDGER (r16 verdict #5)==
  *
  * Every mean/avg site in main, by exactness class. The classes are
  * enforced by convention: any `avg(` on a non-oracle line outside this
  * file must carry a same-line `// float-mean: <class>` marker —
  * `ExactnessLedgerSpec` sweeps the source tree and fails on an
  * unmarked site, so a new float mean cannot land unclassified.
  * (Oracle-SQL renderings — stripMargin lines starting with `|` —
  * mirror the engine side and are certified by the oracle gate itself.)
  *
  * '''exact''' — every call site of [[mean4]] / [[meanInt]] /
  * [[sumScaled4]] (and their SQL twins): the funnel/report family
  * (q151, q157, q160, q163, q168, q171, q194, q196, q198, q199, q204,
  * q205, q206, …) and q01's money sums/means. Integer or ×10⁴
  * arithmetic end-to-end; identical on any engine at any group size.
  *
  * '''float-precedent''' (`// float-mean: precedent`) — `round(avg(x),
  * 4)` over CONTINUOUS embedding components (|x| ≤ 1 by the unit-norm /
  * bounded-feature invariants); the q42 certification precedent, also
  * q182 (`Similarity.diversityOf`), q203 (label/global component
  * means), q155's doc-vector pooling (`ops/Ml`), q184's source
  * diversity fold (`ops/Ml`). Order-dependent in the last ulps; round-4
  * absorbs it because the mean error of summing n bounded components is
  * ≲ n·ε — at the oracle's scale ≈ 1e-12, and even at 1e9-row groups
  * ≈ 1e-7 against a 5e-5 boundary half-width (a <0.2 % worst-case
  * boundary-hit probability, vs ~10 % for rounded-4 INPUTS, which is
  * why that face uses [[mean4]]). These cannot use ExactMean without
  * changing semantics: the inputs are full-precision doubles, so there
  * is no exact integer representation to accumulate.
  * `FloatMeanProps` probes the absorption limits: continuous bounded
  * inputs never flip under reordering; magnitude-spread inputs (ratio
  * ≳ 2⁵³) and exact-boundary rounded inputs do — the two invariants
  * (bounded components, continuous values) are what the precedent
  * leans on.
  *
  * '''float-intermediate''' (`// float-mean: intermediate`) — `avgdl`
  * in the BM25 kernels (`ops/Scoring` q84/q131, `ops/InvertedIndex`
  * q93): an UNROUNDED scalar feeding the same downstream float formula
  * on both engines; certification happens at the downstream round-4
  * score. The sum of token counts stays under 2⁵³ out to ~10¹⁵ tokens
  * (beyond a 100 TB corpus), so the double accumulator is exact-ish in
  * the regime that matters and both engines share the identical value.
  *
  * '''diagnostic''' (`// float-mean: diagnostic`) — `tools/ScaleSmoke`
  * cell-balance readout; printed telemetry, not a certified surface.
  *
  * '''rows-only by design''' — q62/q80 (randomized sketches, no
  * deterministic cross-engine value; ±5 %-error-bound units instead).
  */
object ExactMean {

  /** `round(avg(v), 4)` over already-rounded-4 (or 0/1-indicator) values,
    * computed in exact integer arithmetic; 0.0 when no non-null input.
    * Null-skipping like `avg`: wrap conditional means as
    * `mean4(when(cond, v))`. */
  def mean4(v: Column): Column = {
    // decimal(38,0) accumulation (DuckDB: HUGEINT) so a corpus-scale sum
    // of ×10⁴ values never leaves exact range, and INTEGRAL division for
    // the half-up quotient — floor() over a double quotient loses the
    // exact-half boundary once 1/(2n) falls under half an ulp
    // (multi-billion-row groups; r15 ADVICE) — so the claim "identical
    // on any engine and any aggregation order" holds with no n bound
    val s = sum(round(v * lit(10000), 0).cast("decimal(38,0)"))
    val n = count(v)
    // half-up(|s|/n) in pure integers; sign reapplied = away-from-zero
    val q = call_function("div", lit(2) * abs(s) + n, lit(2) * n)
    coalesce(when(s < 0, -q).otherwise(q) / lit(10000.0), lit(0.0))
  }

  /** The identical algebra as DuckDB SQL text, for the oracle CTEs.
    * `e` is any expression (wrap conditional means as
    * `CASE WHEN cond THEN v END`). */
  def mean4Sql(e: String): String = {
    val s = s"sum(CAST(round(($e) * 10000) AS HUGEINT))"
    val n = s"count($e)"
    s"coalesce((CASE WHEN $s < 0 THEN -((-2 * $s + $n) // (2 * $n)) " +
      s"ELSE ((2 * $s + $n) // (2 * $n)) END) / 10000.0, 0.0)"
  }

  /** `round(avg(v), scale)` over INTEGER-valued inputs — the integer
    * face of the q171 trap (r15 verdict #5): corpus-scale char/token
    * sums exceed 2⁵³, where `avg`'s double accumulator loses ulps and
    * the rounded mean becomes accumulation-order-dependent. Here the sum
    * accumulates as decimal(38,0) (DuckDB: HUGEINT) and the half-up
    * rounding is the pure-integer `(2·|s|·10ˢᶜ + n) div (2·n)` — `div`
    * is integral division, so no float enters the ROUNDING path at any
    * group size. The final rendering `q → double → /10ˢᶜ` is the same
    * two IEEE steps on both engines, so cross-engine parity holds
    * unconditionally; the double is additionally the exactly-rounded
    * mean while mean·10ˢᶜ stays under 2⁵³ (always, for human-scale
    * means — only the SUM grows with the corpus). NULL over an empty /
    * all-null input, matching `round(avg(v), scale)`. */
  def meanInt(v: Column, scale: Int): Column = {
    val p = math.round(math.pow(10, scale.toDouble))
    val s = sum(v.cast("decimal(38,0)"))
    val n = count(v)
    val q = call_function("div",
      lit(2) * abs(s) * lit(p) + n, lit(2) * n)
    when(s < 0, -q).otherwise(q) / lit(p.toDouble)
  }

  /** The identical algebra as DuckDB SQL text (HUGEINT accumulation,
    * `//` integral division). */
  def meanIntSql(e: String, scale: Int): String = {
    val p = math.round(math.pow(10, scale.toDouble))
    val s = s"sum(CAST($e AS HUGEINT))"
    val n = s"count($e)"
    s"((CASE WHEN $s < 0 THEN -((-2 * $s * $p + $n) // (2 * $n)) " +
      s"ELSE (2 * $s * $p + $n) // (2 * $n) END) / $p.0)"
  }

  /** Σv as an EXACT ×10⁴ integer for inputs that are exact ≤4-decimal
    * values (prices, rates, event amounts) — the SUM face of the same
    * trap: a float sum of 2-dp values is accumulation-order-dependent,
    * so `round(sum(v), 2)` on a .005-boundary cell is the q171 coin
    * flip again. Decimal(38,0) accumulation (DuckDB: HUGEINT) so the
    * corpus-scale sum never overflows a long. */
  def sumScaled4(v: Column): Column =
    sum(round(v * lit(10000), 0).cast("decimal(38,0)"))

  def sumScaled4Sql(e: String): String =
    s"sum(CAST(round(($e) * 10000) AS HUGEINT))"

  /** `round(sum(v), scale)` over exact ≤4-decimal inputs, computed via
    * [[sumScaled4]] — both engines divide the identical integer once,
    * so the rounding input is the same double everywhere. NULL over an
    * empty/all-null input, matching `round(sum(v), scale)`. */
  def sum4(v: Column, scale: Int): Column =
    round(sumScaled4(v).cast("double") / lit(10000.0), scale)

  def sum4Sql(e: String, scale: Int): String =
    s"round(CAST(${sumScaled4Sql(e)} AS DOUBLE) / 10000.0, $scale)"
}
