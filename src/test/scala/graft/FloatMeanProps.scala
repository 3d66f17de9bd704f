package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property probes for the ledger's FLOAT-PRECEDENT class (r16 verdict
  * #5): WHERE does `round(avg(x), 4)` stop absorbing summation order?
  * The ledger's claim is that the q42-class sites are safe because their
  * inputs are (a) continuous and (b) bounded — these probes pin both
  * invariants by showing absorption holds with them and FAILS without
  * either one. Pure JVM-double arithmetic: the question is about IEEE
  * summation order, not Spark. */
class FloatMeanProps extends AnyFunSuite {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The summation orders an engine might use: sequential fold, reversed
    * fold, and a pairwise tree (Spark's partial-aggregation shape). */
  private def sums(vs: Array[Double]): Seq[Double] = {
    def pairwise(lo: Int, hi: Int): Double =
      if (hi - lo == 1) vs(lo)
      else { val mid = (lo + hi) / 2; pairwise(lo, mid) + pairwise(mid, hi) }
    Seq(vs.foldLeft(0.0)(_ + _), vs.reverse.foldLeft(0.0)(_ + _),
      pairwise(0, vs.length))
  }

  test("continuous bounded components: round-4 mean is order-invariant (500 trials)") {
    val rnd = new scala.util.Random(421742)
    for (trial <- 0 until 500) {
      val n = 2 + rnd.nextInt(4095)
      val vs = Array.fill(n)(rnd.nextDouble() * 2 - 1) // the [-1,1] invariant
      val means = sums(vs).map(s => round4(s / n)).distinct
      assert(means.size == 1,
        s"trial $trial (n=$n): summation order changed the round-4 mean: $means")
    }
  }

  test("magnitude-spread inputs break absorption: the bounded-components invariant is load-bearing") {
    // elements spanning ~2^53 in magnitude: the small addends vanish or
    // survive depending on WHEN the large ones cancel — order dependence
    // far beyond what round-4 absorbs (seq/pairwise sum 3.0, reversed 4.0)
    val vs = Array(1.0e16, -1.0e16, 1.0, 1.0, 1.0)
    val means = sums(vs).map(s => round4(s / vs.length)).distinct
    assert(means.size > 1,
      s"expected an order-dependent round-4 mean for magnitude-spread inputs, got $means")
  }

  test("rounded-4 inputs on a .00005 boundary: float avg disagrees with HALF_UP; mean4's algebra never does") {
    // the q171 trap from the float side: values that are exact multiples
    // of 1e-4 whose true mean sits exactly ON the rounding boundary.
    // Probe many such multisets; at least one must show float division
    // landing on the wrong side of HALF_UP — the reason rounded-4 INPUT
    // means go through ExactMean.mean4, never round(avg(x), 4).
    val rnd = new scala.util.Random(171171)
    var floatDisagreed = false
    for (_ <- 0 until 2000) {
      val n = 2 * (1 + rnd.nextInt(15)) // even n => k + 0.5 means reachable
      // integer ten-thousandths summing to a half-integer multiple of n
      val base = Array.fill(n)(rnd.nextInt(20000).toLong)
      val rem = (base.sum % n, n / 2)
      val ints = base.updated(0, base(0) + ((n + rem._2 - rem._1) % n))
      assert(ints.sum % n == n / 2 || n == 1) // true mean ends in .5 ten-thousandths
      val exactHalfUp = // HALF_UP on the exact rational mean, ×1e-4
        ((2 * ints.sum + n) / (2 * n)) / 10000.0
      val vs = ints.map(_ / 10000.0)
      for (s <- sums(vs.toArray)) {
        val f = round4(s / n)
        if (f != exactHalfUp) floatDisagreed = true
      }
      // the mean4 algebra on the same inputs: integer half-up division
      // over the re-scaled values — invariant by construction
      val viaMean4 = ((2 * ints.map(v => math.round(v / 10000.0 * 10000.0)).sum + n)
        / (2 * n)) / 10000.0
      assert(viaMean4 == exactHalfUp)
    }
    assert(floatDisagreed,
      "expected at least one boundary multiset where round(avg) misses HALF_UP " +
        "— if this stops reproducing, the mean4 rationale needs re-verification")
  }
}
