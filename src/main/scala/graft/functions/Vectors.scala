package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector scalar functions over `ArrayType(FloatType)` columns
  * (SURVEY M1/M6-M8; reference embedding matrix semantics,
  * /root/reference/code/embeddings.py:79-123 — 384-dim float32 rows,
  * L2-normalized).
  *
  * Pure built-in higher-order functions (`zip_with`/`aggregate`) — codegen'd,
  * no UDF, no driver round-trips. All arithmetic is widened to double BEFORE
  * multiply/accumulate so results are bit-stable and engine-portable (float32
  * intermediate rounding would diverge from any double-math oracle).
  */
object Vectors {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ with double accumulation. */
  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; null-safe only for non-empty, equal-length inputs. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Squared Euclidean distance with double accumulation. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket: sign bits of dot products against
    * `nPlanes` pseudo-random hyperplanes derived deterministically from
    * (seed, plane, dimension) via a hash — no stored model, so the same
    * bucket function evaluates identically on any executor at any scale.
    * Returns a Long bit-pattern (nPlanes ≤ 63). */
  def hyperplaneBucket(v: Column, nPlanes: Int, seed: Int): Column = {
    require(nPlanes > 0 && nPlanes <= 63)
    val bits = (0 until nPlanes).map { p =>
      // plane component for dim i: hash(seed, p, i) mapped to [-1, 1)
      val proj = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
          val h = xxhash64(lit(seed), lit(p), i)
          val coef = (h % 1000000L).cast("double") / 1000000.0
          x.cast("double") * coef
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
