package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the engine that turns pairwise dedup output (near-duplicate PAIRS) into
  * per-document canonical keep-ids (q56/q74/q79), exposed as a reusable
  * operator for any (src, dst) edge set with 64-bit vertex ids.
  *
  * Each iteration is one shuffle join + aggregation over the edge set
  * (self-loops folded in, so no second labels join). If the graph has not
  * converged after maxIter/2 rounds — adversarially deep structure — the
  * remaining rounds add a pointer-jumping label-compression join
  * (label := label(label)); on chain-shaped components that doubles covered
  * distance per round (a 100-vertex chain: 100 plain rounds → converges by
  * round 9 with the adaptive schedule, pinned in ConnectedComponentsSpec).
  * Jumping is NOT free (an extra shuffle per round) and does not help
  * graphs bound by the min vertex's eccentricity — measured on q74's
  * ≥0.4-cosine graph at sf0.1 (920 edges, 11 rounds plain AND jumped,
  * bench 6.0 s plain vs 10.8 s always-jumped) — hence adaptive, not
  * unconditional. A graph still unconverged at maxIter throws instead of
  * silently returning truncated components.
  *
  * The driver carries only a convergence scalar, never data: labels only
  * ever decrease under min-propagation (and under jumping — label(x) ≤ x),
  * so the label SUM (as decimal(38,0) — a Long sum over hashed 64-bit ids
  * could overflow) is a strictly-monotone convergence witness. */
object ConnectedComponents {

  /** `pairs` must have two long columns (first = one endpoint, second = the
    * other; undirected). Returns (vertex, label) where label = min vertex
    * id of the component. Throws if `maxIter` rounds do not converge. */
  def run(pairs: DataFrame, maxIter: Int = 20, verbose: Boolean = false): DataFrame = {
    val Seq(aCol, bCol) = pairs.columns.toSeq.take(2).map(col)
    val p = pairs.select(aCol.as("a"), bCol.as("b")).cache()
    val vertices = p.select(col("a").as("v"))
      .unionByName(p.select(col("b").as("v"))).distinct()
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .unionByName(vertices.select(col("v").as("src"), col("v").as("dst")))
      .cache()
    // localCheckpoint, NOT cache: each iteration joins against the previous
    // result, so a cache-only loop GROWS the logical plan every round —
    // re-analysis goes quadratic and deep graphs (30+ iterations) OOM the
    // driver building plan strings. The eager checkpoint truncates lineage
    // to the materialized blocks; at production scale swap for a reliable
    // checkpoint dir if executor loss must be recoverable mid-computation.
    var labels = vertices.select(col("v").as("vertex"), col("v").as("label"))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    val jumpAfter = math.max(1, maxIter / 2)
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("vertex", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("vertex"))
        .agg(min(col("label")).as("label"))
      val stepped =
        if (iter < jumpAfter) propagated
        else {
          // pointer jump: label := label(label). Every label value is itself
          // a vertex with a row, and label(x) ≤ x, so the jump only ever
          // decreases labels. Renamed projection, NOT .as() aliases — a
          // same-lineage self-join resolves aliased columns back to the SAME
          // attribute ids and the jump silently degrades to identity
          // (observed: iteration counts unchanged until rewritten this way).
          val lookup = propagated.select(col("vertex").as("jv"), col("label").as("jl"))
          propagated.join(lookup, col("label") === col("jv"))
            .select(col("vertex"), col("jl").as("label"))
        }
      val next = stepped.localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
      if (verbose) System.err.println(f"[cc] iter $iter done (converged=$converged)")
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter; silent truncation would mislabel components")
    labels
  }
}
