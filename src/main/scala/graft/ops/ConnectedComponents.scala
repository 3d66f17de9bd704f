package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the engine that turns pairwise dedup output (near-duplicate PAIRS) into
  * per-document canonical keep-ids (q56), exposed as a reusable operator
  * for any (src, dst) edge set with 64-bit vertex ids.
  *
  * Each iteration is one shuffle join + aggregation over the edge set
  * (self-loops folded in, so no second labels join) plus a pointer-jumping
  * label-compression join, bounding iterations by O(log path-distance) —
  * a handful of rounds even for adversarial snake-shaped components. The
  * driver carries only a convergence scalar, never
  * data: labels only ever decrease under min-propagation, so the label SUM
  * (as decimal(38,0) — a Long sum over hashed 64-bit ids could overflow)
  * is a strictly-monotone convergence witness. */
object ConnectedComponents {

  /** `pairs` must have two long columns (first = one endpoint, second = the
    * other; undirected). Returns (vertex, label) where label = min vertex
    * id of the component. */
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
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("vertex", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("vertex"))
        .agg(min(col("label")).as("label"))
      // pointer jumping: label := label(label). Every label value is itself
      // a vertex with a row (labels are always vertex ids and every vertex
      // keeps a row), and label(x) ≤ x under min-propagation, so the jump
      // only ever decreases labels — monotonicity and the sum witness are
      // preserved, but covered distance can DOUBLE per round (exactly so on
      // chain graphs): rounds drop from O(distance-to-min) toward O(log d).
      // This is what makes maxIter = 20 safe at any scale — plain
      // propagation silently truncates any component deeper than maxIter
      // (a 100-vertex chain needs 100 rounds; with jumping it converges in
      // 7, pinned by ConnectedComponentsSpec at maxIter = 9). q74's
      // ≥0.4-cosine graph at sf0.1 (920 edges, 268 components incl. a
      // large sparse one) converges in 11 rounds.
      // renamed projection, not .as() aliases: a same-lineage self-join
      // resolves aliased columns back to the SAME attribute ids and the
      // jump silently degrades to identity (observed: iteration counts
      // unchanged). Distinct column names make the lookup unambiguous.
      val lookup = propagated.select(col("vertex").as("jv"), col("label").as("jl"))
      val next = propagated.join(lookup, col("label") === col("jv"))
        .select(col("vertex"), col("jl").as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
      if (verbose) System.err.println(f"[cc] iter $iter done (converged=$converged)")
    }
    labels
  }
}
