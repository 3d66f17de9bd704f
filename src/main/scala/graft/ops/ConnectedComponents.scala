package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the engine that turns pairwise dedup output (near-duplicate PAIRS) into
  * per-document canonical keep-ids (q56), exposed as a reusable operator
  * for any (src, dst) edge set with 64-bit vertex ids.
  *
  * Each iteration is ONE shuffle join + ONE aggregation over the edge set
  * (self-loops folded in, so no second labels join); iterations are bounded
  * by the component diameter — tiny for dedup graphs, `maxIter`-capped for
  * adversarial ones. The driver carries only a convergence scalar, never
  * data: labels only ever decrease under min-propagation, so the label SUM
  * (as decimal(38,0) — a Long sum over hashed 64-bit ids could overflow)
  * is a strictly-monotone convergence witness. */
object ConnectedComponents {

  /** `pairs` must have two long columns (first = one endpoint, second = the
    * other; undirected). Returns (vertex, label) where label = min vertex
    * id of the component. */
  def run(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
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
      val next = edges
        .join(labels.withColumnRenamed("vertex", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("vertex"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    labels
  }
}
