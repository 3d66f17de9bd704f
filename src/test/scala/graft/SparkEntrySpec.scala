package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the per-module query maps merge with `++`,
  * so a duplicate key would SILENTLY shadow a query — assert disjointness,
  * and that every oracle row points at a registered query. */
class SparkEntrySpec extends AnyFunSuite {

  private val modules: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Relational", ops.Relational.queries, ops.Relational.oracle),
    ("SemiStructured", ops.SemiStructured.queries, ops.SemiStructured.oracle),
    ("TextOps", ops.TextOps.queries, ops.TextOps.oracle),
    ("Dedup", ops.Dedup.queries, ops.Dedup.oracle),
    ("Similarity", ops.Similarity.queries, ops.Similarity.oracle),
    ("Temporal", ops.Temporal.queries, ops.Temporal.oracle),
    ("Ml", ops.Ml.queries, ops.Ml.oracle),
    ("Multimodal", ops.Multimodal.queries, ops.Multimodal.oracle),
    ("Scoring", ops.Scoring.queries, ops.Scoring.oracle),
    ("Curation", ops.Curation.queries, ops.Curation.oracle),
    ("CorpusReports", ops.CorpusReports.queries, ops.CorpusReports.oracle),
    ("Bucketed", sources.Bucketed.queries, sources.Bucketed.oracle))

  test("no query key is defined by two modules (++ would shadow one)") {
    val all = modules.flatMap { case (m, qs, _) => qs.keys.map(_ -> m) }
    val dupes = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dupes.isEmpty, s"duplicate query keys: ${dupes.view.mapValues(_.map(_._2)).toMap}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a registered query; keys are well-formed") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(SparkEntry.queries.keys.forall(_.matches("q\\d+[a-z0-9_]*")),
      "query keys must follow the qNN_name convention")
  }

  test("rows-only queries (no oracle) are exactly the documented set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q62/q80: randomized sketches — no deterministic cross-engine value
    // to hash. The topic reports (q50/q51/q94/q95) and the ANN serving
    // paths (q45/q96/q99/q100) graduated to support-table oracles in
    // r7-r9; q49 graduated in r9 (norm + leading component recomputed
    // from the exported features table — the encoder is the given, the
    // normalization invariant and report math are checked).
    assert(rowsOnly == Set("q62_approx_distinct", "q80_approx_pct"),
      s"undocumented rows-only queries: $rowsOnly — every new operator needs an oracle " +
        "or an explicit entry here with unit invariants")
  }
}
