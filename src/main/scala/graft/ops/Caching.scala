package graft.ops

import org.apache.spark.sql.DataFrame

/** Deterministic cache lifecycle for query builders.
  *
  * Several builders cache an intermediate because multiple plan branches
  * read it (signature tables, gram tables, tf tables — the persisted-
  * intermediate pattern). Returning a LAZY result that still references
  * that cache leaks it into the shared session: across a 93-query
  * Verify/Bench run (or any long-lived production session) leaked blocks
  * accumulate, LRU eviction churns, and later queries pay unpredictable
  * GC.
  *
  * [[materializeAndRelease]] closes the lifecycle inside the builder: the
  * result is eagerly materialized via `localCheckpoint(eager = true)` —
  * which truncates lineage, so the caller's action reads the checkpointed
  * blocks and never the about-to-be-released cache — then every
  * intermediate is unpersisted immediately, even if the job fails.
  *
  * Scale notes: checkpoint blocks are RESULT-sized (every registered query
  * returns a reduced frame — per-doc stats, pair lists, top-k reports),
  * not corpus-sized, and they are freed automatically by Spark's
  * ContextCleaner once the returned frame becomes unreachable — nothing
  * accrues for the life of the session. Eager materialization inside the
  * builder keeps Bench fair (the builder call sits inside the timed
  * region). At production scale, swap localCheckpoint for a reliable
  * checkpoint directory if executor loss must be survivable mid-query —
  * same trade documented at [[ConnectedComponents]].
  */
object Caching {
  /** Session conf switch: when "true", return the LAZY result unchanged
    * (no checkpoint, no unpersist). For PLAN INSPECTION only — the
    * checkpointed return is a LogicalRDD scan, which would blind a plan
    * audit (PlanAuditSpec) to the real shuffle/join/pushdown shape of the
    * computation. Results are identical either way; only the cache
    * lifecycle differs, so flipping it never changes answers. */
  val PassthroughKey = "graft.caching.passthrough"

  def materializeAndRelease(result: DataFrame, intermediates: DataFrame*): DataFrame =
    if (result.sparkSession.conf.get(PassthroughKey, "false") == "true") result
    else
      try result.localCheckpoint(true)
      finally intermediates.foreach(_.unpersist())
}
