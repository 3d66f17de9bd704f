package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-recoverable directory swap — the shared publish protocol for
  * every site that replaces a LIVE directory in place (novelty-log
  * compaction, small-file compaction over a serving table, shard-export
  * refresh). The naive tmp-write → delete(dst) → rename(tmp, dst) has a
  * crash window between the delete and the rename where the live path is
  * simply GONE; for maintainer #23's gram log the only recovery would be
  * re-ingesting the entire stream history — unacceptable at 100 TB
  * (r16 verdict #1).
  *
  * Protocol (all steps idempotent-or-recoverable; `recover` completes
  * any in-flight swap from the on-disk state alone):
  *
  *   1. write the replacement to `dst__swap_tmp` (never the live path)
  *   2. retire:  rename(dst, dst__swap_old)     — live data preserved
  *   3. publish: rename(tmp, dst)               — one rename, not delete+rename
  *   4. reclaim: delete(dst__swap_old)
  *
  * Crash-state table (what `recover` sees → what it does):
  *   - dst present             → authoritative; stale tmp/old deleted
  *     (a tmp alongside dst is a write that never published — possibly
  *     HALF-written, so it is never trusted; old alongside dst is a
  *     crash after publish, already superseded)
  *   - dst absent, tmp present → crash between retire and publish. The
  *     tmp is necessarily COMPLETE (dst is only retired after the tmp
  *     write finishes), so publish it; then reclaim old.
  *   - dst absent, old only    → restore old (defensive; unreachable
  *     under the step order, but recoverable rather than fatal).
  *
  * Single-writer discipline (documented at every call site): swaps run
  * between streaming drains / as table maintenance, never concurrently
  * with a writer. Readers call `recover` first — on a crashed swap they
  * complete it and read the result, so no reader ever sees a missing
  * live path. On object stores without atomic rename the windows shrink
  * to single-object metadata ops rather than a full delete+rewrite.
  *
  * AUDIT of the repo's other delete/rename sites (r16 verdict #1 asked
  * for every one to be routed or cleared): the streaming model/index
  * version stores (`Incremental` WordVec refresh, IVF/SQ/PQ compaction
  * cadences) already follow write-new-version → commit-marker →
  * retain-last-2 — no live path is ever deleted before its replacement
  * is committed, so they need no swap. `SessionArtifacts` deletes only
  * its own bounded temp files. `Compaction.compact`/`zorderCompact`,
  * `ShardExport.write`, `InvertedIndex.append`'s live stats refresh, and
  * maintainer #25's exact-NN state previously used Spark's
  * `mode("overwrite")` (delete-then-write — the same window, wider) or
  * were new; all now write to the tmp path and publish through
  * [[swapIn]], with their readers calling [[recover]] first. Index
  * BUILDERS (`IvfIndex.save`, `InvertedIndex.build`, `PhashIndex.save`,
  * the SessionArtifacts-scoped model exports) write to fresh or
  * build-once directories — initial creation, not live replacement — and
  * stay on plain writes. */
object SwapProtocol {

  def tmpPath(dst: Path): Path =
    new Path(dst.getParent, dst.getName + "__swap_tmp")

  def oldPath(dst: Path): Path =
    new Path(dst.getParent, dst.getName + "__swap_old")

  /** Complete any in-flight swap at `dst` (see the crash-state table).
    * Call before reading a swap-managed path and before starting a new
    * swap. Idempotent; no-op when no swap residue exists. */
  def recover(fs: FileSystem, dst: Path): Unit = {
    val tmp = tmpPath(dst)
    val old = oldPath(dst)
    if (fs.exists(dst)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    } else if (fs.exists(tmp)) {
      require(fs.rename(tmp, dst), s"swap recovery failed: $tmp -> $dst")
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(old)) {
      require(fs.rename(old, dst), s"swap recovery failed: $old -> $dst")
    }
  }

  /** Publish a fully-written `tmpPath(dst)` as `dst` (steps 2–4). The
    * caller must have finished writing the tmp before calling. */
  def swapIn(fs: FileSystem, dst: Path): Unit = {
    val tmp = tmpPath(dst)
    val old = oldPath(dst)
    require(fs.exists(tmp), s"swapIn: nothing staged at $tmp")
    if (fs.exists(dst)) {
      if (fs.exists(old)) fs.delete(old, true) // stale residue from a recovered swap
      require(fs.rename(dst, old), s"swap retire failed: $dst -> $old")
    }
    require(fs.rename(tmp, dst), s"swap publish failed: $tmp -> $dst")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Full cycle: recover any prior crash, clear stale tmp, run `write`
    * against the tmp path, publish. `write` must fully materialize the
    * directory it is given before returning. */
  def writeSwapped(fs: FileSystem, dst: Path)(write: Path => Unit): Unit = {
    recover(fs, dst)
    val tmp = tmpPath(dst)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    write(tmp)
    swapIn(fs, dst)
  }
}
