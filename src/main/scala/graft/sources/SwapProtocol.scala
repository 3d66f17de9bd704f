package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-recoverable publication for directories that are replaced in
  * place — TWO modes behind one object, chosen per call site by table
  * size and deployment:
  *
  * == Rename mode ([[writeSwapped]]) — small state on HDFS/local FS ==
  *
  * The naive tmp-write → delete(dst) → rename(tmp, dst) has a crash
  * window between the delete and the rename where the live path is
  * simply GONE; for maintainer #23's gram log the only recovery would be
  * re-ingesting the entire stream history — unacceptable at 100 TB
  * (r16 verdict #1). Protocol (all steps idempotent-or-recoverable;
  * `recover` completes any in-flight swap from the on-disk state alone):
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
  * DEPLOYMENT LIMIT (r17 verdict #1): the retire and publish steps are
  * DIRECTORY renames — atomic metadata ops on HDFS/local FS, but on
  * S3-class object stores a directory rename is a non-atomic O(files)
  * copy+delete, so each step becomes a wide, slow window on a large
  * table. Rename mode is therefore reserved for SMALL state (maintainer
  * state dirs, the novelty log, index stats) on rename-capable file
  * systems; large serving tables publish through pointer mode below.
  *
  * == Pointer mode ([[writePointed]]) — large tables, object-store-safe ==
  *
  * No live path is ever renamed or deleted-then-recreated. Each publish
  * writes a FRESH versioned directory and flips one tiny pointer file:
  *
  *   1. write the replacement to `dst__v<N>/`   (N = live version + 1;
  *      a fresh dir — never touches live data)
  *   2. commit:  create `dst__v<N>/_GRAFT_COMMITTED`  (one empty file;
  *      a version dir without the marker is never trusted)
  *   3. publish: atomically replace the pointer file `dst.ptr` with one
  *      naming N (single-FILE create+rename here; on an object store
  *      this step is ONE PUT of a tiny object — the only primitive the
  *      protocol needs from the store)
  *   4. retention: delete committed versions older than the last
  *      `retain` (default 2 — the previous version stays readable
  *      through the flip) and any uncommitted residue
  *
  * Crash-state table — what the next WRITER's [[recoverPointed]] does
  * (readers are PURE, see below; residue waits for a writer):
  *   - version dir without commit marker → half-written crash; deleted
  *     (and its slot reused by the new publish)
  *   - committed version newer than the pointer → crash between commit
  *     and publish; the write COMPLETED (marker exists), so the pointer
  *     is repaired to the highest committed version (same doctrine as
  *     rename-mode's "a complete tmp gets published")
  *   - pointer missing/corrupt but committed versions exist → crash
  *     inside the pointer replacement; rebuilt from commit markers
  *   - excess committed versions → crash before retention; pruned
  *
  * A plain rename-mode table MIGRATES on its first pointed publish
  * ([[migrateIfPlain]]): commit marker created inside the live dir
  * FIRST (no prunable-uncommitted window), then ONE rename retires it
  * as `dst__v0` — a RETAINED version aged out by normal retention, so
  * even the migration publish never deletes data under a mid-scan
  * reader. Migration is one-way: a later PLAIN overwrite of a
  * pointer-managed path would be invisible to resolving readers, so
  * plain re-writers check [[isPointerManaged]] and publish pointed
  * (MinHashIndex.save does; appends resolve to the live version dir).
  *
  * Readers call [[resolve]] — PURE on pointer-managed tables: the
  * pointer fast-path is O(1) existence checks, crash states fall back
  * to the highest COMMITTED version, and NOTHING is deleted or
  * repaired from the reader path (a resolving reader racing a live
  * publish must not be able to delete the writer's half-written
  * version, and two readers racing a pointer repair must not crash
  * each other). Residue is reconciled by the next writer. Tables with
  * no pointed state resolve to `dst` after completing any RENAME-mode
  * swap — the pre-existing rename-mode reader contract. A long-lived
  * serving job caches the resolved path and re-resolves on refresh.
  *
  * Single-writer discipline (both modes, documented at every call
  * site): publishes run between streaming drains / as table
  * maintenance, never concurrently with another writer. Readers may
  * run concurrently with anything.
  *
  * ROUTING (r17 verdict #1): the large-directory sites —
  * `ShardExport.write`, `Compaction.compact`/`zorderCompact` — publish
  * through pointer mode, and their readers resolve. Small-state sites
  * (novelty-log compaction, `InvertedIndex.append`'s stats refresh,
  * maintainers #25/#26/#27) stay on rename mode: their directories are
  * model-sized, and on the documented HDFS-class deployment the rename
  * windows are single metadata ops. The streaming model/index version
  * stores (`Incremental` WordVec refresh, IVF/SQ/PQ compaction
  * cadences) already follow exactly the pointer discipline
  * (write-new-version → commit-marker → retain-last-2) with their own
  * cadence bookkeeping and need no routing. `SessionArtifacts` deletes
  * only its own bounded temp files. Index BUILDERS (`IvfIndex.save`,
  * `InvertedIndex.build`, `PhashIndex.save`) write to fresh or
  * build-once directories — initial creation, not live replacement. */
object SwapProtocol {

  // ------------------------------------------------------------------
  // rename mode
  // ------------------------------------------------------------------

  def tmpPath(dst: Path): Path =
    new Path(dst.getParent, dst.getName + "__swap_tmp")

  def oldPath(dst: Path): Path =
    new Path(dst.getParent, dst.getName + "__swap_old")

  /** Complete any in-flight rename-mode swap at `dst` (see the
    * crash-state table). Call before reading a swap-managed path and
    * before starting a new swap. Idempotent; no-op when no swap residue
    * exists. */
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

  /** Full rename-mode cycle: recover any prior crash, clear stale tmp,
    * run `write` against the tmp path, publish. `write` must fully
    * materialize the directory it is given before returning. */
  def writeSwapped(fs: FileSystem, dst: Path)(write: Path => Unit): Unit = {
    recover(fs, dst)
    val tmp = tmpPath(dst)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    write(tmp)
    swapIn(fs, dst)
  }

  // ------------------------------------------------------------------
  // pointer mode
  // ------------------------------------------------------------------

  /** Marker file a version dir must contain to be trusted; created only
    * after the version's write fully returned. */
  val CommitMarkerName = "_GRAFT_COMMITTED"

  def ptrPath(dst: Path): Path =
    new Path(dst.getParent, dst.getName + ".ptr")

  def versionPath(dst: Path, v: Long): Path =
    new Path(dst.getParent, dst.getName + "__v" + v)

  def commitMarker(versionDir: Path): Path =
    new Path(versionDir, CommitMarkerName)

  /** Version named by the pointer file; None when the pointer is
    * missing or unreadable (resolution then falls back to the commit
    * markers; the next WRITER rebuilds the pointer). */
  def readPointer(fs: FileSystem, dst: Path): Option[Long] = {
    val p = ptrPath(dst)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        if (n <= 0) None
        else new String(buf, 0, n, "UTF-8").trim.toLongOption
      } catch { case _: java.io.IOException => None }
      finally in.close()
    }
  }

  /** All `dst__v<N>` dirs, ascending by version. One prefix-glob listing
    * (returns ≤ retain+in-flight entries); the steady-state READER never
    * gets here — [[resolve]]'s pointer fast-path is O(1) existence
    * checks, and the listing runs only on crash states and in writers. */
  def versionDirs(fs: FileSystem, dst: Path): Seq[(Long, Path)] = {
    val prefix = dst.getName + "__v"
    val parent = dst.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.globStatus(new Path(parent, prefix + "*")).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix)) n.stripPrefix(prefix).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** True when `dst` is pointer-managed: a pointer or any COMMITTED
    * version exists. Plain re-writers (e.g. an index `save` over a dir
    * that table maintenance has since migrated) must check this and
    * publish through [[writePointed]] instead — a plain overwrite of a
    * pointer-managed path would be invisible to resolving readers. */
  def isPointerManaged(fs: FileSystem, dst: Path): Boolean =
    fs.exists(ptrPath(dst)) ||
      versionDirs(fs, dst).exists { case (_, p) => fs.exists(commitMarker(p)) }

  /** Atomically replace the pointer with one naming `v`. Here: write a
    * sibling tmp file, delete the old pointer, rename — single-FILE
    * metadata ops. On an object store this whole method is ONE PUT of
    * the tiny pointer object (the deployment shim swaps exactly this
    * call); the brief missing-pointer window between delete and rename
    * is benign because resolution falls back to the highest COMMITTED
    * version, which is ≥ whatever the retired pointer named. */
  private[graft] def publishPointer(fs: FileSystem, dst: Path, v: Long): Unit = {
    val tmp = new Path(dst.getParent, dst.getName + ".ptr__new")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val ptr = ptrPath(dst)
    if (fs.exists(ptr)) fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"pointer publish failed: $tmp -> $ptr")
  }

  /** WRITER-side reconciliation (see the pointer-mode crash-state table)
    * + retention. DESTRUCTIVE — prunes uncommitted crash residue and
    * aged versions, repairs the pointer — so it runs ONLY inside
    * [[writePointed]], where the single-writer discipline guarantees no
    * other write is in flight (an uncommitted version dir here is
    * therefore necessarily a crash, never a live publish; reader-side
    * resolution is PURE exactly so a resolving reader can never delete
    * a concurrent writer's half-written version — see [[resolve]]).
    * Returns the live committed version, or None when no committed
    * version exists (fresh table, or rename-mode only). Idempotent. */
  def recoverPointed(fs: FileSystem, dst: Path, retain: Int = 2): Option[Long] = {
    val dirs = versionDirs(fs, dst)
    val (committed, uncommitted) =
      dirs.partition { case (_, p) => fs.exists(commitMarker(p)) }
    // half-written crash residue: a version dir without its marker is
    // never trusted (the marker is created only after write() returned)
    uncommitted.foreach { case (_, p) => fs.delete(p, true) }
    if (committed.isEmpty) {
      // a pointer with nothing committed behind it is stale residue
      if (fs.exists(ptrPath(dst))) fs.delete(ptrPath(dst), false)
      None
    } else {
      val live = committed.last._1
      // crash between commit and publish, or mid-pointer-replacement:
      // the highest committed version wins (its write completed)
      if (!readPointer(fs, dst).contains(live)) publishPointer(fs, dst, live)
      // retention: the last `retain` committed versions stay
      committed.dropRight(retain).foreach { case (_, p) => fs.delete(p, true) }
      Some(live)
    }
  }

  /** Migrate a PLAIN rename-mode directory into the version store: the
    * commit marker is created INSIDE the live dir first (so there is no
    * crash window in which the data sits in an uncommitted — prunable —
    * version dir), then ONE rename retires it as `dst__v0` and the
    * pointer publishes. The old data is now a RETAINED version (aged
    * out by normal retention two publishes later), never deleted under
    * a mid-scan reader — the guarantee the first cut broke by deleting
    * the plain dir right after its first pointed refresh. No-op unless
    * a plain dir exists and nothing is committed yet. Callers that
    * READ the plain path they are replacing (in-place compaction) must
    * call this BEFORE resolving their input, so the read plan sees the
    * post-migration path. */
  def migrateIfPlain(fs: FileSystem, dst: Path): Unit = {
    recover(fs, dst) // complete rename-mode residue first
    if (fs.exists(dst) && !isPointerManaged(fs, dst)) {
      fs.create(commitMarker(dst), true).close() // marker BEFORE the rename
      val v0 = versionPath(dst, 0L)
      require(fs.rename(dst, v0), s"migration failed: $dst -> $v0")
      publishPointer(fs, dst, 0L)
    }
  }

  /** Full pointer-mode cycle: migrate/reconcile (writer-side), write
    * the next version to a fresh dir, commit, flip the pointer, prune.
    * Returns the published version dir (the path readers will resolve
    * to). `write` must fully materialize the directory it is given
    * before returning. The table being replaced — a previous pointed
    * version, or a plain dir retired into `__v0` by [[migrateIfPlain]] —
    * stays retained and readable through the flip, so a reader mid-scan
    * never loses its files. */
  def writePointed(fs: FileSystem, dst: Path, retain: Int = 2)(write: Path => Unit): Path = {
    migrateIfPlain(fs, dst)
    val live = recoverPointed(fs, dst, retain)
    val next = live.getOrElse(-1L) + 1L
    val vdir = versionPath(dst, next)
    write(vdir)
    fs.create(commitMarker(vdir), true).close()
    publishPointer(fs, dst, next)
    recoverPointed(fs, dst, retain) // retention pass
    vdir
  }

  /** Mode-agnostic READER resolution — PURE on pointer-managed tables
    * (a resolving reader must never mutate: the destructive
    * reconciliation lives in [[writePointed]], else a reader racing a
    * live publish could delete the writer's half-written version or
    * crash on a pointer-repair rename collision with another reader).
    *
    * Pointer fast-path: when the pointer names a committed version and
    * no newer committed slot exists, resolution is O(1) existence
    * checks — no directory listing. Crash states fall back to the
    * highest COMMITTED version from one prefix listing (stale pointer,
    * missing pointer mid-replacement); the residue itself is repaired
    * by the next writer. A table with no pointed state resolves to
    * `dst` after completing any RENAME-mode swap (that mutation is
    * completing a crashed publish — the pre-existing rename-mode reader
    * contract). */
  def resolve(fs: FileSystem, dst: Path): Path = {
    readPointer(fs, dst) match {
      case Some(v) if fs.exists(commitMarker(versionPath(dst, v))) =>
        // a newer committed version exists only after a crash between
        // commit and pointer publish — walk the (single-writer) slots
        var live = v
        while (fs.exists(commitMarker(versionPath(dst, live + 1)))) live += 1
        versionPath(dst, live)
      case _ =>
        val committed = versionDirs(fs, dst)
          .filter { case (_, p) => fs.exists(commitMarker(p)) }
        if (committed.nonEmpty) committed.last._2
        else { recover(fs, dst); dst }
    }
  }

  /** String/SparkSession convenience for [[resolve]]. */
  def resolve(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val dst = new Path(dir)
    resolve(dst.getFileSystem(spark.sessionState.newHadoopConf()), dst).toString
  }
}
