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
  * Crash-state table (what [[recoverPointed]] sees → what it does):
  *   - version dir without commit marker → half-written crash; deleted
  *   - committed version newer than the pointer → crash between commit
  *     and publish; the write COMPLETED (marker exists), so the pointer
  *     is repaired to the highest committed version (same doctrine as
  *     rename-mode's "a complete tmp gets published")
  *   - pointer missing/corrupt but committed versions exist → crash
  *     inside the pointer replacement; rebuilt from commit markers
  *   - plain `dst` dir alongside committed versions → a rename-mode
  *     table mid-migration; superseded, retired by retention
  *   - excess committed versions → crash before retention; pruned
  *
  * Readers call [[resolve]] (mode-agnostic: completes any in-flight
  * publish in either mode, then returns the live data path — `dst`
  * itself for rename mode, `dst__v<live>` for pointer mode). Resolution
  * is metadata-only and bounded: one parent listing over ≤ retain+1
  * version dirs plus the pointer read. A long-lived serving job caches
  * the resolved path and re-resolves on refresh.
  *
  * Single-writer discipline (both modes, documented at every call
  * site): publishes run between streaming drains / as table
  * maintenance, never concurrently with another writer.
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
    * missing or unreadable (recovery then rebuilds it from markers). */
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

  /** All `dst__v<N>` dirs, ascending by version (one parent listing —
    * bounded by retain+in-flight, so ≤ 3 entries in steady state). */
  def versionDirs(fs: FileSystem, dst: Path): Seq[(Long, Path)] = {
    val prefix = dst.getName + "__v"
    val parent = dst.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix)) n.stripPrefix(prefix).toLongOption.map(_ -> st.getPath)
        else None
      }
      .sortBy(_._1)
  }

  /** Atomically replace the pointer with one naming `v`. Here: write a
    * sibling tmp file, delete the old pointer, rename — single-FILE
    * metadata ops. On an object store this whole method is ONE PUT of
    * the tiny pointer object (the deployment shim swaps exactly this
    * call); the brief missing-pointer window between delete and rename
    * is benign because resolution falls back to the highest COMMITTED
    * version, which is ≥ whatever the retired pointer named. */
  private def publishPointer(fs: FileSystem, dst: Path, v: Long): Unit = {
    val tmp = new Path(dst.getParent, dst.getName + ".ptr__new")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    val ptr = ptrPath(dst)
    if (fs.exists(ptr)) fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"pointer publish failed: $tmp -> $ptr")
  }

  /** Reconcile pointer vs version dirs (see the pointer-mode crash-state
    * table) and apply retention. Returns the live committed version, or
    * None when no committed version exists (fresh table, or rename-mode
    * only). Idempotent; metadata-only. */
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
      // retention: last `retain` committed versions stay; a plain
      // rename-mode dir at dst is superseded (migration completes here)
      committed.dropRight(retain).foreach { case (_, p) => fs.delete(p, true) }
      if (fs.exists(dst)) fs.delete(dst, true)
      Some(live)
    }
  }

  /** Full pointer-mode cycle: recover both modes, write the next
    * version to a fresh dir, commit, flip the pointer, prune. Returns
    * the published version dir (the path readers will resolve to).
    * `write` must fully materialize the directory it is given before
    * returning. The table being replaced — whether a pointed version or
    * a plain rename-mode dir being migrated — stays live and readable
    * until the pointer flip, and the previous version survives
    * retention, so a reader mid-scan never loses its files. */
  def writePointed(fs: FileSystem, dst: Path, retain: Int = 2)(write: Path => Unit): Path = {
    recover(fs, dst) // complete rename-mode residue first (migration path)
    val live = recoverPointed(fs, dst, retain)
    val next = live.getOrElse(-1L) + 1L
    val vdir = versionPath(dst, next)
    write(vdir)
    fs.create(commitMarker(vdir), true).close()
    publishPointer(fs, dst, next)
    recoverPointed(fs, dst, retain) // retention pass (prunes old + migrated dst)
    vdir
  }

  /** Mode-agnostic reader resolution: complete any in-flight publish,
    * then return the live data path — `dst__v<live>` when `dst` is
    * pointer-managed, `dst` itself otherwise. Every reader of a
    * swap-managed table goes through here (or an equivalent recover)
    * before reading. */
  def resolve(fs: FileSystem, dst: Path): Path = {
    recover(fs, dst)
    recoverPointed(fs, dst) match {
      case Some(v) => versionPath(dst, v)
      case None    => dst
    }
  }

  /** String/SparkSession convenience for [[resolve]]. */
  def resolve(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val dst = new Path(dir)
    resolve(dst.getFileSystem(spark.sessionState.newHadoopConf()), dst).toString
  }
}
