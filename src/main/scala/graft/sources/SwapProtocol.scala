package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE primitive pointer mode needs from the storage layer beyond
  * plain directory writes: atomically replace — and read back — the tiny
  * pointer object, so a concurrent reader sees either the old or the new
  * contents, never a partial write (r18 verdict #1: the "on an object
  * store this is one PUT" claim is a typed plug here, not scaladoc
  * prose — the [[Embedder]]-seam doctrine applied to storage).
  *
  * Selection is deployment CONFIGURATION, read from the Hadoop conf the
  * caller's FileSystem already carries (`graft.pointer.store` — set it
  * session-wide via `spark.hadoop.graft.pointer.store`): "rename" (the
  * default, [[RenamePointerStore]]) for HDFS/local FS, "put"
  * ([[PutPointerStore]]) for S3-class object stores. An unknown value
  * fails loudly at the first pointer operation — choosing the store is
  * an explicit config decision, never a silent fallback. */
trait PointerStore extends Serializable {
  /** Atomically replace the pointer object at `ptr` with `value`. */
  def put(fs: FileSystem, ptr: Path, value: String): Unit
  /** Full contents of the pointer object; None when absent or unreadable
    * (resolution then falls back to commit markers). Must read to EOF —
    * a single InputStream.read() may legally return a prefix (r18
    * ADVICE), and a truncated version number would send the fast path to
    * a spurious listing. */
  def read(fs: FileSystem, ptr: Path): Option[String]
}

/** HDFS/local-FS default: write a sibling tmp file, delete the retired
  * pointer, rename — single-FILE metadata ops, each atomic on a
  * rename-capable file system. The brief missing-pointer window between
  * the delete and the rename is benign because [[SwapProtocol.resolve]]
  * falls back to the highest COMMITTED version, which is ≥ whatever the
  * retired pointer named. */
object RenamePointerStore extends PointerStore {
  def put(fs: FileSystem, ptr: Path, value: String): Unit = {
    val tmp = new Path(ptr.getParent, ptr.getName + "__new")
    val out = fs.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    if (fs.exists(ptr)) fs.delete(ptr, false)
    require(fs.rename(tmp, ptr), s"pointer publish failed: $tmp -> $ptr")
  }
  def read(fs: FileSystem, ptr: Path): Option[String] =
    // no exists() probe, and the open is INSIDE the try: an absent
    // pointer (FileNotFoundException — including one that vanishes under
    // a concurrent delete→rename replacement) and a TRANSIENT probe/open
    // IOException both degrade to the documented None → commit-marker
    // fallback rather than propagating (r19 ADVICE: the probe sat
    // outside the try, so a transient exists() failure crashed the
    // reader instead of falling back)
      try {
        val in = fs.open(ptr)
        try {
          // read to EOF: InputStream.read may return any prefix (r18 ADVICE)
          val buf = new java.io.ByteArrayOutputStream(64)
          val chunk = new Array[Byte](64)
          var n = in.read(chunk)
          while (n > 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          if (buf.size == 0) None else Some(buf.toString("UTF-8"))
        } finally in.close()
      } catch { case _: java.io.IOException => None }
}

/** S3-class object stores: the whole replacement is ONE PUT of the tiny
  * pointer object — `create(overwrite = true)` + write + close is a
  * single atomic object PUT on S3A-style file systems (readers of the
  * key see the old object until the PUT completes; there is no
  * missing-pointer window at all, and no rename — which on these stores
  * would be a non-atomic copy+delete). NOT the default because on a
  * POSIX/HDFS file system an in-place create is NOT reader-atomic (a
  * concurrent reader can observe a partially-written file); selecting
  * this store is the explicit object-store deployment decision
  * (`graft.pointer.store=put`). Reads share the rename store's
  * EOF-looped read — a GET is a GET on every store. */
object PutPointerStore extends PointerStore {
  def put(fs: FileSystem, ptr: Path, value: String): Unit = {
    val out = fs.create(ptr, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }
  def read(fs: FileSystem, ptr: Path): Option[String] =
    RenamePointerStore.read(fs, ptr)
}

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
  * Crash-state table (what WRITER-side `recover` does; reader paths use
  * [[recoverForRead]], which only acts on the dst-absent states):
  *   - dst present             → authoritative; stale tmp/old deleted
  *     BY THE NEXT WRITER only (a tmp alongside dst is either crash
  *     residue — a write that never published, possibly HALF-written,
  *     never trusted — or a LIVE writer's in-flight publish, which is
  *     why a reader must not clean it; r19 review)
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
  *      naming N — through the configuration-selected [[PointerStore]]
  *      (the only primitive the protocol needs from the store): sibling
  *      tmp + single-file rename on HDFS/local FS, ONE PUT of the tiny
  *      object under `graft.pointer.store=put` on S3-class stores
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
  *   - `_temporary` committer residue INSIDE a committed version →
  *     a crashed `InvertedIndex.append` — the one documented exception
  *     to "committed versions are immutable" (appends mutate the
  *     resolved live dir in place; see its scaladoc). Spark readers
  *     hide underscore paths, and the next APPEND prunes it;
  *     recoverPointed leaves version-dir interiors alone.
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
  * no pointed state resolve to `dst` after completing a crashed
  * RENAME-mode swap ONLY when `dst` is absent ([[recoverForRead]] —
  * the one state where a reader must mutate to serve at all); residue
  * next to a live `dst` waits for the next writer, so a resolving
  * reader can never delete a live writer's in-flight tmp. A long-lived
  * serving job caches the resolved path and re-resolves on refresh.
  *
  * Single-writer discipline (both modes, documented at every call
  * site): publishes run between streaming drains / as table
  * maintenance, never concurrently with another writer. Readers may
  * run concurrently with anything.
  *
  * ROUTING (r17 verdict #1): the large-directory sites —
  * `ShardExport.write`, `Compaction.compact`/`zorderCompact` — publish
  * through pointer mode, and their readers resolve — as does
  * `InvertedIndex.compact`, the maintenance entry for the accumulating
  * postings/doclens version dirs, whose explicit `retain` is sized to
  * the BM25 serve window (see its scaladoc; the version-dir interiors
  * it appends into are the `_temporary`-residue row of the crash-state
  * table above). Small-state sites
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
    * exists.
    *
    * Reader-race-safe (r18 verdict #2 — the pointer-repair doctrine
    * applied to rename mode): recovery runs from READER paths too, so
    * two concurrent readers resolving the same crashed swap can both
    * observe `dst` absent + residue present and both attempt the
    * completing rename. The loser's rename returns false — that is a
    * LOST RACE, not corruption: re-check the state and proceed if a
    * winner completed the swap; only fail when `dst` is still absent
    * (a genuine rename failure). */
  def recover(fs: FileSystem, dst: Path): Unit = {
    if (fs.exists(dst)) {
      // residue cleanup NEXT to a live dst is WRITER-only: recover runs
      // here only from writer paths (writeSwapped, maintenance), where
      // single-writer discipline makes a tmp necessarily a crash —
      // reader paths go through [[recoverForRead]], which must never
      // delete a live writer's in-flight tmp (r19 review)
      val old = oldPath(dst); val tmp = tmpPath(dst)
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(tmp)) fs.delete(tmp, true)
    } else completeCrashedSwap(fs, dst)
  }

  /** READER-side completion: mutates ONLY when `dst` is absent — the one
    * state where a reader must complete the crashed swap to serve at
    * all (the pre-existing rename-mode reader contract). Residue NEXT
    * to a live dst is left for the next writer: a reader that cleaned
    * it could delete a LIVE writer's in-flight `__swap_tmp` (r19
    * review — the pointer-mode pure-reader doctrine, applied as far as
    * rename mode allows). */
  def recoverForRead(fs: FileSystem, dst: Path): Unit =
    if (!fs.exists(dst)) completeCrashedSwap(fs, dst)

  /** Complete a crashed swap at an ABSENT `dst` (shared by reader and
    * writer recovery; both may race another recovering process). */
  private def completeCrashedSwap(fs: FileSystem, dst: Path): Unit = {
    val tmp = tmpPath(dst)
    val old = oldPath(dst)
    // a completing rename that fails — returning false OR throwing (the
    // local-FS copy fallback throws FileNotFoundException when the src
    // vanished under us) — is a lost race iff a winner made dst appear.
    // Re-check dst IMMEDIATELY before the rename, and sweep the nested
    // merge residue after: Hadoop's local rename onto an EXISTING
    // directory falls back to a copy that MERGES from INTO dst as
    // dst/<from.name> and returns true — a lost race must neither crash
    // nor leave that residue shadowing the live data (r19 review).
    def completeRename(from: Path): Unit = {
      val ok = !fs.exists(dst) && (try fs.rename(from, dst)
        catch { case _: java.io.IOException => false })
      if (!ok && !fs.exists(dst))
        throw new java.io.IOException(s"swap recovery failed: $from -> $dst")
      val nested = new Path(dst, from.getName)
      if (fs.exists(nested)) fs.delete(nested, true)
    }
    if (fs.exists(tmp)) {
      completeRename(tmp)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(old)) {
      completeRename(old)
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
    // publish — the ONE rename the lost-race doctrine didn't cover (r19
    // verdict #2): in the retire→publish window `dst` is absent and the
    // tmp is complete, which is exactly the crash shape [[recoverForRead]]
    // completes — a reader resolving in that window can legally steal the
    // publish (rename the SAME tmp to dst and reclaim old). The live
    // writer's rename then fails, but the swap COMPLETED with the
    // writer's own data: same doctrine as [[completeCrashedSwap]] — a
    // failed rename (false OR the local-FS copy-fallback IOException) is
    // a lost race iff dst appeared; only throw when dst is still absent.
    val published = try fs.rename(tmp, dst)
      catch { case _: java.io.IOException => false }
    if (!published && !fs.exists(dst))
      throw new java.io.IOException(s"swap publish failed: $tmp -> $dst")
    // sweep the nested-merge residue: Hadoop's local rename onto an
    // EXISTING directory (dst appearing mid-rename) falls back to a copy
    // that MERGES tmp INTO dst as dst/<tmp.name> and returns true
    val nested = new Path(dst, tmp.getName)
    if (fs.exists(nested)) fs.delete(nested, true)
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

  /** The [[PointerStore]] the deployment configuration selects
    * (`graft.pointer.store`, default "rename"); fails loudly on an
    * unknown value — see the trait scaladoc.
    *
    * Resolution order (r19 ADVICE + two r20 review rounds):
    *   1. the SparkSession's runtime conf
    *      (`spark.hadoop.graft.pointer.store` as Spark prefixes Hadoop
    *      keys, then the bare key) — the user's CURRENT intent. It must
    *      win over `fs.getConf` because the cached FileSystem conf is a
    *      SNAPSHOT: Hadoop's FS cache binds the conf at first
    *      instantiation of the scheme, and `newHadoopConf()` copies the
    *      session's `spark.hadoop.*` keys into it — so a cached conf can
    *      carry a STALE session-derived value that would silently
    *      shadow a later `spark.conf.set` forever (the r19 staleness
    *      bug, in either direction). The active (thread-local) session
    *      is consulted first, then the default session, so writer
    *      threads outside the driver's main thread (thread pools,
    *      Futures) resolve the same store as the driver;
    *   2. otherwise `fs.getConf` — non-Spark callers and launch-time
    *      Hadoop-side configuration. NOTE the tradeoff: an FS built
    *      with a private conf whose key CONTRADICTS a set session key
    *      resolves to the session key; deployments that need
    *      store-per-path route it through the session conf before the
    *      publish, not through private conf objects (updating a tiny
    *      session key between publishes is cheap; a silently stale
    *      store is not);
    *   3. the "rename" default. */
  def storeFor(fs: FileSystem): PointerStore = {
    val key = "graft.pointer.store"
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .flatMap(s => s.conf.getOption("spark.hadoop." + key)
        .orElse(s.conf.getOption(key)))
      .orElse(Option(fs.getConf.get(key)))
      .getOrElse("rename") match {
      case "rename" => RenamePointerStore
      case "put"    => PutPointerStore
      case other => throw new IllegalArgumentException(
        s"graft.pointer.store=$other — expected 'rename' (HDFS/local FS) " +
          "or 'put' (S3-class object store)")
    }
  }

  /** Version named by the pointer file; None when the pointer is
    * missing or unreadable (resolution then falls back to the commit
    * markers; the next WRITER rebuilds the pointer). */
  def readPointer(fs: FileSystem, dst: Path): Option[Long] =
    storeFor(fs).read(fs, ptrPath(dst)).flatMap(_.trim.toLongOption)

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

  /** Atomically replace the pointer with one naming `v`, through the
    * configuration-selected [[PointerStore]] — tmp+rename on HDFS/local
    * FS, ONE PUT on an object store (`graft.pointer.store=put`). The
    * store is the typed seam the deployment swaps; this method only
    * formats the version. */
  private[graft] def publishPointer(fs: FileSystem, dst: Path, v: Long): Unit =
    storeFor(fs).put(fs, ptrPath(dst), v.toString)

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
    // retain < 1 would make the retention pass delete EVERY committed
    // version including the one just published — a plausible misread of
    // "extra versions kept" that must fail loudly, not lose the table
    // (r19 review)
    require(retain >= 1, s"retain=$retain: at least the live version must be kept")
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
    require(retain >= 1, s"retain=$retain: at least the live version must be kept")
    migrateIfPlain(fs, dst)
    val live = recoverPointed(fs, dst, retain)
    val next = live.getOrElse(-1L) + 1L
    val vdir = versionPath(dst, next)
    write(vdir)
    fs.create(commitMarker(vdir), true).close()
    publishPointer(fs, dst, next)
    recoverPointed(fs, dst, retain) // retention pass
    writeBreadcrumb(fs, dst)
    vdir
  }

  /** One-time human breadcrumb next to the version dirs: an external or
    * legacy consumer that reads `dst` directly finds NO data there after
    * the first pointed publish (a breaking layout change — r18 ADVICE);
    * the parent listing instead shows `dst__v<N>/`, `dst.ptr`, and this
    * file explaining how to resolve. Written after the publish, outside
    * the protocol (a torn write here is cosmetic; the name does not
    * match the `dst__v*` version glob). */
  private def writeBreadcrumb(fs: FileSystem, dst: Path): Unit = {
    val crumb = new Path(dst.getParent, dst.getName + "__LAYOUT.md")
    if (!fs.exists(crumb)) try {
      val out = fs.create(crumb, true)
      try out.write(
        (s"# ${dst.getName}: pointer-managed table\n\n" +
          s"Data lives in `${dst.getName}__v<N>/` version directories, " +
          s"NOT at `${dst.getName}` itself. The live version is named by " +
          s"`${dst.getName}.ptr`; trust only version dirs containing " +
          s"`$CommitMarkerName`. Programmatic readers: " +
          "graft.sources.SwapProtocol.resolve(spark, dir).\n").getBytes("UTF-8"))
      finally out.close()
    } catch { case _: java.io.IOException => () } // cosmetic only
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
        else { recoverForRead(fs, dst); dst }
    }
  }

  /** String/SparkSession convenience for [[resolve]]. */
  def resolve(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    val dst = new Path(dir)
    resolve(dst.getFileSystem(spark.sessionState.newHadoopConf()), dst).toString
  }
}
