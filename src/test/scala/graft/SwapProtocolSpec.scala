package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SwapProtocol
import graft.streaming.Incremental

/** Crash-recovery of the directory-swap protocol (r16 verdict #1): a
  * simulated kill between EVERY pair of protocol steps must leave the
  * novelty log recoverable — `noveltyReport` still folds the exact table,
  * from `dst`, `__swap_old`, or `__swap_tmp` as the crash point dictates.
  * Also pins the maintainer-#23 compaction POLICY trigger (verdict #7). */
class SwapProtocolSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** A fresh novelty log (two appended partial batches, never compacted)
    * and the fold it must always report, regardless of crash state. */
  private def freshLog(): (String, Seq[Seq[Any]]) = {
    val dir = Files.createTempDirectory("graft-swap").toString + "/log"
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta", "srcA"),
      (1L, "fixed template phrase bank repeated verbatim", "srcB"),
      (2L, "fixed template phrase bank repeated verbatim", "srcB"))
      .toDF("doc_id", "text", "source")
    graft.ops.CorpusReports.gramCountsOf(
        corpus.filter(col("doc_id") < 2).select(col("source"), col("text")))
      .withColumn("batch_id", lit(0L)).write.mode("append").parquet(dir)
    graft.ops.CorpusReports.gramCountsOf(
        corpus.filter(col("doc_id") >= 2).select(col("source"), col("text")))
      .withColumn("batch_id", lit(1L)).write.mode("append").parquet(dir)
    val want = graft.ops.CorpusReports.noveltyFoldOf(
        graft.ops.CorpusReports.gramCountsOf(
          corpus.select(col("source"), col("text"))))
      .collect().map(_.toSeq).toSeq
    (dir, want)
  }

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write the compaction rollup of `dir` to an arbitrary staging path —
    * the state `compactNoveltyLog` reaches just before its swap steps. */
  private def stageRollup(dir: String, to: Path): Unit =
    spark.read.parquet(dir)
      .groupBy(col("source"), col("g")).agg(sum(col("n")).as("n"))
      .withColumn("batch_id", lit(-1L))
      .select(col("source"), col("g"), col("n"), col("batch_id"))
      .write.parquet(to.toString)

  private def report(dir: String): Seq[Seq[Any]] =
    Incremental.noveltyReport(spark, dir).collect().map(_.toSeq).toSeq

  test("kill after tmp write, before retire: dst authoritative; a READER leaves the residue, the next WRITER clears it") {
    val (dir, want) = freshLog()
    val f = fs(dir); val dst = new Path(dir)
    stageRollup(dir, SwapProtocol.tmpPath(dst)) // crash here: dst + tmp
    assert(report(dir) == want)
    // r19 doctrine: the report is a READER — it must not clean residue
    // next to a live dst (the 'stale' tmp could be a LIVE writer's
    // in-flight publish); reconciliation waits for the next writer
    assert(f.exists(SwapProtocol.tmpPath(dst)),
      "a reader must leave residue beside a live dst")
    // the next WRITER (compaction) reconciles and lands cleanly
    Incremental.compactNoveltyLog(spark, dir)
    assert(report(dir) == want)
    assert(!f.exists(SwapProtocol.tmpPath(dst)), "the writer clears residue")
  }

  test("a report racing a LIVE rename-mode writer never deletes the in-flight tmp") {
    val (dir, want) = freshLog()
    val f = fs(dir); val dst = new Path(dir)
    // deterministic interleaving: the 'concurrent reader' resolves from
    // inside the writer's write() callback — tmp exists and is
    // half-written, exactly what the old reader-side recover deleted
    var tmpSurvived = false
    var midSwapReport: Seq[Seq[Any]] = Seq.empty
    SwapProtocol.writeSwapped(f, dst) { tmp =>
      stageRollup(dir, tmp) // the writer's in-flight output
      midSwapReport = report(dir)
      tmpSurvived = f.exists(tmp)
    }
    assert(tmpSurvived, "the racing reader must not delete the writer's tmp")
    assert(midSwapReport == want, "mid-swap reader serves the live dst")
    assert(report(dir) == want, "the publish completes undamaged")
  }

  test("lost-race rename onto an existing dst never merges stale residue INTO the live dir") {
    // crash state between retire and publish: dst absent, tmp AND old
    // present. The loser observes old before the winner reclaims it,
    // and its rename(old, dst) runs after the winner published — on the
    // local FS that rename falls back to a COPY that merges old INTO
    // dst as dst/<old.name> and returns true (r19 review). The guard
    // must leave dst exactly the winner's publish.
    val base = Files.createTempDirectory("graft-merge").toString
    val dst = new Path(s"$base/t")
    Seq((1L, "fresh")).toDF("id", "tag")
      .write.parquet(SwapProtocol.tmpPath(dst).toString)
    Seq((0L, "stale")).toDF("id", "tag")
      .write.parquet(SwapProtocol.oldPath(dst).toString)
    val raw = fs(base)
    var fired = false
    val racing = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def exists(p: Path): Boolean =
        // the loser's branch probes: report tmp as already taken by the
        // winner so the loser lands in the old-restore branch
        if (p == SwapProtocol.tmpPath(dst)) false else super.exists(p)
      override def rename(src: Path, to: Path): Boolean = {
        if (!fired && src == SwapProtocol.oldPath(dst)) {
          fired = true
          // the winner completes (publishes tmp as dst) BEFORE the
          // loser's rename executes — but after its exists() checks
          require(raw.rename(SwapProtocol.tmpPath(dst), dst))
        }
        super.rename(src, to) // local-FS fallback would MERGE into dst
      }
    }
    SwapProtocol.recoverForRead(racing, dst) // must not throw
    assert(fired)
    assert(!raw.exists(new Path(dst, dst.getName + "__swap_old")),
      "merge residue inside the live dir must be swept")
    val got = spark.read.parquet(dst.toString)
      .select("tag").collect().map(_.getString(0)).toList
    assert(got == List("fresh"), s"dst must be exactly the winner's publish: $got")
  }

  test("retain < 1 is rejected before any destructive pass") {
    val dst = pointedFixture(0)
    val f = fs(dst.toString)
    intercept[IllegalArgumentException] {
      SwapProtocol.writePointed(f, dst, retain = 0) { _ => () }
    }
    intercept[IllegalArgumentException] {
      SwapProtocol.recoverPointed(f, dst, retain = -1)
    }
    assert(liveTag(dst) == "gen0", "the table is untouched")
  }

  test("kill between retire and publish: report recovers from __swap_tmp") {
    val (dir, want) = freshLog()
    val f = fs(dir); val dst = new Path(dir)
    stageRollup(dir, SwapProtocol.tmpPath(dst))
    assert(f.rename(dst, SwapProtocol.oldPath(dst))) // crash here: old + tmp, NO dst
    assert(report(dir) == want, "fold must recover from the staged rollup")
    assert(f.exists(dst) && !f.exists(SwapProtocol.oldPath(dst)) &&
      !f.exists(SwapProtocol.tmpPath(dst)), "recovery must complete the swap")
  }

  test("kill between publish and reclaim: dst is the rollup; the next WRITER reclaims old") {
    val (dir, want) = freshLog()
    val f = fs(dir); val dst = new Path(dir)
    stageRollup(dir, SwapProtocol.tmpPath(dst))
    assert(f.rename(dst, SwapProtocol.oldPath(dst)))
    assert(f.rename(SwapProtocol.tmpPath(dst), dst)) // crash here: dst + old
    assert(report(dir) == want)
    // r19 doctrine: the reader serves dst and leaves old for the writer
    assert(f.exists(SwapProtocol.oldPath(dst)), "a reader does not reclaim")
    SwapProtocol.writeSwapped(f, dst) { tmp => stageRollup(dir, tmp) }
    assert(!f.exists(SwapProtocol.oldPath(dst)), "the next writer reclaims old")
    assert(report(dir) == want)
  }

  test("defensive state (only __swap_old): report restores it") {
    val (dir, want) = freshLog()
    val f = fs(dir); val dst = new Path(dir)
    assert(f.rename(dst, SwapProtocol.oldPath(dst))) // dst vanished entirely
    assert(report(dir) == want)
    assert(f.exists(dst))
  }

  test("compaction policy: trigger fires at the ratio, report invariant (maintainer #23)") {
    val (dir, want) = freshLog()
    // 2 partial batches, no rollup yet; with minRollupRows=1 the floor is
    // growthRatio rows — the tiny log is over any small ratio already
    val rows = spark.read.parquet(dir).count()
    assert(!Incremental.compactNoveltyLogIfNeeded(spark, dir,
      growthRatio = rows.toDouble + 1, minRollupRows = 1L),
      "below the ratio: must not compact")
    assert(spark.read.parquet(dir).filter(col("batch_id") === -1L).count() == 0)
    assert(Incremental.compactNoveltyLogIfNeeded(spark, dir,
      growthRatio = 1.0, minRollupRows = 1L), "at the ratio: must compact")
    assert(spark.read.parquet(dir).filter(col("batch_id") =!= -1L).count() == 0,
      "all partials rolled up")
    assert(report(dir) == want, "report invariant across triggered compaction")
    // rolled-up log with no new appends: never re-triggers
    assert(!Incremental.compactNoveltyLogIfNeeded(spark, dir,
      growthRatio = 1.0, minRollupRows = 1L))
  }

  test("Compaction.compact in place migrates a plain table to a RETAINED v0 and survives (ShardExport refresh: crash residue never shadows the live export)") {
    val base = Files.createTempDirectory("graft-swapc").toString
    val d = s"$base/table"
    (0L until 100L).toDF("id").repartition(8).write.parquet(d)
    // in-place compaction: the plain dir is RETIRED into __v0 (marker
    // first, one rename — retained, never deleted under a mid-scan
    // reader), the rewrite publishes as __v1
    graft.sources.Compaction.compact(spark, d, d, "id", targetBytes = 1L << 30)
    val live1 = graft.sources.Compaction.resolve(spark, d)
    assert(live1.endsWith("table__v1") && spark.read.parquet(live1).count() == 100)
    val f = fs(d)
    assert(!f.exists(new Path(d)), "migrated plain dir must be retired")
    val v0 = SwapProtocol.versionPath(new Path(d), 0L)
    assert(f.exists(v0) && spark.read.parquet(v0.toString).count() == 100,
      "the pre-migration data survives as the retained previous version")
    // second in-place compaction: v1 → v2; v1 retained, v0 aged out
    graft.sources.Compaction.compact(spark, d, d, "id", targetBytes = 1L << 30)
    val live2 = graft.sources.Compaction.resolve(spark, d)
    assert(live2.endsWith("table__v2") && spark.read.parquet(live2).count() == 100)
    assert(f.exists(new Path(live1)), "previous version retained through the flip")
    assert(!f.exists(v0), "retention ages out the migrated original")
    // shard-export refresh over an existing export: an UNCOMMITTED crash
    // dir from a dead attempt must not shadow the live export — and a
    // PURE reader must not delete it either (it could be a LIVE writer's
    // in-flight publish; only the next writer may prune)
    val e = s"$base/export"
    val docs = (0L until 50L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    graft.sources.ShardExport.write(docs, "doc_id", e, nShards = 4)
    val junk = SwapProtocol.versionPath(new Path(e), 1L)
    Seq((1L, "x")).toDF("doc_id", "text").write.parquet(junk.toString) // no marker
    assert(spark.read.parquet(
      graft.sources.ShardExport.resolve(spark, e)).count() == 50,
      "reader resolves past the uncommitted residue")
    assert(f.exists(junk), "a PURE reader never deletes a possibly-live write")
    val republished = graft.sources.ShardExport.write(docs, "doc_id", e, nShards = 4)
    // the writer pruned the uncommitted residue and reuses its slot for
    // the fresh publish: the path now holds the COMMITTED new version
    assert(republished == junk.toString &&
      f.exists(SwapProtocol.commitMarker(junk)),
      "the next WRITER prunes the residue and republishes the slot")
    assert(spark.read.parquet(
      graft.sources.ShardExport.resolve(spark, e)).count() == 50)
  }

  test("plain re-save of a pointer-managed dir publishes pointed — never silently stale (r18 review)") {
    val base = Files.createTempDirectory("graft-resave").toString
    val dir = s"$base/mhidx"
    val docsA = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val docsB = Seq((2L, "iota kappa lambda mu nu xi omicron pi rho"))
      .toDF("doc_id", "text")
    graft.ops.MinHashIndex.save(graft.ops.MinHashIndex.build(docsA), dir)
    // maintenance migrates the index dir to pointer management
    graft.sources.Compaction.compact(spark, dir, dir, "doc_id", targetBytes = 1L << 30)
    // rebuild + re-save: must route through the pointer, and the loader
    // must see the NEW index, not the retained pre-rebuild version
    graft.ops.MinHashIndex.save(graft.ops.MinHashIndex.build(docsB), dir)
    val loaded = graft.ops.MinHashIndex.load(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(loaded == Set(2L), s"stale index served after re-save: $loaded")
  }

  // ---- pointer-mode crash matrix (r17 verdict #1): a simulated kill
  // between EVERY pair of pointer-protocol steps must leave the table
  // resolvable to a complete version, with the residue reconciled ----

  /** A pointed table with versions 0..n published for real; returns dst. */
  private def pointedFixture(n: Int): Path = {
    val base = Files.createTempDirectory("graft-ptr").toString
    val dst = new Path(s"$base/t")
    val f = fs(base)
    (0 to n).foreach { v =>
      SwapProtocol.writePointed(f, dst) { vdir =>
        Seq((v.toLong, s"gen$v")).toDF("id", "tag").write.parquet(vdir.toString)
      }
    }
    dst
  }

  private def liveTag(dst: Path): String =
    spark.read.parquet(SwapProtocol.resolve(fs(dst.toString), dst).toString)
      .select("tag").collect().map(_.getString(0)).toList match {
      case one :: Nil => one
      case other      => fail(s"expected one row, got $other")
    }

  test("pointed kill after version write, before commit: reader ignores (pure), next writer prunes") {
    val dst = pointedFixture(0)
    val f = fs(dst.toString)
    // crash state: v1 fully written but NO commit marker
    Seq((9L, "halfwritten")).toDF("id", "tag")
      .write.parquet(SwapProtocol.versionPath(dst, 1L).toString)
    assert(liveTag(dst) == "gen0", "uncommitted version must never serve")
    assert(f.exists(SwapProtocol.versionPath(dst, 1L)),
      "a PURE reader leaves the dir (it could be a live writer's publish)")
    // the next writer reconciles: prunes the residue, publishes over it
    SwapProtocol.writePointed(f, dst) { vdir =>
      Seq((1L, "gen1")).toDF("id", "tag").write.parquet(vdir.toString)
    }
    assert(liveTag(dst) == "gen1")
    assert(SwapProtocol.readPointer(f, dst).contains(1L))
  }

  test("pointed kill between commit and pointer publish: reader serves the committed write from markers") {
    val dst = pointedFixture(0)
    val f = fs(dst.toString)
    // crash state: v1 written AND committed, pointer still names v0
    val v1 = SwapProtocol.versionPath(dst, 1L)
    Seq((1L, "gen1")).toDF("id", "tag").write.parquet(v1.toString)
    f.create(SwapProtocol.commitMarker(v1), true).close()
    assert(SwapProtocol.readPointer(f, dst).contains(0L), "fixture: stale pointer")
    assert(liveTag(dst) == "gen1", "a committed write must serve, not drop")
    assert(SwapProtocol.readPointer(f, dst).contains(0L),
      "a PURE reader does not repair the pointer (two readers racing the " +
        "repair rename would crash the loser)")
    // the next writer repairs and advances
    SwapProtocol.writePointed(f, dst) { vdir =>
      Seq((2L, "gen2")).toDF("id", "tag").write.parquet(vdir.toString)
    }
    assert(liveTag(dst) == "gen2")
    assert(SwapProtocol.readPointer(f, dst).contains(2L), "writer repaired + advanced")
  }

  test("pointed kill mid-pointer-replacement (pointer missing): reader falls back to commit markers") {
    val dst = pointedFixture(1)
    val f = fs(dst.toString)
    assert(f.delete(SwapProtocol.ptrPath(dst), false)) // the delete→rename window
    assert(liveTag(dst) == "gen1", "highest committed version wins")
    assert(SwapProtocol.readPointer(f, dst).isEmpty, "reader stays pure")
    SwapProtocol.writePointed(f, dst) { vdir =>
      Seq((2L, "gen2")).toDF("id", "tag").write.parquet(vdir.toString)
    }
    assert(SwapProtocol.readPointer(f, dst).contains(2L), "writer rebuilt the pointer")
  }

  test("pointed kill before retention: reader serves, the next writer prunes to the last 2") {
    val dst = pointedFixture(1)
    val f = fs(dst.toString)
    // crash state: v2 committed + pointer flipped, retention never ran
    val v2 = SwapProtocol.versionPath(dst, 2L)
    Seq((2L, "gen2")).toDF("id", "tag").write.parquet(v2.toString)
    f.create(SwapProtocol.commitMarker(v2), true).close()
    SwapProtocol.publishPointer(f, dst, 2L)
    assert(liveTag(dst) == "gen2")
    assert(f.exists(SwapProtocol.versionPath(dst, 0L)), "reader does not prune")
    SwapProtocol.writePointed(f, dst) { vdir =>
      Seq((3L, "gen3")).toDF("id", "tag").write.parquet(vdir.toString)
    }
    assert(liveTag(dst) == "gen3")
    assert(!f.exists(SwapProtocol.versionPath(dst, 0L)) &&
      !f.exists(SwapProtocol.versionPath(dst, 1L)), "writer retention prunes")
    assert(f.exists(SwapProtocol.versionPath(dst, 2L)), "previous version kept")
  }

  test("a reader resolving MID-PUBLISH serves the old version and leaves the writer's dir intact") {
    // deterministic interleaving: the "concurrent reader" runs inside the
    // writer's write() callback — after the new version dir is written
    // but before its commit marker exists, exactly the window where the
    // first-cut reader-side recovery deleted the writer's data
    val dst = pointedFixture(0)
    val f = fs(dst.toString)
    var midPublishTag = ""
    var writerDirSurvived = false
    val published = SwapProtocol.writePointed(f, dst) { vdir =>
      Seq((1L, "gen1")).toDF("id", "tag").write.parquet(vdir.toString)
      // reader races the publish here (uncommitted vdir on disk)
      midPublishTag = liveTag(dst)
      writerDirSurvived = f.exists(vdir)
    }
    assert(midPublishTag == "gen0",
      "mid-publish reader must serve the previous committed version")
    assert(writerDirSurvived,
      "the reader's resolve must not delete the writer's in-flight dir")
    assert(liveTag(dst) == "gen1" &&
      f.exists(SwapProtocol.commitMarker(published)),
      "the racing reader must not have corrupted the publish")
  }

  test("pointed steady state: retain-2 holds across many publishes; resolve is the reader contract") {
    val dst = pointedFixture(4)
    val f = fs(dst.toString)
    assert(liveTag(dst) == "gen4")
    assert(SwapProtocol.versionDirs(f, dst).map(_._1) == Seq(3L, 4L),
      "exactly the last two versions on disk")
    // mode-agnostic resolve: a PLAIN dir resolves to itself
    val plain = new Path(Files.createTempDirectory("graft-plain").toString + "/p")
    Seq((0L, "plain")).toDF("id", "tag").write.parquet(plain.toString)
    assert(SwapProtocol.resolve(f, plain) == plain)
  }

  // ---- rename-mode recover is reader-race-safe (r18 verdict #2): the
  // pure-reader doctrine's last gap — two readers recovering the same
  // crashed RENAME swap race the completing rename; the loser must
  // re-check state and proceed, never crash ----

  /** A crashed rename swap: dst absent, tmp complete (the retire→publish
    * kill window). Returns dst. */
  private def crashedSwap(): Path = {
    val base = Files.createTempDirectory("graft-race").toString
    val dst = new Path(s"$base/t")
    Seq((1L, "staged")).toDF("id", "tag")
      .write.parquet(SwapProtocol.tmpPath(dst).toString)
    dst
  }

  test("rename recover: the rename LOSER re-checks state and proceeds (deterministic pin)") {
    // deterministic interleaving, the ecad443 style: the 'winner' (a
    // second reader's recover, against the raw fs) completes the swap
    // INSIDE the loser's rename call — after the loser's exists() checks
    // saw dst absent + tmp present, before its rename executes
    val dst = crashedSwap()
    val raw = fs(dst.toString)
    var fired = false
    val racing = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def rename(src: Path, to: Path): Boolean = {
        if (!fired && src == SwapProtocol.tmpPath(dst)) {
          fired = true
          SwapProtocol.recover(raw, dst) // the winner completes first
        }
        super.rename(src, to) // the loser's rename: src is gone
      }
    }
    SwapProtocol.recover(racing, dst) // must treat the lost race as done
    assert(fired, "the race injection must have run")
    assert(spark.read.parquet(dst.toString).count() == 1,
      "the swap completed exactly once; both readers proceed")
    assert(!raw.exists(SwapProtocol.tmpPath(dst)))
  }

  test("a LIVE writer whose publish rename loses to a reader-completer succeeds (r19 verdict #2)") {
    // the last uncovered lost-race window: between swapIn's retire
    // (dst -> old) and publish (tmp -> dst), dst is absent and tmp is
    // complete — exactly the crash shape recoverForRead completes, so a
    // reader resolving in that window legally steals the publish. The
    // writer's own rename then fails, but the swap finished with the
    // writer's data: swapIn must treat that as success, not throw.
    val base = Files.createTempDirectory("graft-steal").toString
    val dst = new Path(s"$base/t")
    Seq((0L, "gen0")).toDF("id", "tag").write.parquet(dst.toString)
    val raw = fs(base)
    var fired = false
    val racing = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def rename(src: Path, to: Path): Boolean = {
        if (!fired && src == SwapProtocol.tmpPath(dst) && to == dst) {
          fired = true
          // the reader completes the swap INSIDE the writer's publish
          // call — after the retire, before the writer's rename executes
          SwapProtocol.recoverForRead(raw, dst)
        }
        super.rename(src, to) // the writer's rename: src is gone
      }
    }
    SwapProtocol.writeSwapped(racing, dst) { tmp =>
      Seq((1L, "gen1")).toDF("id", "tag").write.parquet(tmp.toString)
    } // must not throw — the lost race published the writer's own data
    assert(fired, "the race injection must have run")
    val got = spark.read.parquet(dst.toString)
      .select("tag").collect().map(_.getString(0)).toList
    assert(got == List("gen1"), s"the writer's generation must be live: $got")
    assert(!raw.exists(SwapProtocol.tmpPath(dst)) &&
      !raw.exists(SwapProtocol.oldPath(dst)) &&
      !raw.exists(new Path(dst, dst.getName + "__swap_tmp")),
      "no residue — tmp, old, and any nested merge swept")
  }

  test("rename recover: two concurrent readers on one crashed swap both succeed") {
    val dst = crashedSwap()
    val f = fs(dst.toString)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val gate = new java.util.concurrent.CountDownLatch(1)
    val ts = (0 until 2).map { _ =>
      val t = new Thread(() => {
        gate.await()
        try SwapProtocol.recover(f, dst)
        catch { case e: Throwable => errs.add(e) }
      })
      t.start(); t
    }
    gate.countDown()
    ts.foreach(_.join())
    assert(errs.isEmpty, s"no reader may crash on the race: ${errs}")
    assert(spark.read.parquet(dst.toString).count() == 1)
  }

  // ---- the pointer PUT seam (r18 verdict #1): the object-store claim
  // is a typed PointerStore selected by configuration, and the pointed
  // protocol runs identically through it ----

  /** A fresh (uncached) local FileSystem whose conf selects the PUT
    * pointer store — the object-store deployment configuration. */
  private def putFs(): org.apache.hadoop.fs.FileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.pointer.store", "put")
    org.apache.hadoop.fs.FileSystem.newInstance(
      new java.net.URI("file:///"), conf)
  }

  test("pointer store selection: conf-driven, unknown value fails loudly") {
    assert(SwapProtocol.storeFor(fs("/tmp")) == graft.sources.RenamePointerStore)
    val pf = putFs()
    assert(SwapProtocol.storeFor(pf) == graft.sources.PutPointerStore)
    val bad = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    bad.set("graft.pointer.store", "dynamo")
    val badFs = org.apache.hadoop.fs.FileSystem.newInstance(
      new java.net.URI("file:///"), bad)
    val e = intercept[IllegalArgumentException](SwapProtocol.storeFor(badFs))
    assert(e.getMessage.contains("dynamo"))
  }

  test("pointer store selection: a session-runtime key set AFTER the FS was cached wins (r19 ADVICE)") {
    // Hadoop's FileSystem cache binds fs.getConf at first instantiation,
    // so a key set post-session-start via spark.conf.set would be
    // silently invisible through fs.getConf alone — storeFor must read
    // the ACTIVE session's runtime conf first
    val cached = fs("/tmp") // conf bound long ago, no pointer-store key
    val key = "spark.hadoop.graft.pointer.store"
    try {
      spark.conf.set(key, "put")
      assert(SwapProtocol.storeFor(cached) == graft.sources.PutPointerStore,
        "a runtime-set store must not silently fall back to rename")
      spark.conf.set(key, "dynamo")
      intercept[IllegalArgumentException](SwapProtocol.storeFor(cached))
    } finally spark.conf.unset(key)
    assert(SwapProtocol.storeFor(cached) == graft.sources.RenamePointerStore)
  }

  test("pointer store selection: the CURRENT session key beats a stale snapshot in a cached FS conf; pool threads resolve like the driver (r20 review)") {
    val key = "spark.hadoop.graft.pointer.store"
    try {
      // the staleness shape: newHadoopConf() copies session keys into
      // the conf the FS cache then binds FOREVER — an FS instantiated
      // while the key said "put" must not shadow the user's LATER
      // "rename" (current intent wins; the fs conf is a snapshot)
      val latched = putFs() // fs conf carries graft.pointer.store=put
      spark.conf.set(key, "rename")
      assert(SwapProtocol.storeFor(latched) == graft.sources.RenamePointerStore,
        "a stale session-derived snapshot in the FS conf must not shadow the current session key")
      spark.conf.set(key, "put")
      // a writer on a thread with NO active session (thread pool,
      // Future) must resolve the same store as the driver — the default
      // session is the cross-thread fallback
      val cached = fs("/tmp")
      @volatile var got: graft.sources.PointerStore = null
      val t = new Thread(() => {
        org.apache.spark.sql.SparkSession.clearActiveSession()
        got = SwapProtocol.storeFor(cached)
      })
      t.start(); t.join()
      assert(got == graft.sources.PutPointerStore,
        "a pool thread must not silently fall back to the rename store")
    } finally spark.conf.unset(key)
  }

  test("pointed crash matrix through the PUT store: publish, crash fallback, repair, retention") {
    val pf = putFs()
    val base = Files.createTempDirectory("graft-put").toString
    val dst = new Path(s"$base/t")
    def tag(): String =
      spark.read.parquet(SwapProtocol.resolve(pf, dst).toString)
        .select("tag").collect().map(_.getString(0)).mkString(",")
    (0 to 2).foreach { v =>
      SwapProtocol.writePointed(pf, dst) { vdir =>
        Seq((v.toLong, s"gen$v")).toDF("id", "tag").write.parquet(vdir.toString)
      }
      // the PUT replacement is ONE operation: no tmp sibling ever exists
      assert(!pf.exists(new Path(base, "t.ptr__new")),
        "put store must not stage a rename tmp")
      assert(SwapProtocol.readPointer(pf, dst).contains(v.toLong))
    }
    assert(tag() == "gen2")
    assert(SwapProtocol.versionDirs(pf, dst).map(_._1) == Seq(1L, 2L),
      "retain-2 steady state holds through the put store")
    // crash between commit and pointer publish: marker fallback serves
    val v3 = SwapProtocol.versionPath(dst, 3L)
    Seq((3L, "gen3")).toDF("id", "tag").write.parquet(v3.toString)
    pf.create(SwapProtocol.commitMarker(v3), true).close()
    assert(tag() == "gen3", "committed write serves from markers")
    assert(SwapProtocol.readPointer(pf, dst).contains(2L), "reader stays pure")
    // next writer repairs the pointer with one PUT and advances — and a
    // reader resolving MID-PUBLISH (uncommitted v4 on disk) through the
    // put store serves the previous committed version, pure (the
    // rename-store race pin, re-run through this store)
    var midPublishTag = ""
    SwapProtocol.writePointed(pf, dst) { vdir =>
      Seq((4L, "gen4")).toDF("id", "tag").write.parquet(vdir.toString)
      midPublishTag = tag()
    }
    assert(midPublishTag == "gen3",
      "mid-publish put-store reader must serve the committed version")
    assert(SwapProtocol.readPointer(pf, dst).contains(4L) && tag() == "gen4")
    // interop: the on-disk layout is store-agnostic — the default
    // rename-store fs resolves the same table identically
    val renameFs = fs(base)
    assert(SwapProtocol.resolve(renameFs, dst) ==
      SwapProtocol.versionPath(dst, 4L))
  }

  test("pointed publish leaves a layout breadcrumb for legacy direct readers") {
    val dst = pointedFixture(0)
    val f = fs(dst.toString)
    val crumb = new Path(dst.getParent, dst.getName + "__LAYOUT.md")
    assert(f.exists(crumb), "breadcrumb written on first publish")
    val in = f.open(crumb)
    val body = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    assert(body.contains("SwapProtocol.resolve") &&
      body.contains(SwapProtocol.CommitMarkerName))
    assert(SwapProtocol.versionDirs(f, dst).map(_._1) == Seq(0L),
      "the breadcrumb must not read as a version dir")
  }

  test("reader-lifetime contract at the routed sites: a cached resolved path survives retain-1 refreshes") {
    val base = Files.createTempDirectory("graft-retain").toString
    val e = s"$base/export"
    val docs = (0L until 20L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    graft.sources.ShardExport.write(docs, "doc_id", e, nShards = 2)
    // a training loader caches its resolved epoch path…
    val epochPath = graft.sources.ShardExport.resolve(spark, e)
    // …one refresh later the version is RETAINED and still readable
    graft.sources.ShardExport.write(docs, "doc_id", e, nShards = 2)
    assert(spark.read.parquet(epochPath).count() == 20,
      "default retain=2: one refresh of grace for a mid-epoch loader")
    // …after a second refresh it is pruned: the loader must have
    // re-resolved by now (the documented re-resolve cadence)
    graft.sources.ShardExport.write(docs, "doc_id", e, nShards = 2)
    assert(!fs(e).exists(new Path(epochPath)),
      "two refreshes prune the cached version (retain=2)")
    // a site with longer readers raises the knob: retain=3 gives two
    // refreshes of grace
    val c = s"$base/table"
    (0L until 30L).toDF("id").write.parquet(c)
    graft.sources.Compaction.compact(spark, c, c, "id",
      targetBytes = 1L << 30, retain = 3)
    val cached = graft.sources.Compaction.resolve(spark, c)
    (1 to 2).foreach { _ =>
      graft.sources.Compaction.compact(spark, c, c, "id",
        targetBytes = 1L << 30, retain = 3)
    }
    assert(spark.read.parquet(cached).count() == 30,
      "retain=3 keeps the cached version through two refreshes")
  }

  test("InvertedIndex.append prunes a crashed append's _temporary residue inside the live version (r18 ADVICE)") {
    val base = Files.createTempDirectory("graft-iiresidue").toString
    val dir = s"$base/idx"
    graft.ops.InvertedIndex.build(spark,
      Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), dir)
    // maintenance migrates postings to pointer management; a crashed
    // append then leaves committer residue INSIDE the committed version
    graft.sources.Compaction.compact(spark, s"$dir/postings",
      s"$dir/postings", "term", targetBytes = 1L << 30)
    val live = SwapProtocol.resolve(spark, s"$dir/postings")
    val residue = new Path(live, "_temporary/0/task_x")
    fs(dir).mkdirs(residue)
    graft.ops.InvertedIndex.append(spark,
      Seq((2L, "alpha delta")).toDF("doc_id", "text"), dir)
    assert(!fs(dir).exists(new Path(live, "_temporary")),
      "the next append reconciles the committer residue")
    val got = graft.ops.InvertedIndex
      .searchBm25(spark, dir, Seq("alpha")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("InvertedIndex.append stats crash-window: serve recovers the swapped stats") {
    val base = Files.createTempDirectory("graft-swapii").toString
    val dir = s"$base/idx"
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha delta"))
      .toDF("doc_id", "text")
    graft.ops.InvertedIndex.build(spark, docs, dir)
    graft.ops.InvertedIndex.append(spark,
      Seq((3L, "alpha beta beta")).toDF("doc_id", "text"), dir)
    val want = graft.ops.InvertedIndex
      .searchBm25(spark, dir, Seq("alpha", "beta")).collect().map(_.toSeq).toSeq
    // simulate the crash state mid-append: stats retired, tmp complete
    val dst = new Path(s"$dir/stats")
    val f = fs(dir)
    assert(f.rename(dst, SwapProtocol.oldPath(dst)))
    assert(f.rename(SwapProtocol.oldPath(dst), SwapProtocol.tmpPath(dst)))
    val got = graft.ops.InvertedIndex
      .searchBm25(spark, dir, Seq("alpha", "beta")).collect().map(_.toSeq).toSeq
    assert(got == want, "serve must complete the swap and score identically")
  }
}
