package graft

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, FilterFileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SwapProtocol

/** MACHINE-ENUMERATED crash matrix (r19): the hand-built kill tests pin
  * the crash states the protocol authors thought of; this spec kills
  * after EVERY protocol file-system mutation instead — create, delete,
  * and rename calls are counted by a wrapping FileSystem and the Nth is
  * turned into a simulated process death, for every N a publish
  * performs, through BOTH pointer stores. After each kill the two
  * protocol invariants are asserted from the on-disk state alone:
  *
  *   1. READ: a PURE resolve (run against an unwrapped fs) serves a
  *      complete, readable, previously-committed generation — never a
  *      half-written directory, never nothing;
  *   2. WRITE: the next writer completes over the residue, publishes
  *      its own generation, and steady-state retention holds.
  *
  * The data write inside `write(vdir)` runs through Spark's own
  * FileSystem (not the wrapper), so kills inside the data write are not
  * enumerated here — that whole window collapses to the
  * "version dir without commit marker" state, which IS enumerated (the
  * kill before the marker create) and hand-pinned in SwapProtocolSpec. */
class SwapProtocolKillSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private final class KillException extends RuntimeException("simulated crash")

  /** Counts mutating calls; throws once the budget is exhausted. All
    * FileSystem.create convenience overloads funnel into the abstract
    * full-signature create, so overriding it catches every protocol
    * create. */
  private final class KillFs(raw: FileSystem) extends FilterFileSystem(raw) {
    var remaining: Long = Long.MaxValue
    var mutations: Long = 0L
    private def tick(): Unit = {
      if (remaining <= 0) throw new KillException
      remaining -= 1; mutations += 1
    }
    override def create(f: Path,
        permission: org.apache.hadoop.fs.permission.FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short,
        blockSize: Long,
        progress: org.apache.hadoop.util.Progressable)
        : org.apache.hadoop.fs.FSDataOutputStream = {
      tick()
      super.create(f, permission, overwrite, bufferSize, replication,
        blockSize, progress)
    }
    override def delete(f: Path, recursive: Boolean): Boolean = {
      tick(); super.delete(f, recursive)
    }
    override def rename(src: Path, dst: Path): Boolean = {
      tick(); super.rename(src, dst)
    }
  }

  private def rawFs(store: String): FileSystem = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("graft.pointer.store", store)
    FileSystem.newInstance(new java.net.URI("file:///"), conf)
  }

  private def writeGen(dir: Path, g: Long): Unit =
    Seq((g, s"gen$g")).toDF("id", "tag").write.parquet(dir.toString)

  private def servedTag(fs: FileSystem, dst: Path): String = {
    val p = SwapProtocol.resolve(fs, dst)
    spark.read.parquet(p.toString)
      .select("tag").collect().map(_.getString(0)).toList match {
      case one :: Nil => one
      case other => fail(s"resolve served an incomplete state: $other at $p")
    }
  }

  private def pointedKillMatrix(store: String): Unit = {
    val raw = rawFs(store)
    // how many protocol mutations does one steady-state publish make?
    val probeBase = Files.createTempDirectory(s"graft-kill-$store").toString
    val probeDst = new Path(s"$probeBase/t")
    SwapProtocol.writePointed(raw, probeDst)(writeGen(_, 0L))
    SwapProtocol.writePointed(raw, probeDst)(writeGen(_, 1L)) // breadcrumb now exists
    val counter = new KillFs(raw)
    SwapProtocol.writePointed(counter, probeDst)(writeGen(_, 2L))
    val opsPerPublish = counter.mutations
    assert(opsPerPublish >= 3,
      s"$store: expected at least marker+pointer+retention mutations, got $opsPerPublish")

    (0L until opsPerPublish).foreach { kill =>
      // fresh steady-state table: gen0 and gen1 published cleanly
      val base = Files.createTempDirectory(s"graft-kill-$store-$kill").toString
      val dst = new Path(s"$base/t")
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 0L))
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 1L))
      // the publish of gen2 dies at protocol mutation #kill
      val killer = new KillFs(raw)
      killer.remaining = kill
      intercept[KillException] {
        SwapProtocol.writePointed(killer, dst)(writeGen(_, 2L))
      }
      // READ invariant: a pure reader serves a complete committed gen
      val served = servedTag(raw, dst)
      assert(served == "gen1" || served == "gen2",
        s"$store kill=$kill: served $served")
      // WRITE invariant: the next writer reconciles and publishes gen3
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 3L))
      assert(servedTag(raw, dst) == "gen3", s"$store kill=$kill: recovery publish")
      // and one more steady publish restores retain-2 exactly
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 4L))
      assert(servedTag(raw, dst) == "gen4")
      assert(SwapProtocol.versionDirs(raw, dst).size <= 2,
        s"$store kill=$kill: retention must converge back to retain-2")
    }
  }

  test("pointed publish: kill after EVERY protocol mutation (rename store) — resolvable and writer-recoverable") {
    pointedKillMatrix("rename")
  }

  test("pointed publish: kill after EVERY protocol mutation (put store) — resolvable and writer-recoverable") {
    pointedKillMatrix("put")
  }

  /** The MIGRATION publish (r19 verdict #4): a PLAIN rename-mode dir's
    * FIRST pointed publish runs `migrateIfPlain`'s marker-create →
    * retire-rename → pointer-publish sequence before the normal
    * version-write — a longer mutation chain the steady-state matrix
    * above never enumerates. Kill after every mutation, both stores:
    * a pure resolve must serve the plain gen0 or the published gen1,
    * and the next writer must recover and converge to retain-2. */
  private def migrationKillMatrix(store: String): Unit = {
    val raw = rawFs(store)
    // count one migration publish's protocol mutations
    val probeBase = Files.createTempDirectory(s"graft-killmig-$store").toString
    val probeDst = new Path(s"$probeBase/t")
    writeGen(probeDst, 0L) // PLAIN dir — no protocol involved
    val counter = new KillFs(raw)
    SwapProtocol.writePointed(counter, probeDst)(writeGen(_, 1L))
    val ops = counter.mutations
    assert(ops >= 5,
      s"$store: migration = marker+retire+pointer then commit+pointer at least, got $ops")

    (0L until ops).foreach { kill =>
      val base = Files.createTempDirectory(s"graft-killmig-$store-$kill").toString
      val dst = new Path(s"$base/t")
      writeGen(dst, 0L) // plain fixture
      val killer = new KillFs(raw)
      killer.remaining = kill
      intercept[KillException] {
        SwapProtocol.writePointed(killer, dst)(writeGen(_, 1L))
      }
      // READ invariant: a pure reader serves a complete generation —
      // the still-plain dir, a retired-but-unpublished __v0, or gen1
      val served = servedTag(raw, dst)
      assert(served == "gen0" || served == "gen1",
        s"$store migration kill=$kill: served $served")
      // WRITE invariant: the next writer reconciles and publishes gen2
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 2L))
      assert(servedTag(raw, dst) == "gen2",
        s"$store migration kill=$kill: recovery publish")
      // and one more steady publish restores retain-2 exactly
      SwapProtocol.writePointed(raw, dst)(writeGen(_, 3L))
      assert(servedTag(raw, dst) == "gen3")
      assert(SwapProtocol.versionDirs(raw, dst).size <= 2,
        s"$store migration kill=$kill: retention must converge to retain-2")
    }
  }

  test("migration publish: kill after EVERY protocol mutation (rename store) — resolvable and writer-recoverable") {
    migrationKillMatrix("rename")
  }

  test("migration publish: kill after EVERY protocol mutation (put store) — resolvable and writer-recoverable") {
    migrationKillMatrix("put")
  }

  test("rename-mode swap: kill after EVERY protocol mutation — readable and writer-recoverable") {
    val raw = rawFs("rename")
    // count one steady swap's protocol mutations
    val probeBase = Files.createTempDirectory("graft-killswap").toString
    val probeDst = new Path(s"$probeBase/t")
    SwapProtocol.writeSwapped(raw, probeDst)(writeGen(_, 0L))
    val counter = new KillFs(raw)
    SwapProtocol.writeSwapped(counter, probeDst)(writeGen(_, 1L))
    val ops = counter.mutations
    assert(ops >= 2, s"expected at least retire+publish renames, got $ops")
    (0L until ops).foreach { kill =>
      val base = Files.createTempDirectory(s"graft-killswap-$kill").toString
      val dst = new Path(s"$base/t")
      SwapProtocol.writeSwapped(raw, dst)(writeGen(_, 0L))
      val killer = new KillFs(raw)
      killer.remaining = kill
      intercept[KillException] {
        SwapProtocol.writeSwapped(killer, dst)(writeGen(_, 1L))
      }
      // READ invariant: a reader-side recovery (pure unless dst is
      // gone) leaves a complete generation readable
      SwapProtocol.recoverForRead(raw, dst)
      val got = spark.read.parquet(dst.toString)
        .select("tag").collect().map(_.getString(0)).toList
      assert(got == List("gen0") || got == List("gen1"),
        s"kill=$kill: read $got")
      // WRITE invariant: the next swap reconciles all residue
      SwapProtocol.writeSwapped(raw, dst)(writeGen(_, 2L))
      assert(spark.read.parquet(dst.toString)
        .select("tag").collect().map(_.getString(0)).toList == List("gen2"))
      val f = raw
      assert(!f.exists(SwapProtocol.tmpPath(dst)) &&
        !f.exists(SwapProtocol.oldPath(dst)),
        s"kill=$kill: the writer must leave no residue")
    }
  }
}
