package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-adjudication, pinned without Spark (r19 verdict #1):
  * the calibration-normalized gate alone passed host noise — r19's
  * driver artifact shipped 15 phantom "confirmed" regressions on
  * identical code — so a mover is now confirmed only when a TARGETED
  * reproduction re-pass also still reads slow. Planted prev maps drive
  * every branch: a real (reproducing) slowdown, a phantom (refuted)
  * one, the missing-calibration and missing-repro conservative paths,
  * and the no-movers fast path that must not spend a rerun. */
class BenchVerdictSpec extends AnyFunSuite {

  private val cur = Map("qa" -> 3.0, "qb" -> 1.0, "qc" -> 0.5)
  private val prevEven = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 0.5)

  test("a planted slowdown that REPRODUCES is confirmed") {
    var asked: Seq[String] = Nil
    val (common, med, movers) = Bench.adjudicateMovers(
      prevEven, Some(1.0), cur, 1.0,
      names => { asked = names; names.map(_ -> 2.9).toMap })
    assert(common == Seq("qa", "qb", "qc") && med == 1.0)
    assert(asked == Seq("qa"), "the targeted re-pass runs EXACTLY the raw movers")
    val m = movers match { case Seq(one) => one; case o => fail(o.toString) }
    assert(m.q == "qa" && m.ratioRaw == 3.0 && m.ratioNorm.contains(3.0))
    assert(m.repro.contains(2.9) && m.reproduced.contains(true) && m.confirmed)
  }

  test("a phantom mover (host noise) is REFUTED by the re-pass even when normalization passes it") {
    // equal calibration probes -> the normalized ratio still reads 3.0x
    // (the r19 failure shape: CPU-probe-invisible contention); the
    // targeted rerun reads 1.1 s -> refuted, NOT confirmed
    val (_, _, movers) = Bench.adjudicateMovers(
      prevEven, Some(1.0), cur, 1.0, names => names.map(_ -> 1.1).toMap)
    val m = movers.head
    assert(m.ratioNorm.contains(3.0), "normalization alone would have confirmed it")
    assert(m.reproduced.contains(false) && !m.confirmed)
  }

  test("normalization still clears a mover the calibration explains (slow host, slow repro)") {
    // host 2x slower and the probes witness it: norm = 3.0 * 0.5 = 1.5
    // < 2x -> host drift, not confirmed, even though the repro (on the
    // same slow host) still reads slow
    val (_, _, movers) = Bench.adjudicateMovers(
      prevEven, Some(1.0), cur, 2.0, names => names.map(_ -> 3.0).toMap)
    val m = movers.head
    assert(m.ratioNorm.contains(1.5) && m.reproduced.contains(true) && !m.confirmed)
  }

  test("missing gates are conservative: no prev calibration / no repro timing cannot clear a mover") {
    val (_, _, noCalib) = Bench.adjudicateMovers(
      prevEven, None, cur, 1.0, names => names.map(_ -> 2.9).toMap)
    assert(noCalib.head.ratioNorm.isEmpty && noCalib.head.confirmed,
      "no calibration + reproduced -> still a regression")
    val (_, _, noRepro) = Bench.adjudicateMovers(
      prevEven, Some(1.0), cur, 1.0, _ => Map.empty)
    assert(noRepro.head.repro.isEmpty && noRepro.head.reproduced.isEmpty &&
      noRepro.head.confirmed, "a rerun that failed to time the query cannot CLEAR it")
  }

  test("no raw movers -> the rerun is never invoked") {
    var called = false
    val (_, med, movers) = Bench.adjudicateMovers(
      prevEven, Some(1.0), prevEven, 1.0, _ => { called = true; Map.empty })
    assert(movers.isEmpty && med == 1.0 && !called)
  }

  test("the raw-mover gate needs BOTH >=2x and >=0.4s absolute") {
    // qy: 0.5 -> 1.0 = 2x AND +0.5s -> mover; qx: 0.1 -> 0.3 = 3x but
    // only +0.2s < 0.4 -> not a mover (trivial absolute deltas stay out)
    val (_, _, movers) = Bench.adjudicateMovers(
      Map("qx" -> 0.1, "qy" -> 0.5), Some(1.0),
      Map("qx" -> 0.3, "qy" -> 1.0), 1.0, names => names.map(_ -> 1.0).toMap)
    assert(movers.map(_.q) == Seq("qy"))
  }

  test("readPrevArtifact parses queries and averages the two probes; garbage -> None") {
    val f = java.nio.file.Files.createTempFile("graft-bench-prev", ".json")
    java.nio.file.Files.write(f,
      """{"queries":{"qa":1.500,"qb":0.250},"host_calibration_sec":0.600,
        |"host_calibration_end_sec":0.800,"min_total_sec":1.75}""".stripMargin
        .getBytes("UTF-8"))
    val (qs, calib) = Bench.readPrevArtifact(f.toString).get
    assert(qs == Map("qa" -> 1.5, "qb" -> 0.25))
    assert(calib.exists(c => math.abs(c - 0.7) < 1e-9))
    assert(Bench.readPrevArtifact("/nonexistent/path.json").isEmpty)
    // prev-side failure walls never enter the ratio set (r20 ADVICE):
    // a query listed in the prev artifact's failed_queries is dropped
    // from the returned map, so its meaningless fast wall cannot turn
    // the now-fixed query into a phantom confirmed mover
    val h = java.nio.file.Files.createTempFile("graft-bench-prevfail", ".json")
    java.nio.file.Files.write(h,
      """{"queries":{"qa":1.500,"qb":0.010},"failed_queries":["qb"],
        |"host_calibration_sec":0.600}""".stripMargin.getBytes("UTF-8"))
    val (qs2, _) = Bench.readPrevArtifact(h.toString).get
    assert(qs2 == Map("qa" -> 1.5))
    val g = java.nio.file.Files.createTempFile("graft-bench-bad", ".json")
    java.nio.file.Files.write(g, "not json".getBytes("UTF-8"))
    assert(Bench.readPrevArtifact(g.toString).isEmpty)
  }
}
