package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes EVERY declared query end-to-end against the real sf0.001
  * testdata. This is the drift tripwire: the driver regenerates
  * /root/testdata between rounds, and Verify deliberately isolates
  * per-query failures (a throwing query logs to stderr and writes no
  * dump), so a silent schema change — e.g. events.ts shipping as
  * TIMESTAMP(NANOS) in one generation and timestamp[us]/NTZ in the next,
  * which cost 13 correctness rows in round 10 — must fail HERE, loudly,
  * in `sbt test`, not vanish from the driver's correctness report.
  *
  * Every plan executes to COMPLETION (`toRdd.count()` — no row
  * conversion, no result collection): a `limit(1)` would stop after the
  * first non-empty partition, and a generation whose drift lives in a
  * later file would slip through the very tripwire built to catch it.
  * One aggregate test keeps the suite's test count meaningful (the
  * per-query names are in the failure message).
  */
class QuerySmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("every SparkEntry query executes against current testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).queryExecution.toRdd.count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on current testdata:\n${failures.mkString("\n")}")
  }
}
