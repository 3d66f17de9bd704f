package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The native as-of join operator (plans.AsOfJoin): semantics on hand-built
  * edges, agreement with the q59 window composition on real data, and the
  * physical plan shape (co-clustered exchanges + sorts, no window). */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("as-of semantics: greatest right time <= left time, per key, else nulls") {
    val left = Seq(
      (1L, ts(100), "l1"), // matches r@100 (equal time is inclusive)
      (1L, ts(150), "l2"), // matches r@120, not r@200
      (1L, ts(50), "l3"),  // before any purchase -> null
      (2L, ts(500), "l4"), // key with no right rows at all -> null
      (3L, ts(999), "l5")  // matches key 3's only row
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(100), 10.0),
      (1L, ts(120), 12.0),
      (1L, ts(200), 20.0),
      (3L, ts(1), 1.0)
    ).toDF("rk", "rt", "rv")
    val out = AsOfJoin(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("tag"), col("rv")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(
      "l1" -> Some(10.0), "l2" -> Some(12.0), "l3" -> None,
      "l4" -> None, "l5" -> Some(1.0)))
  }

  test("native as-of equals the q59 union+window composition on events") {
    val d = "/root/testdata/sf0.001"
    val native = ops.Temporal.q63AsofNative(spark, d).collect().map(_.toSeq).toSeq
    val composed = ops.Temporal.q59AsofJoin(spark, d).collect().map(_.toSeq).toSeq
    assert(native.nonEmpty)
    assert(native == composed)
  }

  test("plan: both sides exchange on the key and sort; no window operator") {
    val d = "/root/testdata/sf0.001"
    val p = ops.Temporal.q63AsofNative(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // exec node prints without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("Window"), "the native operator must not fall back to a window")
  }

  test("property: random instances agree with an independent per-key scan") {
    // randomized semantics check: for arbitrary key/time multisets (with
    // duplicate times and keys present on only one side), the operator must
    // equal the obvious O(n·m) per-key reference computed driver-side
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val nL = 200 + rnd.nextInt(200)
      val nR = 200 + rnd.nextInt(200)
      val lRows = (0 until nL).map(i => (rnd.nextInt(12).toLong, ts(rnd.nextInt(500)), i.toLong))
      val rRows = (0 until nR).map(i => (rnd.nextInt(15).toLong, ts(rnd.nextInt(500)), i * 10.0))
      val out = AsOfJoin(
        lRows.toDF("k", "t", "lid"), rRows.toDF("rk", "rt", "rv"),
        Seq("k"), Seq("rk"), "t", "rt")
        .select(col("lid"), col("rt")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getTimestamp(1)))).toMap
      lRows.foreach { case (k, t, lid) =>
        // reference: the greatest right time <= t among rows with this key
        val want = rRows.filter(r => r._1 == k && !r._2.after(t)).map(_._2)
          .sortBy(_.getTime).lastOption
        assert(out(lid) == want, s"trial $trial: left $lid (k=$k, t=$t)")
      }
    }
  }

  test("many rows per key stream through the merge (state is one row)") {
    // 20k interleaved rows, 4 keys: the merge must hold one right row, not
    // the key's history; result spot-checked against a window computation
    val left = (0 until 10000).map(i => (i % 4L, ts(i * 10 + 5), i)).toDF("k", "t", "id")
    val right = (0 until 10000).map(i => (i % 4L, ts(i * 10), i * 1.0)).toDF("rk", "rt", "rv")
    val out = AsOfJoin(left, right, Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() == 10000)
    // every left row has a match (right row at t-5 with same key exists
    // exactly when i has the same residue — which it does by construction)
    assert(out.filter(col("rv").isNull).count() == 0)
    // the matched right value is the one at the same index (rt = t - 5)
    val bad = out.filter(col("rv") =!= col("id").cast("double")).count()
    assert(bad == 0, s"$bad rows matched a stale right row")
  }
}
