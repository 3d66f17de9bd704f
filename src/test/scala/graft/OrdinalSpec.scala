package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusReports, Ordinal, Scoring}

/** The distributed global-ordinal kernel (q126's engine), the gate-funnel
  * composition (q127), and the hybrid RRF fusion (q125) on planted /
  * structural fixtures. */
class OrdinalSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("globalOrdinal equals the single-partition sort order, 1..N dense") {
    import spark.implicits._
    // keys deliberately skewed + out of order; tiebreak by id makes the
    // order total
    val df = Seq((5L, "b"), (1L, "a"), (3L, "a"), (2L, "c"), (4L, "a"), (6L, "b"))
      .toDF("id", "k")
    val got = Ordinal.globalOrdinal(df, Seq(col("k"), col("id")), numPartitions = 3)
      .orderBy(col("pos"))
      .select(col("pos"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = Seq((1L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 2L))
    assert(got.toSeq == want)
  }

  test("globalOrdinal survives more partitions than rows and descending keys") {
    import spark.implicits._
    val df = Seq((1L, 0.1), (2L, 0.9), (3L, 0.5)).toDF("id", "v")
    val got = Ordinal.globalOrdinal(df, Seq(col("v").desc, col("id")), numPartitions = 8)
      .orderBy(col("pos")).select(col("id")).as[Long].collect().toSeq
    assert(got == Seq(2L, 3L, 1L))
  }

  test("globalOrdinal positions are dense 1..N at scale and match a local sort") {
    import spark.implicits._
    val n = 5000
    val df = (1 to n).map(i => (i.toLong, (i * 2654435761L) % 977)).toDF("id", "k")
    val got = Ordinal.globalOrdinal(df, Seq(col("k"), col("id")))
      .select(col("pos"), col("id"), col("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).sorted.toSeq == (1L to n.toLong).toSeq)
    val byPos = got.sortBy(_._1).map(t => (t._3, t._2)).toSeq
    val local = got.map(t => (t._3, t._2)).sortBy(identity).toSeq
    assert(byPos == local)
  }

  test("q127 kernel: funnel counts drop at the right stages, monotone per source") {
    import spark.implicits._
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    // 50 filler words incl. a stopword → passes the gate; distinct filler
    // per doc family (fingerprints are corpus-global, so a cross-source
    // repeat would make src1's pair non-canonical)
    val ok = "the " + words(49, "alpha")
    val ok2 = "a " + words(49, "bravo")
    val fixture = Seq(
      // eval split (ids < 50): supplies the contamination vocabulary
      (1L, "eval", "the " + words(49, "leak")),
      // src0: one clean passer, one gate-fail (too short)
      (50L, "src0", ok),
      (51L, "src0", "tiny doc"),
      // src1: an exact-dup pair of passers (one canonical) + a passer
      // contaminated by the eval doc's 5-grams
      (60L, "src1", ok2),
      (61L, "src1", ok2),
      (62L, "src1", "the " + words(49, "leak"))
    ).toDF("doc_id", "source", "text")
    val got = CorpusReports.gateFunnelOf(fixture)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == Seq(
      ("src0", 2L, 1L, 1L, 1L),
      ("src1", 3L, 3L, 2L, 1L)))
    // funnel invariant: n_raw >= n_gate >= n_dedup >= n_clean
    got.foreach { case (_, r, g, dd, c) => assert(r >= g && g >= dd && dd >= c) }
  }

  test("q125 fusion: ranks bounded, rrf consistent with the rank formula") {
    val rows = Scoring.q125HybridRrf(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val den = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.nonEmpty || den.nonEmpty)
      Seq(lex, den).flatten.foreach(rk => assert(rk >= 1 && rk <= 20))
      val want = lex.map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        den.map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-6)
    }
    // descending fused order
    val rrfs = rows.map(_.getDouble(3)).toSeq
    assert(rrfs == rrfs.sorted.reverse)
  }

  test("q128 serves the same lexical arm as q125; dense arm approximates it") {
    val sf = "/root/testdata/sf0.001"
    def arms(rows: Array[org.apache.spark.sql.Row]) = (
      rows.flatMap(r => if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getInt(1))).toMap,
      rows.flatMap(r => if (r.isNullAt(2)) None else Some(r.getLong(0) -> r.getInt(2))).toMap)
    val exact = Scoring.q125HybridRrf(spark, sf).collect()
    val served = Scoring.q128HybridServed(spark, sf).collect()
    val (lexE, denE) = arms(exact)
    val (lexS, denS) = arms(served)
    // the lexical arm is the same certified scorer through the index
    // round-trip: wherever a doc appears in both fused top-10s, its
    // lex_rank must agree
    lexS.keySet.intersect(lexE.keySet).foreach { id =>
      assert(lexS(id) == lexE(id), s"lex_rank diverged for doc $id")
    }
    // the served dense arm is an approximation of the exact scan, not a
    // stranger to it: the two fused top-10s overlap substantially
    val overlap = served.map(_.getLong(0)).toSet
      .intersect(exact.map(_.getLong(0)).toSet).size
    assert(overlap >= 5, s"served/exact fused top-10 overlap only $overlap")
    assert(denS.nonEmpty, "served dense arm contributed nothing")
  }
}
