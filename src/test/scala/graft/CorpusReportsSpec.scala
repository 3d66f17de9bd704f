package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusReports

/** The corpus-diagnostic reports on PLANTED fixtures: the certification
  * corpus is exact-dup-free, so q115's size>1 histogram branches and
  * q118's sharing matrix are certified there only as negatives — these
  * units plant the structure and pin the arithmetic. */
class CorpusReportsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  test("q199: planted copy classes (unique/pair/many) fold with exact quality means") {
    import spark.implicits._
    // the certification corpus is exact-dup-free, so q199's pair/many
    // branches certify there only as absent rows — plant all three
    // classes in a temp documents table and pin the fold
    val tmp = java.nio.file.Files.createTempDirectory("graft-q199").toString
    val body = "the quick brown fox jumps over a lazy dog of winter"
    Seq(
      (1L, s"$body unique one", "srcA"),
      (2L, s"$body pair text", "srcA"), (3L, s"$body pair text", "srcA"),
      (4L, s"$body many copies", "srcB"), (5L, s"$body many copies", "srcB"),
      (6L, s"$body many copies", "srcB"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")
    val got = CorpusReports.q199DupQuality(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byClass = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byClass == Map("unique" -> ((1L, 1L)), "pair" -> ((2L, 1L)),
      "many" -> ((3L, 1L))), got.mkString(","))
    // every class's members share one text shape -> the exact mean IS
    // the per-doc rounded-4 quality (never null, in (0, 1])
    got.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0, r.toString))
  }

  test("q115 kernel: planted clusters of size 1/2/3 land in the right buckets") {
    import spark.implicits._
    // 4 singletons + one pair + one triple (whitespace variants of one
    // text must fingerprint together — the normText contract)
    val docs = Seq(
      (1L, "unique one"), (2L, "unique two"), (3L, "unique three"), (4L, "unique four"),
      (10L, "dup pair text"), (11L, " dup  pair   text "),
      (20L, "triple body"), (21L, "triple body"), (22L, "triple  body"))
      .toDF("doc_id", "text")
    val got = CorpusReports.dupClusterHistOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 4L, 4L), (2L, 1L, 2L), (3L, 1L, 3L)))
    // conservation: every doc is in exactly one cluster
    assert(got.map(_._3).sum == 9L)
  }

  test("q118 kernel: sources sharing content pair up; direction never double-counts") {
    import spark.implicits._
    val docs = Seq(
      // "mirror" appears in s1, s2, s3 → pairs (s1,s2), (s1,s3), (s2,s3)
      (1L, "s1", "mirror article"), (2L, "s2", "mirror article"),
      (3L, "s3", "mirror  article"),
      // "feed" shared by s1 and s2 only — (s1,s2) rises to 2
      (4L, "s1", "feed item"), (5L, "s2", "feed item"),
      // same text twice WITHIN one source: no self-pair
      (6L, "s4", "inhouse dup"), (7L, "s4", "inhouse dup"),
      (8L, "s5", "unshared"))
      .toDF("doc_id", "source", "text")
    val got = CorpusReports.crossSourceDupsOf(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("s1", "s2", 2L), ("s1", "s3", 1L), ("s2", "s3", 1L)))
  }

  test("q121 kernel: waterfill caps the big sources and drains the budget") {
    import spark.implicits._
    // hand-checkable: tokens 10/20/70, budget 50 → boundary at the 70
    // source, cap = (50 − 30) / 1 = 20; allocations 10 + 20 + 20 = 50
    val ps = Seq(("a", 10L), ("b", 20L), ("c", 70L)).toDF("source", "ntoks")
    val got = CorpusReports.waterfillOf(ps, 50L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(("a", 10L, false), ("b", 20L, false), ("c", 20L, true)))

    // equal sources: the boundary binds at row 1, everyone gets the floor
    // cap, remainder (< #sources) stays unallocated
    val eq = Seq(("a", 100L), ("b", 100L), ("c", 100L)).toDF("source", "ntoks")
    val got2 = CorpusReports.waterfillOf(eq, 100L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(got2.forall(_ == (33L, true)))

    // budget covers everything: nobody is capped
    val free = CorpusReports.waterfillOf(ps, 1000L)
      .collect().map(r => (r.getLong(2), r.getBoolean(3)))
    assert(free.toSeq == Seq((10L, false), (20L, false), (70L, false)))
  }

  test("q137: domain waterfill partitions the corpus by index cell and respects the budget") {
    val rows = CorpusReports.q137DomainWaterfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // domains are exactly the doc index's cells, each doc counted once
    val idx = graft.ops.IvfIndex.load(spark,
      graft.ops.Scoring.docIvfDir(spark, sf))
    assert(rows.map(_._1).toSet ==
      idx.cells.select(col("cell")).distinct().collect().map(_.getInt(0).toLong).toSet)
    val total = rows.map(_._2).sum
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.nonEmpty && total > 0)
    assert(idx.cells.count() == nDocs, "every doc must carry exactly one domain")
    // allocation obeys the waterfill contract: alloc <= ntoks, uncapped
    // domains run free, and the total drains the budget up to < #domains
    val budget = total / 2
    val alloc = rows.map(_._3).sum
    assert(rows.forall { case (_, nt, al, capped) => al <= nt && (capped || al == nt) })
    assert(alloc <= budget && budget - alloc < rows.length,
      s"allocations must fill the budget modulo the integer remainder: $alloc vs $budget")
  }

  test("q116: bucket boundaries are integer-exact at powers of two") {
    import spark.implicits._
    // frequencies 1, 2, 4, 8 — each must land in bucket log2(n) EXACTLY
    // (the float-log2 knife-edge this kernel's bin-length form avoids)
    val text = (Seq.fill(8)("eight") ++ Seq.fill(4)("four") ++
      Seq.fill(2)("two") ++ Seq("one")).mkString(" ")
    val docs = Seq((1L, "xx", text)).toDF("doc_id", "lang", "text")
    val got = docs
      .select(col("lang"), explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang"), (length(bin(col("n"))) - 1).cast("long").as("freq_bucket"))
      .agg(count(lit(1)).as("n_types"), sum(col("n")).as("n_occurrences"))
      .orderBy(col("freq_bucket"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 4L), (3L, 1L, 8L)))
  }

  test("q169: the corpus head Zipf-decays (negative slope, meaningful fit)") {
    val r = graft.ops.CorpusReports.q169ZipfFit(spark, sf).collect().head
    val (k, slope, intercept, r2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val nTypes = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(k == math.min(100L, nTypes), "fit runs over the whole available head")
    assert(slope < -0.1, s"rank-frequency must decay: slope $slope")
    assert(intercept > 0.0, s"head frequency must be positive in log space: $intercept")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 is a proportion: $r2")
  }

  test("q169 kernel: an exactly-Zipfian fixture reads slope -1 with r2 1") {
    import spark.implicits._
    // word w_r appears round(1200 / r) times: frequencies 1200/r for
    // ranks 1..12 — ln(ct) = ln(1200) - ln(rank) exactly up to rounding
    val text = (1 to 12)
      .flatMap(r => Seq.fill(1200 / r)(s"w${('a' + r).toChar}"))
      .mkString(" ")
    val r = graft.ops.CorpusReports.zipfFitOf(
      Seq((1L, text)).toDF("doc_id", "text")).collect().head
    val (k, slope, intercept, r2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(k == 12L)
    assert(math.abs(slope - (-1.0)) < 0.02, s"slope $slope should read -1")
    assert(math.abs(intercept - math.log(1200.0)) < 0.05,
      s"intercept $intercept should read ln(1200)")
    assert(r2 > 0.999, s"an exact power law must fit: r2 $r2")
  }

  test("q170: growth curve is monotone and its last decile equals the corpus totals") {
    val rows = graft.ops.CorpusReports.q170VocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (1L to 10L), "one row per decile, ordered")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4,
        s"cumulative columns must be monotone: $a -> $b")
    }
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nTokens = docs.select(sum(graft.functions.TextFns.tokenCount(col("text"))))
      .collect().head.getLong(0)
    val nTypes = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .distinct().count()
    assert(rows.last == ((10L, nDocs, nTokens, nTypes)),
      s"decile 10 must cover the whole corpus: ${rows.last} vs ($nDocs, $nTokens, $nTypes)")
    // the knee the report exists to expose: early data buys types faster
    // than late data (strictly sub-linear growth on a natural corpus)
    val half = rows(4)._4
    assert(half > rows.last._4 / 2,
      s"vocab growth must be concave: ${half} types at decile 5 of ${rows.last._4}")
  }
}
