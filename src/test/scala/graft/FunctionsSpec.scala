package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Gps, TextFns}

/** Unit + property-style tests for the scalar function layer (C4/C13/C14).
  * Property cases are enumerated deterministically (seeded) so the suite is
  * reproducible without a scalacheck-bridge dependency. */
class FunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  test("dms_to_decimal parses the reference-shaped DMS strings (preview_data.ipynb:cell-8)") {
    val df = Seq(
      """38 deg 55' 58.80" N""",
      """77 deg 2' 11.40" W""",
      """0 deg 0' 0.0" N""",
      "garbage").toDF("dms")
    val got = df.select(Gps.dmsToDecimal($"dms").as("d")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(math.abs(got(0).get - 38.933) < 1e-9)
    assert(math.abs(got(1).get - (-77.03650)) < 1e-4)
    assert(got(2).get == 0.0)
    assert(got(3).isEmpty)
  }

  test("dms roundtrip property: construct -> parse recovers the value") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(50)((rnd.nextInt(90), rnd.nextInt(60), rnd.nextInt(600)))
    val rows = cases.map { case (deg, m, s10) =>
      val sec = s10 / 10.0
      (f"""$deg deg $m' $sec%.1f" S""", -(deg + m / 60.0 + sec / 3600.0))
    }
    val got = rows.toDF("dms", "want")
      .select(Gps.dmsToDecimal($"dms").as("d"), $"want").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("exif timestamp parse with zone (C14)") {
    val df = Seq("2021:01:04 18:59:50-05:00").toDF("s")
      .select(date_format(Gps.exifTimestamp($"s"), "yyyy-MM-dd HH:mm:ss").as("utc"))
    assert(df.head().getString(0) == "2021-01-04 23:59:50") // UTC session TZ
  }

  test("whitespace normalization is idempotent and canonical (C4 property)") {
    val rnd = new scala.util.Random(7)
    val atoms = Seq("ab", "x1", " ", "\t", "\n", "  ", "word")
    val cases = Seq.fill(100)(Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.length))).mkString)
    val once = cases.toDF("t").select(TextFns.normText($"t").as("n")).collect().map(_.getString(0))
    val twice = once.toSeq.toDF("t").select(TextFns.normText($"t").as("n")).collect().map(_.getString(0))
    once.zip(twice).foreach { case (a, b) => assert(a == b) }
    once.foreach(s => assert(!s.contains("  ") && s == s.trim))
  }

  test("token count matches reference ' '.join(split()) semantics") {
    val df = Seq(("a  b\tc\nd ", 4), ("single", 1)).toDF("t", "want")
    df.select(TextFns.tokenCount($"t").as("n"), $"want").collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1))
    }
  }

  test("word shingles produce distinct space-joined n-grams") {
    val df = Seq("a b c d").toDF("t")
    val got = df.select(TextFns.wordShingles($"t", 2).as("s")).head().getSeq[String](0)
    assert(got == Seq("a b", "b c", "c d"))
  }

  test("property: gram hash kernel agrees with wordShingles on count and equality structure") {
    // the FNV kernel must see exactly the distinct n-grams the declarative
    // shingle expression produces — same count, and equal shingle sets ⇔
    // equal hash sets (random token strings, n = 2..5)
    val rnd = new scala.util.Random(0x6AA5)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(4)
      val toks = Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.length)))
      val text = toks.mkString(" ")
      val kernel = TextFns.distinctGramHashKernel(n)(text)
      val shingles = Seq(text).toDF("t")
        .select(TextFns.wordShingles($"t", n).as("s")).head().getSeq[String](0)
      assert(kernel.length == shingles.distinct.length,
        s"trial $trial n=$n: ${kernel.length} hashes vs ${shingles.distinct.length} shingles")
      // permuting the SAME token multiset differently must change the set
      // only when the shingle set changes (hash = function of shingle)
      val text2 = rnd.shuffle(toks).mkString(" ")
      val kernel2 = TextFns.distinctGramHashKernel(n)(text2)
      val shingles2 = Seq(text2).toDF("t")
        .select(TextFns.wordShingles($"t", n).as("s")).head().getSeq[String](0)
      assert((kernel.toSet == kernel2.toSet) == (shingles.toSet == shingles2.toSet),
        s"trial $trial n=$n: hash-set equality must track shingle-set equality")
    }
  }

  test("bpe pre-tokens split contractions, words, numbers, punctuation") {
    val got = Seq("I'll pay 42 dollars, obviously!").toDF("t")
      .select(TextFns.bpeTokens($"t").as("toks")).head().getSeq[String](0)
    assert(got == Seq("I", "'ll", " pay", " 42", " dollars", ",", " obviously", "!"))
  }

  test("winnowing guarantee: shared substring >= k+w-1 chars shares a fingerprint") {
    // MOSS property (k=8, w=4): any common substring of length >= 11 must
    // yield at least one common fingerprint; disjoint-alphabet texts none
    val core = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      ("a", s"PREFIX ONE $core SUFFIX A"),
      ("b", s"completely different start $core and another ending"),
      ("c", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")).toDF("id", "t")
      .select($"id", TextFns.winnowedFingerprints($"t").as("fp"))
    val fp = df.collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert((fp("a") intersect fp("b")).nonEmpty, "shared core must share fingerprints")
    assert((fp("a") intersect fp("c")).isEmpty, "disjoint texts must not collide")
    // duplicate content has identical fingerprint sets (dedup key property)
    val dup = Seq(("x", core), ("y", core)).toDF("id", "t")
      .select($"id", TextFns.winnowedFingerprints($"t").as("fp"))
      .collect().map(_.getSeq[String](1).toSet)
    assert(dup(0) == dup(1) && dup(0).nonEmpty)
  }
}
