package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.BpeTrain

/** The distributed BPE trainer on the textbook fixture (the hug/pug/pun
  * corpus): learned merges, apply-side parity, early stop, and round-1
  * agreement with the certified q129 pair-statistics kernel. */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  // hug x10, pug x5, pun x12, bun x4, hugs x5 — the classic worked example:
  // pair weights round 1: ug=20, pu=17, un=16, hu=15, gs=5, bu=4
  private def fixture = {
    import spark.implicits._
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
  }

  test("fit learns the textbook merge sequence deterministically") {
    val merges = BpeTrain.fit(fixture, nMerges = 3)
    assert(merges == Seq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("segment reproduces the trained segmentation") {
    val merges = BpeTrain.fit(fixture, nMerges = 3)
    assert(BpeTrain.segment("hugs", merges) == Seq("hug", "s"))
    assert(BpeTrain.segment("pun", merges) == Seq("p", "un"))
    // unseen word: merges apply where they match, chars remain elsewhere
    assert(BpeTrain.segment("gun", merges) == Seq("g", "un"))
  }

  test("fit stops early when no pair repeats") {
    import spark.implicits._
    val unique = Seq((1L, "ab"), (2L, "cd"), (3L, "ef")).toDF("doc_id", "text")
    // every adjacent pair occurs once — merging buys nothing, loop exits
    assert(BpeTrain.fit(unique, nMerges = 10).isEmpty)
  }

  test("round-1 statistics equal the certified q129 kernel's head") {
    import spark.implicits._
    // the q129 pair table over the fixture: its top row is the first merge
    val top = BpeTrain.wordCounts(fixture)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"),
        col("n"))
      .groupBy(col("pair")).agg(sum(col("n")).as("weight"))
      .orderBy(col("weight").desc, col("pair"))
      .limit(1).as[(String, Long)].collect().head
    assert(top == ("ug", 20L))
    val first = BpeTrain.fit(fixture, nMerges = 1).head
    assert(first._1 + first._2 == top._1)
  }

  test("merge kernel equals greedy string replace on round-1 symbols (q130's contract)") {
    import spark.implicits._
    // the adversarial shapes: overlapping repeats of the same pair,
    // a == b runs with odd/even length, pair at word boundaries
    val words = Seq("anana", "aaaa", "aaa", "ababab", "na", "banana")
    val df = words.map(w => (w, 1L)).toDF("w", "n")
    def occVia(pair: String) = {
      val a = pair.substring(0, 1); val b = pair.substring(1, 2)
      df.select(col("w"),
          (length(col("w")) - size(BpeTrain.applyMergeUdf(
            expr("filter(split(w, ''), s -> s <> '')"), lit(a), lit(b)))).as("occ"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    }
    val an = occVia("an")
    words.foreach { w =>
      assert(an(w) == w.length - w.replace("an", "X").length,
        s"kernel/replace disagree on '$w' for pair 'an'")
    }
    val aa = occVia("aa")
    words.foreach { w =>
      assert(aa(w) == w.length - w.replace("aa", "X").length,
        s"kernel/replace disagree on '$w' for pair 'aa'")
    }
    // spot-check the greedy semantics directly
    assert(aa("aaaa") == 2 && aa("aaa") == 1 && an("banana") == 2)
  }

  test("q146 fertility: pieces-per-token >= 1, internally consistent, totals match q145") {
    val sf = "/root/testdata/sf0.001"
    val fert = graft.ops.TextOps.q146TokFertility(spark, sf).collect()
    assert(fert.nonEmpty)
    fert.foreach { r =>
      val (n, p, f) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(p >= n, s"pieces < tokens for ${r.getString(0)}")
      assert(math.abs(f - p.toDouble / n) < 5e-5, s"fertility != pieces/tokens: $r")
    }
    // every corpus token is attributed to exactly one source: the
    // per-source totals must sum to the q145 vocabulary's token mass
    val q145Total = graft.ops.TextOps.q145BpeSegment(spark, sf)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(fert.map(_.getLong(1)).sum == q145Total)
  }

  test("segment preserves content: concatenated symbols always rebuild the word") {
    // the invariant the q145 oracle replay RELIES on (symbol boundaries
    // are bookkeeping; the character stream is untouched), checked over
    // a deterministic pseudo-random vocabulary and merge list
    val rnd = new scala.util.Random(13)
    val alpha = "abcd"
    val words = (0 until 200).map(_ =>
      (0 until 1 + rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val merges = Seq(("a", "b"), ("c", "d"), ("ab", "cd"), ("b", "a"),
      ("abcd", "abcd"), ("d", "c"), ("ba", "dc"))
    words.foreach { w =>
      val syms = BpeTrain.segment(w, merges)
      assert(syms.mkString("") == w, s"content lost: '$w' -> $syms")
      assert(syms.forall(_.nonEmpty))
    }
  }

  test("long-vocabulary run keeps driver state merge-sized and converges") {
    import spark.implicits._
    // 40 distinct words over a small alphabet: many productive merges;
    // the loop's localCheckpoint cadence (every 8) is exercised
    val words = (0 until 40).map(i => s"pre${(i % 4)}mid${(i % 5)}end")
    val docs = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(2 + i % 3)((i.toLong, w)) }
      .toDF("doc_id", "text")
    val merges = BpeTrain.fit(docs, nMerges = 20)
    assert(merges.nonEmpty && merges.size <= 20)
    // applying the merges shrinks every trained word's symbol count
    val sampled = words.take(5)
    sampled.foreach { w =>
      assert(BpeTrain.segment(w, merges).length < w.length)
    }
  }

  test("maxMatch: greedy longest prefix, codepoint-safe, diverges from merge-order BPE where greed beats priority") {
    val vocab = Set("a", "b", "c", "bc", "ab")
    // merge order blocks 'ab' (bc consumed the b first); greed takes it
    assert(BpeTrain.maxMatch("abc", vocab, 2) == Seq("ab", "c"))
    assert(BpeTrain.segment("abc", Seq(("b", "c"), ("a", "b"))) == Seq("a", "bc"))
    // an astral symbol is one codepoint: never sheared, counts as len 1
    assert(BpeTrain.maxMatch("a😀b", Set("a", "b", "😀"), 2)
      == Seq("a", "😀", "b"))
    // a codepoint missing from the vocab is emitted as its own symbol
    assert(BpeTrain.maxMatch("axb", Set("a", "b"), 1) == Seq("a", "x", "b"))
    // greedy is leftmost-longest even when a shorter start packs better:
    // vocab {aa, aab}: 'aaba' -> aab a (3 would need lookahead)
    assert(BpeTrain.maxMatch("aaba", Set("a", "b", "aa", "aab"), 3)
      == Seq("aab", "a"))
    // lossless on every input
    Seq("abc", "aaba", "zzz", "a😀b").foreach { w =>
      assert(BpeTrain.maxMatch(w, vocab, 2).mkString("") == w)
    }
  }
}
