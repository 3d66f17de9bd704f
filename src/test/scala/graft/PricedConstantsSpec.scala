package graft

import org.scalatest.funsuite.AnyFunSuite

/** The priced-constant tripwire (r17 verdict #2), ExactnessLedgerSpec-
  * style: every certified operating constant in the dedup / ANN /
  * decontamination / retrieval families must carry a same-line-or-
  * adjacent `priced by qNNN` marker tying it to the knob-sweep query
  * that measured its tradeoff — and every such marker must name a query
  * that actually exists in the surface, so a renamed or deleted sweep
  * breaks here BY NAME instead of leaving a dangling citation.
  *
  * The registry below is the ledger: (file, anchor regex) pairs that
  * must appear AND be marked. A new certified constant joins the
  * registry together with its pricing query; a constant moved to a new
  * default re-certifies (its sweep query's oracle pins the new point).
  */
class PricedConstantsSpec extends AnyFunSuite {

  private val root = "src/main/scala/graft"

  private def lines(f: String): Vector[String] = {
    // ISO-8859-1: lossless byte view (one source file has a non-UTF8
    // literal; everything swept here is ASCII)
    val src = scala.io.Source.fromFile(s"$root/$f")("ISO-8859-1")
    try src.getLines().toVector finally src.close()
  }

  private val marker = "priced by (q\\d+)".r

  /** (file, anchor-regex): the certified constants that MUST be priced.
    * The marker may sit on the anchor line or up to four lines above it
    * (parameter-list markers precede the signature line). */
  private val registry: Seq[(String, String)] = Seq(
    ("ops/Dedup.scala", "val NumHashes = "),          // q214 signature length
    ("ops/Dedup.scala", "val Bands = "),              // q226 banding
    ("ops/Dedup.scala", "val BucketCap = "),          // q123 bucket profile
    ("ops/Dedup.scala", "val SimBands = "),           // q221 SimHash layout
    ("ops/Dedup.scala", "col\\(\"hamming\"\\) <= 3"), // q221 SimHash radius
    ("ops/Dedup.scala", "val SpanK = "),              // q205 span length
    ("ops/TextOps.scala", "distinctGramHashes\\(col\\(\"text\"\\), 5\\)"), // q223 detector order
    ("ops/TextOps.scala", "k = 8, w = 4"),            // q220 winnow window
    ("ops/Relational.scala", "kmv_distinct\\(u, 256\\)\"\\)\\.as\\(\"kmv_nd\""), // q212 sketch size (q92 default; q212's own sweep points are the pricing)
    ("streaming/Incremental.scala", "k: Int = 128\\): StreamingQuery"), // q219 sample size
    ("ops/InvertedIndex.scala", "k1: Double = 1.2, b: Double = 0.75"),  // q218 BM25
    ("ops/Scoring.scala", "k1: Double = 1.2, k1p1"),  // q218 BM25 (batched)
    ("ops/IvfIndex.scala", "nCells: Int = 32"),       // q213 nlist
    ("ops/IvfIndex.scala", "maxFitRows: Long = 50000L,"), // q228 fit cap
    ("ops/IvfSq.scala", "shortlist: Int = 12"),       // q208 rerank shortlist
    ("ops/IvfPq.scala", "shortlist: Int = 12"),       // q210 rerank shortlist
    ("ops/BloomSketch.scala", "fpp: Double = 0.01"),  // q224 filter sizing
    ("ops/Multimodal.scala", "val PhashHamMax16 = "), // q225 radius (16-bit certification lattice)
    ("ops/Multimodal.scala", "val PhashHamMax64 = "), // q229 radius (64-bit production lattice knee)
    ("ops/Scoring.scala", "stat\\.countMinSketch\\(\"term\", 0.0001, 0.99, 7\\)"), // q230 CMS sizing
    ("ops/Temporal.scala", "session_window\\(col\\(\"ts\"\\), \"30 minutes\"\\)"), // q222 gap
    ("ops/CorpusReports.scala", "\\.as\\(\"temp_share\"\\)"), // q216 temperature
  )

  test("every registered certified constant carries a `priced by qNNN` marker") {
    val offenders = registry.flatMap { case (f, anchor) =>
      val ls = lines(f)
      val re = anchor.r
      val hits = ls.zipWithIndex.filter { case (l, _) => re.findFirstIn(l).isDefined }
      if (hits.isEmpty) Seq(s"$f: anchor /$anchor/ matches nothing (constant moved? update the registry)")
      else hits.flatMap { case (_, i) =>
        val window = ls.slice(math.max(0, i - 4), i + 1)
        if (window.exists(l => marker.findFirstIn(l).isDefined)) None
        else Some(s"$f:${i + 1}: /$anchor/ has no `priced by qNNN` marker")
      }
    }
    assert(offenders.isEmpty,
      s"unpriced certified constants:\n${offenders.mkString("\n")}")
  }

  /** The LAYOUT-knob ledger (r18 verdict #7): capacity/deployment
    * constants — bucket counts, shard counts, file-size targets,
    * compaction triggers — are sized by the deployment, not priced by an
    * accuracy sweep, so each must instead carry an adjacent `sized by:`
    * rationale pinning WHY its default is what it is and which dial a
    * deployment turns. Window is wider than the priced markers' (the
    * rationale precedes a multi-line signature). */
  private val sizedRegistry: Seq[(String, String)] = Seq(
    ("sources/Bucketed.scala", "val NumBuckets = "),
    ("sources/ShardExport.scala", "nShards: Int = 8, maxRecordsPerFile: Int = 1 << 20"),
    ("sources/Compaction.scala", "targetBytes: Long = 128L << 20"),
    ("streaming/Incremental.scala", "growthRatio: Double = 4.0, minRollupRows: Long = 1000L\\): Boolean"),
    ("ops/Scoring.scala", "val HeavyThreshold = 900L"), // q88 support floor (workload knob; q230 prices the sketch serving it)
  )

  test("every registered layout knob carries a `sized by:` rationale") {
    val offenders = sizedRegistry.flatMap { case (f, anchor) =>
      val ls = lines(f)
      val re = anchor.r
      val hits = ls.zipWithIndex.filter { case (l, _) => re.findFirstIn(l).isDefined }
      if (hits.isEmpty) Seq(s"$f: anchor /$anchor/ matches nothing (knob moved? update the registry)")
      else hits.flatMap { case (_, i) =>
        val window = ls.slice(math.max(0, i - 12), i + 1)
        if (window.exists(_.contains("sized by"))) None
        else Some(s"$f:${i + 1}: /$anchor/ has no `sized by:` rationale")
      }
    }
    assert(offenders.isEmpty,
      s"layout knobs with no pinned rationale:\n${offenders.mkString("\n")}")
  }

  test("every `priced by qNNN` marker in main source names a live query") {
    val prefixes = SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      .toArray.map(_.toString).filter(_.endsWith(".scala"))
    val bad = files.flatMap { f =>
      val src = scala.io.Source.fromFile(f)("ISO-8859-1")
      val ls = try src.getLines().toVector finally src.close()
      ls.zipWithIndex.flatMap { case (l, i) =>
        marker.findAllMatchIn(l).collect {
          case m if !prefixes.contains(m.group(1)) =>
            s"$f:${i + 1}: `priced by ${m.group(1)}` names no live query"
        }
      }
    }
    assert(bad.isEmpty, s"dangling pricing citations:\n${bad.mkString("\n")}")
  }
}
