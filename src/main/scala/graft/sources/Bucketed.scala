package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFns
import graft.ops.SessionArtifacts

/** Bucketed warehouse layout — the co-located-join tier of the sink family
  * (SURVEY §2.1/§2.4: "repartition()/bucketing for co-located joins").
  *
  * A recurring join key (here `doc_id`, the key every per-doc score/stat
  * table shares) is worth PRE-HASHING at write time: both sides are
  * persisted `bucketBy(N, doc_id)` into the same bucket scheme, so every
  * later join on the key needs ZERO exchanges — the scan itself reports
  * `HashPartitioning(doc_id, N)` and EnsureRequirements inserts nothing.
  * At 100 TB this moves the join's shuffle from every query to one write:
  * the layout is the optimization, which is exactly how a warehouse
  * amortizes a hot join path (dims × facts co-bucketed). The write
  * `repartition(N, doc_id)` first — Spark's repartition hash IS the bucket
  * hash, so each task holds exactly one bucket and writes ONE file per
  * bucket (without it every write task emits a sliver of every bucket and
  * the bucket dirs fragment).
  *
  * Catalog hygiene: the tables are EXTERNAL, their data rooted in a
  * [[SessionArtifacts]] temp dir (build-once per session × dataset,
  * deleted on JVM exit), so repeated sessions never accumulate files under
  * the fixed `spark-warehouse/` path; names carry an (app, dataset) tag so
  * concurrent sessions cannot collide in a shared metastore. */
object Bucketed {

  // sized by: parallelism at the certification scale (local[32], sf0.1)
  // — the dial is bytes-per-bucket: a deployment sizes N so each
  // bucket's largest co-bucketed table slice fits one task's memory/
  // split budget (~128-512 MB), N IDENTICAL across the co-bucketed pair
  // (differing counts force the exchange back), and a power of two so a
  // 2× resize splits/merges buckets without re-hashing the key space
  private[graft] val NumBuckets = 8

  /** Names of the bucketed (docs, doc-stats) table pair for dataset `d`,
    * built once per (session, dataset). */
  private[graft] def tables(s: SparkSession, d: String): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${s.sparkContext.applicationId}|$d".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    val docsT = s"graft_docs_b_$tag"
    val statsT = s"graft_doclen_b_$tag"
    SessionArtifacts.dir("bucketed", s, d) { t =>
      val docs = Tables.documents(s, d)
      docs.select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .repartition(NumBuckets, col("doc_id"))
        .write.format("parquet")
        .bucketBy(NumBuckets, "doc_id").sortBy("doc_id")
        .option("path", s"$t/docs")
        .mode("overwrite").saveAsTable(docsT)
      docs.select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_toks"))
        .repartition(NumBuckets, col("doc_id"))
        .write.format("parquet")
        .bucketBy(NumBuckets, "doc_id").sortBy("doc_id")
        .option("path", s"$t/stats")
        .mode("overwrite").saveAsTable(statsT)
    }
    (docsT, statsT)
  }

  /** q134: the co-located join itself — bucketed docs ⋈ bucketed per-doc
    * stats on the bucket key. Values are trivially the corpus joined with
    * its own token counts (the oracle recomputes them in one scan); the
    * MECHANICS are the certified part: PlanAuditSpec asserts the join runs
    * with no hash exchange on either side and that both scans read
    * `Bucketed: true` — the plan shape that makes the join free at 100 TB. */
  val q134BucketedJoin: (SparkSession, String) => DataFrame = (s, d) => {
    val (docsT, statsT) = tables(s, d)
    s.table(docsT).join(s.table(statsT), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("n_toks"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q134_bucketed_join" -> q134BucketedJoin)

  // The join output IS the corpus with its token counts — the oracle
  // recomputes both sides' contents from the raw table; the bucketed
  // layout changes the plan, never the answer.
  def oracle: Map[String, String] = Map(
    "q134_bucketed_join" ->
      """SELECT doc_id, source, lang, n_chars,
        |  CAST(len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin)
}
