package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Curation-operator invariants beyond the DuckDB hash certification:
  * the classifier actually learns the gate it distills, the filtered
  * search honors its predicate, semdedup's engine edges equal the brute
  * within-cell pair set, and the prototype cut drops exactly the
  * per-cell closest fraction. */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  private val sf = "/root/testdata/sf0.001"

  private def embMap(): Map[Long, Array[Float]] =
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap

  private def assignment(): Map[Long, Long] =
    IvfIndex.load(spark, Similarity.dedupIvfDir(spark, sf)).cells
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dp / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q101: the distilled classifier agrees with the rule gate it was trained on") {
    val out = Curation.queries("q101_quality_classifier")(spark, sf)
      .select(col("doc_id"), col("keep")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gate = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.ruleGateKeep().cast("long").as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agree = out.count { case (id, k) => gate(id) == k }
    val acc = agree.toDouble / out.size
    // the (n, n²) pair lets the margin carve the gate's n_words band;
    // exact equality is still not the contract (measured 0.96 at sf0.01,
    // up from 0.84 with the linear-n feature set)
    assert(acc >= 0.85, s"classifier/gate agreement $acc below floor")
    assert(out.values.toSet == Set(0L, 1L), "both verdicts must occur")
  }

  test("q101: margins are finite and keep is exactly sign(margin)") {
    val rows = Curation.queries("q101_quality_classifier")(spark, sf)
      .select(col("margin"), col("keep")).collect()
    rows.foreach { r =>
      val m = r.getDouble(0)
      assert(!m.isNaN && !m.isInfinite, s"non-finite margin $m")
      assert(r.getLong(1) == (if (m > 0) 1L else 0L))
    }
  }

  test("q102: every served neighbor satisfies the label predicate; no self matches") {
    val labels = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val rows = Curation.queries("q102_ann_filtered")(spark, sf)
      .select(col("vec_id"), col("rn"), col("nn_id")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, nn) = (r.getLong(0), r.getLong(2))
      assert(q != nn, "self match")
      assert(Curation.FilteredLabels.contains(labels(nn)),
        s"neighbor $nn has disallowed label ${labels(nn)}")
    }
    // ranks are dense from 1 per query
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length),
        s"ranks not dense for query $q")
    }
  }

  test("q103: engine edges equal the brute within-cell >=t pair set") {
    val emb = embMap()
    val asg = assignment()
    val brute = (for {
      a <- asg.keys; b <- asg.keys
      if a < b && asg(a) == asg(b) && cos(emb(a), emb(b)) >= Curation.SemDedupCosT
    } yield (a, b)).toSet
    val members = IvfIndex.load(spark, Similarity.dedupIvfDir(spark, sf)).cells
      .select(col("cell").cast("long").as("cell"), col("vec_id"), col("embedding"))
    val engine = Curation.withinCellEdges(spark, members, Curation.SemDedupCosT)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(engine == brute,
      s"missing=${(brute -- engine).take(5)} extra=${(engine -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must exercise a non-trivial edge set")
  }

  test("q103: representatives are component minima and stay within the cell") {
    val asg = assignment()
    val rows = Curation.queries("q103_semdedup")(spark, sf)
      .select(col("vec_id"), col("cell"), col("keep_id"), col("is_dup"))
      .collect()
    rows.foreach { r =>
      val (v, c, k) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(k <= v, "representative must be the min id")
      assert(asg(v) == c, "reported cell must match the assignment")
      assert(asg(k) == c, "representative must live in the same cell")
      assert(r.getLong(3) == (if (v == k) 0L else 1L))
    }
  }

  test("q104: the cut drops exactly the per-cell closest ceil(frac*n) vectors") {
    val rows = Curation.queries("q104_proto_prune")(spark, sf)
      .select(col("vec_id"), col("cell"), col("dist2"), col("rn"),
        col("n_cell"), col("keep")).collect()
    val asg = assignment()
    assert(rows.length == asg.size, "one row per indexed vector")
    rows.groupBy(_.getLong(1)).foreach { case (cell, rs) =>
      val n = rs.length
      assert(rs.forall(_.getLong(4) == n), s"n_cell mismatch in cell $cell")
      val dropped = rs.filter(_.getLong(5) == 0L)
      val cut = math.ceil(Curation.PruneFrac * n).toLong
      assert(dropped.length.toLong == cut,
        s"cell $cell: dropped ${dropped.length}, expected $cut of $n")
      // the dropped set is exactly the rank prefix (closest to centroid)
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.take(dropped.length).forall(_.getLong(5) == 0L))
      assert(byRank.drop(dropped.length).forall(_.getLong(5) == 1L))
    }
  }
}
