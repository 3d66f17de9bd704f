package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Vectors

/** Dense-vector scalar layer: double-widened math, kernel/HOF agreement,
  * and the random-hyperplane LSH bucket (determinism + input guards). */
class VectorsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val rows = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 2.0f, 0.0f, 0.0f)),
    (3L, Array(3.0f, 4.0f, 0.0f, 0.0f)))

  test("dot / norm2 / cosine compute double-widened exact values") {
    val df = rows.toDF("id", "v")
    val got = df.select($"id", round(Vectors.norm2($"v"), 6).as("n")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 5.0))
    val cos = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select($"a.id", $"b.id", round(Vectors.cosine($"a.v", $"b.v"), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cos((1L, 2L)) == 0.0)
    assert(cos((1L, 3L)) == 0.6) // (3,4,0,0)·(1,0,0,0) / 5 = 0.6
  }

  test("cosineKernel agrees bit-for-bit with the expression form") {
    val df = rows.toDF("id", "v")
    val pairs = df.as("a").join(df.as("b"), $"a.id" <= $"b.id")
    val diff = pairs.select(
      (Vectors.cosineKernel($"a.v", $"b.v") - Vectors.cosine($"a.v", $"b.v")).as("d"))
      .collect().map(_.getDouble(0))
    assert(diff.forall(_ == 0.0))
  }

  test("hyperplaneBucket: deterministic per seed, null-safe, rejects short vectors") {
    val df = rows.toDF("id", "v")
    val a = df.select(Vectors.hyperplaneBucket($"v", 6, seed = 7, dim = 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b = df.select(Vectors.hyperplaneBucket($"v", 6, seed = 7, dim = 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must bucket identically")
    assert(a.forall(x => x >= 0 && x < 64))
    val other = df.select(Vectors.hyperplaneBucket($"v", 6, seed = 8, dim = 4).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(a != other, "different seed must move some bucket")
    // null in -> null out
    val withNull = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (2L, null))
      .toDF("id", "v")
    val nulls = withNull.select(Vectors.hyperplaneBucket($"v", 6, seed = 7, dim = 4).as("b"))
      .collect().map(r => r.isNullAt(0))
    assert(nulls.toSeq == Seq(false, true))
    // a vector shorter than the plane dimension must surface, not silently
    // bucket on a prefix
    val short = Seq((1L, Array(1.0f))).toDF("id", "v")
    val err = intercept[org.apache.spark.SparkException] {
      short.select(Vectors.hyperplaneBucket($"v", 6, seed = 7, dim = 4)).collect()
    }
    assert(err.getMessage.contains("hyperplaneBucket") ||
      Option(err.getCause).exists(_.getMessage.contains("hyperplaneBucket")))
  }

  test("q182 kernel: diversity is 0 for a collapsed label, 1 - 1/n for orthogonal") {
    import spark.implicits._
    val e = (x: Int) => Array.tabulate(8)(i => if (i == x) 2.0f else 0.0f)
    val vecs = Seq(
      // label 0: four copies of one direction (scaled differently — the
      // normalize step must erase magnitude) → diversity 0
      (0, e(0)), (0, e(0).map(_ * 3f)), (0, e(0).map(_ * 0.5f)), (0, e(0)),
      // label 1: four orthogonal unit directions → ‖mean‖² = 1/4
      (1, e(0)), (1, e(1)), (1, e(2)), (1, e(3)),
      // label 2: two opposite directions → mean 0, diversity 1
      (2, e(5)), (2, e(5).map(-_)))
      .toDF("label", "embedding")
    val got = graft.ops.Similarity.diversityOf(vecs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((0, 4L, 0.0), (1, 4L, 0.75), (2, 2L, 1.0)), got.toString)
  }
}
