package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ConnectedComponents

/** The reusable min-label-propagation operator: randomized agreement with a
  * driver-side union-find, plus structural edge cases. */
class ConnectedComponentsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map(v => v -> find(v)).toMap
  }

  test("property: random graphs agree with a union-find reference (both paths)") {
    val rnd = new scala.util.Random(0xCC2026)
    for (trial <- 1 to 5) {
      val nV = 50 + rnd.nextInt(100)
      val nE = 30 + rnd.nextInt(120)
      val edges = Seq.fill(nE)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
      val want = unionFind(nV, edges)
      // default path: bounded single-task final solve
      val got = ConnectedComponents.run(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial (${edges.size} edges, final-solve path)")
      // forced propagation path (what runs when the contracted graph still
      // exceeds the single-task budget at 100 TB)
      val gotProp = ConnectedComponents.run(edges.toDF("a", "b"),
          contractLevels = 0, finalSolveMaxEdges = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotProp == want, s"trial $trial (${edges.size} edges, propagation path)")
    }
  }

  test("contraction levels reduce a graph below the final-solve budget") {
    // 300-edge graph, budget 150: level-0 count (300) exceeds the budget,
    // so a partition-local union-find round must contract it (stars over
    // ≤ #distinct vertices) before the single-task solve fires. Exercises
    // the contract-then-solve path end to end.
    val rnd = new scala.util.Random(0xCC2027)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val want = unionFind(120, edges)
    val got = ConnectedComponents.run(edges.toDF("a", "b"),
        contractLevels = 2, finalSolveMaxEdges = 150)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("final solve needs no propagation rounds: chain-100 at maxIter=1") {
    // under the default path the 100-vertex chain — the propagation worst
    // case — is solved by the bounded union-find task with ZERO iterative
    // rounds, so even maxIter=1 succeeds
    val edges = (0L until 100L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(edges.toDF("a", "b"), maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("long chain converges within the adaptive pointer-jumping bound") {
    // a path 0-1-2-...-100: worst case for plain min propagation (100
    // rounds — would THROW at maxIter=10). With maxIter=10 the adaptive
    // schedule jumps from round 6 (maxIter/2 = 5): coverage ramps
    // 1,2,3,4,5 plain then doubles 10,22,46,94,190 — all labels correct by
    // round 9, round 10 confirms the fixpoint. This pins the jump against
    // regressions: the same-lineage self-join alias form silently degraded
    // to identity, and only an iteration bound this tight catches that.
    // contractLevels=0 + finalSolveMaxEdges=0 force the propagation path.
    val edges = (0L until 100L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(edges.toDF("a", "b"), maxIter = 10,
        contractLevels = 0, finalSolveMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 101 && got.values.forall(_ == 0L))
  }

  test("non-convergence is a loud failure, not silent truncation") {
    val edges = (0L until 100L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(edges.toDF("a", "b"), maxIter = 4,
        contractLevels = 0, finalSolveMaxEdges = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("self-loops and isolated pairs keep distinct components") {
    val edges = Seq((1L, 1L), (5L, 6L), (9L, 8L))
    val got = ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }
}
