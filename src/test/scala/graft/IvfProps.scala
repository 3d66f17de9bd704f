// in graft.ops: the routing kernels under test are private[ops]
package graft.ops

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property guards for the IVF routing kernels: the probe schedule's
  * correctness rests on these two small functions, so pin their algebra
  * against regressions. */
object IvfProps extends Properties("IvfIndex") {

  private val genVec: Gen[Array[Float]] =
    Gen.chooseNum(2, 16).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    }

  private val genCentroids: Gen[Array[Array[Double]]] =
    Gen.chooseNum(2, 12).flatMap { k =>
      Gen.listOfN(k, Gen.listOfN(8, Gen.chooseNum(-5.0, 5.0)).map(_.toArray))
        .map(_.toArray)
    }

  private def norm(v: Array[Float]): Double =
    math.sqrt(v.map(x => x.toDouble * x).sum)

  property("unit output has norm 1 (or stays zero for the zero vector)") =
    forAll(genVec) { v =>
      val u = IvfIndex.unit(v)
      if (norm(v) == 0.0) u.forall(_ == 0.0f)
      else math.abs(norm(u) - 1.0) < 1e-5
    }

  property("unit preserves direction (cosine with the input is 1)") =
    forAll(genVec) { v =>
      val u = IvfIndex.unit(v)
      val n = norm(v)
      (n == 0.0) || {
        val dp = v.indices.map(i => v(i).toDouble * u(i)).sum
        math.abs(dp / (n * norm(u)) - 1.0) < 1e-5
      }
    }

  property("nearestCells: k distinct in-range cells, sorted by distance") =
    forAll(genCentroids, Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)) {
      (cs, v) =>
        val k = math.min(3, cs.length)
        val got = IvfIndex.nearestCells(cs, v, k)
        def d2(c: Int): Double =
          cs(c).indices.map(i => { val d = v(i).toDouble - cs(c)(i); d * d }).sum
        Prop.all(
          got.length == k,
          got.distinct.length == k,
          got.forall(c => c >= 0 && c < cs.length),
          got.zip(got.tail).forall { case (a, b) => d2(a) <= d2(b) },
          // no unchosen cell is strictly nearer than a chosen one
          cs.indices.filterNot(got.contains)
            .forall(c => d2(c) >= d2(got.last)))
    }

  property("nearestCells(k1) is a prefix of nearestCells(k2) for k1 <= k2") =
    forAll(genCentroids, Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f)).map(_.toArray)) {
      (cs, v) =>
        val k2 = math.min(4, cs.length)
        val k1 = math.max(1, k2 - 2)
        IvfIndex.nearestCells(cs, v, k2).take(k1)
          .sameElements(IvfIndex.nearestCells(cs, v, k1))
    }
}
