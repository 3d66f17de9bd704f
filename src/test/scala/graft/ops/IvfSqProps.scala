// in graft.ops: decode is private[ops]
package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property guards for the SQ8 quantization algebra (q100's approximation
  * lives entirely in these two functions — the rest of the serve is exact
  * math over their output). */
object IvfSqProps extends Properties("IvfSq") {

  private val genVec: Gen[Array[Float]] =
    Gen.chooseNum(1, 64).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
    }

  property("codes cover 0..255 and never escape it") =
    forAll(genVec) { v =>
      val (codes, _, _) = IvfSq.quantize(v)
      codes.forall(c => (c & 0xff) >= 0 && (c & 0xff) <= 255)
    }

  property("bounds bracket every component") =
    forAll(genVec) { v =>
      val (_, vmin, vmax) = IvfSq.quantize(v)
      v.forall(x => x.toDouble >= vmin && x.toDouble <= vmax)
    }

  property("per-component reconstruction error is within one quantization step") =
    forAll(genVec) { v =>
      val (codes, vmin, vmax) = IvfSq.quantize(v)
      val scale = if (vmax > vmin) (vmax - vmin) / 255.0 else 0.0
      // floor quantization: decoded <= true value < decoded + step (the
      // top code is exact for the max component)
      v.indices.forall { i =>
        val d = IvfSq.decode(codes(i), vmin, scale)
        val err = v(i).toDouble - d
        err >= -1e-12 && err <= scale + 1e-12
      }
    }

  property("quantization is deterministic") =
    forAll(genVec) { v =>
      val (c1, mn1, mx1) = IvfSq.quantize(v)
      val (c2, mn2, mx2) = IvfSq.quantize(v)
      c1.sameElements(c2) && mn1 == mn2 && mx1 == mx2
    }

  property("constant vectors decode back exactly") =
    forAll(Gen.chooseNum(-5.0f, 5.0f), Gen.chooseNum(1, 32)) { (x, n) =>
      val (codes, vmin, vmax) = IvfSq.quantize(Array.fill(n)(x))
      val scale = if (vmax > vmin) (vmax - vmin) / 255.0 else 0.0
      codes.forall(c => IvfSq.decode(c, vmin, scale) == x.toDouble)
    }
}
