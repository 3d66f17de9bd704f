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

  property("extreme components use the extreme codes; codes are monotone") =
    forAll(genVec) { v =>
      val (codes, vmin, vmax) = IvfSq.quantize(v)
      if (vmax == vmin) codes.forall(_ == 0)
      else {
        // the range is actually used — the min component's code is
        // exactly 0 ((vmin-vmin)*scale is exact) and the max component's
        // is 255 or 254 ((vmax-vmin)*(255/(vmax-vmin)) can land a ULP
        // below 255 before the floor; the oracle floors identically, so
        // 254 is a shared contract, not an error) — and floor of the
        // monotone affine map is monotone. A constant- or shuffled-code
        // implementation fails this.
        val atMin = v.indexWhere(_.toDouble == vmin)
        val atMax = v.indexWhere(_.toDouble == vmax)
        (codes(atMin) & 0xff) == 0 && (codes(atMax) & 0xff) >= 254 &&
          v.indices.forall { i =>
            v.indices.forall { j =>
              v(i) > v(j) || (codes(i) & 0xff) <= (codes(j) & 0xff)
            }
          }
      }
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
