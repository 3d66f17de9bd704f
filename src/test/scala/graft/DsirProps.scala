package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.DsirMath

/** ScalaCheck fuzzing of the q105 DSIR kernel ([[DsirMath]]): the
  * hand-rolled single-pass tokenizer+hasher must agree with an independent
  * re-derivation of the ORACLE's semantics (DuckDB
  * `trim(regexp_replace(text,'\s+',' ','g'))` + split-on-space + md5
  * 2-hex-prefix) on adversarial input — ASCII whitespace runs, Unicode
  * whitespace that Java `\s` does NOT match (U+00A0, U+2003, U+2028 — must
  * stay token chars), control chars below 0x20 (ditto: only the six
  * `\s` chars split), multi-byte UTF-8, and empty/whitespace-only text. */
object DsirProps extends Properties("DsirMath") {

  /** Oracle-semantics reference: normalize `\s+` runs (the six Java
    * default-`\s` chars) to one space, strip leading/trailing SPACES only
    * (SQL trim), split on single space, md5 each adjacent pair joined by
    * one space, take the digest's first byte. */
  private def refBuckets(text: String): Seq[Int] = {
    val norm = text.replaceAll("\\s+", " ")
    val trimmed = norm.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks = trimmed.split(" ", -1).toSeq
    if (toks.length < 2) Seq.empty
    else toks.sliding(2).map { p =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest((p(0) + " " + p(1)).getBytes("UTF-8"))(0) & 0xff
    }.toSeq
  }

  private def kernelBuckets(text: String): Seq[Int] = {
    val arr = DsirMath.buckets(UTF8String.fromString(text))
    (0 until arr.numElements()).map(arr.getInt)
  }

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.oneOf(" ", "\t", "\n", "", "\f", "\r"),
    Gen.oneOf(" ", " ", " ", "", ""),
    Gen.oneOf("é", "日本語", "🎉", "'", "\"", "a b", "  "),
    Gen.const(""))

  private val text: Gen[String] = Gen.listOf(fragment).map(_.mkString)

  property("buckets == oracle-semantics reference") = Prop.forAll(text) { s =>
    val (got, want) = (kernelBuckets(s), refBuckets(s))
    Prop(got == want) :| s"kernel=$got ref=$want on ${s.map(_.toInt)}"
  }

  property("null and whitespace-only text yield no grams") = Prop.forAll(
    Gen.listOf(Gen.oneOf(" ", "\t", "\n", "", "\f", "\r")).map(_.mkString)) { ws =>
    kernelBuckets(ws).isEmpty && DsirMath.buckets(null).numElements() == 0
  }

  property("weight == [n, sum of slot values over buckets]") =
    Prop.forAll(text, Gen.listOfN(256, Gen.chooseNum(-1000000L, 1000000L))) {
      (s, slotsList) =>
        val slots = slotsList.toArray
        val w = DsirMath.weight(UTF8String.fromString(s), slots)
        val bs = kernelBuckets(s)
        w.numElements() == 2 && w.getLong(0) == bs.length.toLong &&
          w.getLong(1) == bs.map(slots(_)).sum
    }
}
