package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.Html

/** ScalaCheck fuzzing of the C8 HTML scanner: arbitrary/adversarial markup
  * must never throw, and structural invariants must hold. */
object HtmlProps extends Properties("Html.postText") {

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const("<div class=\"post--card--wrapper\">"),
    Gen.const("</div>"),
    Gen.const("<div>"),
    Gen.const("<script>var x = 1 < 2;"),
    Gen.const("</script>"),
    Gen.const("<style>.a{}"),
    Gen.const("</style>"),
    Gen.const("<img alt=\"Impressions\">"),
    Gen.const("<img src=\"x\">"),
    Gen.const("<!-- comment "),
    Gen.const("-->"),
    Gen.const("<"),
    Gen.const(">"),
    Gen.const("\""),
    Gen.const("&amp;"),
    Gen.const(" \t\n"))

  private val soup: Gen[String] =
    Gen.listOf(fragment).map(_.mkString)

  property("never throws on arbitrary tag soup") = Prop.forAll(soup) { html =>
    Html.postText(html)
    true
  }

  property("output is whitespace-normalized") = Prop.forAll(soup) { html =>
    val out = Html.postText(html)
    !out.contains("  ") && out == out.trim && !out.contains("\n") && !out.contains("\t")
  }

  property("no wrapper in input -> empty output") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      Html.postText(s"<div class='other'>$s</div>") == ""
    }

  property("plain text inside a wrapper survives") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      Html.postText(s"""<div class="post--card--wrapper">$s</div>""") == s
    }
}
