package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Html

/** Unit tests for the C8/C9 HTML post extractor against reference-shaped
  * post cards (htmlConverter.py:12-43 semantics). */
class HtmlSpec extends AnyFunSuite {

  test("basic wrapper extraction with whitespace normalization") {
    val html = """<div class="post--card--wrapper"><p>Hello   world
                 |</p></div>""".stripMargin
    assert(Html.postText(html) == "Hello world")
  }

  test("no wrapper -> empty string") {
    assert(Html.postText("""<div class="other">text</div>""") == "")
    assert(Html.postText("") == "")
    assert(Html.postText(null) == "")
  }

  test("script and style content is dropped, including bare '<' inside") {
    val html = """<div class="post--card--wrapper">a<script>var x = 1 < 2;</script>b<style>.c{color:red}</style>c</div>"""
    assert(Html.postText(html) == "a b c")
  }

  test("whitelisted img alts become inline markers; others are dropped") {
    val html = """<div class="post--card--wrapper">Post text
      |<img alt="Impressions"> 1234
      |<img alt="Post Comments"/> 5
      |<img alt="Post Echoes"> 6
      |<img alt="Post Upvotes"> 7
      |<img src="pic.jpg" alt="decorative photo">
      |<img src="plain.jpg">
      |</div>""".stripMargin
    assert(Html.postText(html) ==
      "Post text [Impressions]: 1234 [Post Comments]: 5 [Post Echoes]: 6 [Post Upvotes]: 7")
  }

  test("multiple wrappers are joined with a single space") {
    val html = """<div class="post--card--wrapper">one</div>
      |<div class="x post--card--wrapper y">two</div>""".stripMargin
    assert(Html.postText(html) == "one two")
  }

  test("nested divs inside the wrapper are included until it closes") {
    val html = """<div class="post--card--wrapper"><div class="inner">in</div>after</div><div>outside</div>"""
    assert(Html.postText(html) == "in after")
  }

  test("class must match as a whole token") {
    assert(Html.postText("""<div class="post--card--wrapperx">no</div>""") == "")
  }

  test("entities are decoded; comments ignored") {
    val html = """<div class="post--card--wrapper">a &amp; b <!-- hidden --> &lt;tag&gt;</div>"""
    assert(Html.postText(html) == "a & b <tag>")
  }

  test("quoted '>' inside attributes does not end the tag") {
    val html = """<div class="post--card--wrapper"><a title="x > y">link</a></div>"""
    assert(Html.postText(html) == "link")
  }

  test("empty wrapper contributes nothing") {
    val html = """<div class="post--card--wrapper">  </div><div class="post--card--wrapper">t</div>"""
    assert(Html.postText(html) == "t")
  }
}
