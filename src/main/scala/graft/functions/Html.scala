package graft.functions

import org.apache.spark.sql.Column

/** HTML→text post extraction (SURVEY C8/C9; reference
  * /root/reference/code/htmlConverter.py:12-43).
  *
  * Reproduces the reference semantics without an HTML library (none ships in
  * the offline jar set): a single-pass tolerant tag scanner that
  *   1. collects text only inside `<div class="post--card--wrapper">` (class
  *      matched as a whitespace-separated token, like bs4's class_ filter,
  *      htmlConverter.py:16);
  *   2. drops `<script>`/`<style>` subtree content (htmlConverter.py:25-26);
  *   3. replaces `<img alt="X">` with the literal `[X]:` when X is one of
  *      Impressions / Post Comments / Post Echoes / Post Upvotes, and drops
  *      all other images (htmlConverter.py:29-34);
  *   4. joins text nodes with spaces and collapses whitespace
  *      (get_text(separator=" ") + " ".join(split), htmlConverter.py:37-38);
  *   5. concatenates the per-wrapper texts with a single space
  *      (htmlConverter.py:43); no wrapper → empty string (:18-19).
  *
  * Scale: a pure per-row scalar — narrow map, no shuffle, parallel across
  * partitions. The Column/SQL form is a native codegen expression
  * ([[graft.plans.HtmlPostText]]): the scan kernel itself is plain JVM
  * code either way, but the expression keeps the CALLING projection inside
  * whole-stage codegen (the old UDF forced an interpreted boundary and a
  * String serialization shim per row).
  */
object Html {

  private val AltWhitelist =
    Set("Impressions", "Post Comments", "Post Echoes", "Post Upvotes")
  private val TargetClass = "post--card--wrapper"

  private def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  /** Parse the attributes of a tag body (between the name and '>'). */
  private def attrs(tagBody: String): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    val re = """([a-zA-Z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]*))""".r
    re.findAllMatchIn(tagBody).foreach { mm =>
      val v = Option(mm.group(3)).orElse(Option(mm.group(4))).orElse(Option(mm.group(5))).getOrElse("")
      m(mm.group(1).toLowerCase) = v
    }
    m.toMap
  }

  private def hasClassToken(tagBody: String, token: String): Boolean =
    attrs(tagBody).get("class").exists(_.split("\\s+").contains(token))

  /** Extract post text per the reference semantics. Null-safe (null → ""). */
  def postText(html: String): String = {
    if (html == null) return ""
    val lower = html.toLowerCase
    val wrappers = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    var depth = 0                    // >0 while inside a target wrapper div
    var current: StringBuilder = null

    def emitText(t: String): Unit = if (depth > 0) {
      val dec = decodeEntities(t)
      if (dec.nonEmpty) { current.append(' '); current.append(dec) }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emitText(html.substring(i)); i = n }
      else {
        if (lt > i) emitText(html.substring(i, lt))
        val next = if (lt + 1 < n) html.charAt(lt + 1) else ' '
        if (!(next.isLetter || next == '/' || next == '!')) {
          // a bare '<' (e.g. "1 < 2") is text, not a tag — browsers agree
          emitText("<"); i = lt + 1
        } else if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt)
          i = if (end < 0) n else end + 3
        } else {
          val gt = {
            // honor quotes inside the tag so '>' in an attr doesn't end it
            var j = lt + 1; var q: Char = 0; var found = -1
            while (j < n && found < 0) {
              val c = html.charAt(j)
              if (q != 0) { if (c == q) q = 0 }
              else if (c == '"' || c == '\'') q = c
              else if (c == '>') found = j
              j += 1
            }
            found
          }
          if (gt < 0) { i = n }
          else {
            val raw = html.substring(lt + 1, gt)
            val closing = raw.startsWith("/")
            val body = if (closing) raw.substring(1) else raw
            val name = body.takeWhile(c => c.isLetterOrDigit).toLowerCase
            val selfClosing = raw.endsWith("/")
            i = gt + 1
            if (closing) {
              if (name == "div" && depth > 0) {
                depth -= 1
                if (depth == 0) {
                  val cleaned = current.toString.trim.replaceAll("\\s+", " ")
                  if (cleaned.nonEmpty) wrappers += cleaned
                  current = null
                }
              }
            } else if (name == "script" || name == "style") {
              // script/style bodies are CDATA-ish: jump to the closing tag,
              // ignoring everything inside (htmlConverter.py:25-26 extract())
              if (!selfClosing) {
                val close = lower.indexOf("</" + name, i)
                i = if (close < 0) n else {
                  val end = lower.indexOf('>', close)
                  if (end < 0) n else end + 1
                }
              }
            } else if (name == "img") {
              if (depth > 0) {
                val alt = attrs(body).getOrElse("alt", "").trim
                if (AltWhitelist.contains(alt)) { current.append(' '); current.append(s"[$alt]:") }
              }
            } else if (name == "div") {
              if (depth > 0) depth += 1
              else if (hasClassToken(body, TargetClass)) { depth = 1; current = new StringBuilder }
            }
          }
        }
      }
    }
    wrappers.mkString(" ")
  }

  /** Column form: `html_post_text(html)` — the native expression. */
  def html_post_text(c: Column): Column = {
    import org.apache.spark.sql.graft.GraftInternal
    GraftInternal.column(graft.plans.HtmlPostText(GraftInternal.expression(c)))
  }
}
