package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic HTML → text extraction — the per-row invariant surface
  * ("byte-identical extracted text per url", BASELINE.json input_hint).
  *
  * Spec (FIXTURES.md F2, modeled on the reference's BeautifulSoup `.text`
  * scrapers, e.g. /root/reference/snapshots/un/2023-10-30/web_scrapping.py:20-27):
  *   1. drop <script>…</script> and <style>…</style> subtrees entirely;
  *   2. strip all remaining tags (including comments `<!-- -->`);
  *   3. decode the 5 basic entities: &amp; &lt; &gt; &quot; &#39;/&apos;;
  *   4. collapse whitespace runs to single ASCII spaces; trim.
  *
  * Implemented as a single-pass scanner over the raw bytes' UTF-8 string —
  * no regex backtracking, O(n), allocation-light — and exposed as a
  * deterministic Scala UDF (not `asNondeterministic`), so Catalyst may
  * freely push/dedup it. Hot-path-safe at 100 TB: pure per-row map, no
  * shuffle, runs inside the scan stage.
  */
object TextExtract {

  /** Pure function: UTF-8 html bytes → extracted text. */
  def extractText(html: Array[Byte]): String =
    if (html == null) null else extractText(new String(html, "UTF-8"))

  def extractText(html: String): String = {
    if (html == null) return null
    val n = html.length
    val sb = new java.lang.StringBuilder(n / 2)
    var i = 0
    var lastWasSpace = true // leading whitespace is trimmed

    def lowerRegionMatches(at: Int, s: String): Boolean =
      html.regionMatches(true, at, s, 0, s.length)

    def appendSpaceCollapsed(c: Char): Unit = {
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
      } else { sb.append(c); lastWasSpace = false }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerRegionMatches(i, "<script")) {
          val end = indexOfIgnoreCase(html, "</script", i + 7)
          i = if (end < 0) n else skipTagEnd(html, end)
          // a dropped subtree is a word boundary
          if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        } else if (lowerRegionMatches(i, "<style")) {
          val end = indexOfIgnoreCase(html, "</style", i + 6)
          i = if (end < 0) n else skipTagEnd(html, end)
          if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        } else if (lowerRegionMatches(i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        } else {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
          // tags are word boundaries (BeautifulSoup .text with separator
          // collapse — runs of tags + whitespace become one space)
          if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        if (decoded != 0) { sb.append(decoded); lastWasSpace = false; i = next }
        else { appendSpaceCollapsed(c); i += 1 }
      } else {
        appendSpaceCollapsed(c)
        i += 1
      }
    }
    // trim trailing space (leading handled by lastWasSpace init)
    var len = sb.length
    while (len > 0 && sb.charAt(len - 1) == ' ') len -= 1
    sb.setLength(len)
    sb.toString
  }

  /** Decode one of the 5 basic entities at position i (html.charAt(i)=='&').
    * Returns (char, nextIndex) or (0, i) when not a recognized entity. */
  private def decodeEntity(s: String, i: Int): (Char, Int) = {
    @inline def m(e: String, c: Char): (Char, Int) =
      if (s.regionMatches(i, e, 0, e.length)) (c, i + e.length) else null
    var r = m("&amp;", '&')
    if (r == null) r = m("&lt;", '<')
    if (r == null) r = m("&gt;", '>')
    if (r == null) r = m("&quot;", '"')
    if (r == null) r = m("&#39;", '\'')
    if (r == null) r = m("&apos;", '\'')
    if (r == null) (0.toChar, i) else r
  }

  private def indexOfIgnoreCase(s: String, sub: String, from: Int): Int = {
    var i = math.max(from, 0)
    val max = s.length - sub.length
    while (i <= max) {
      if (s.regionMatches(true, i, sub, 0, sub.length)) return i
      i += 1
    }
    -1
  }

  /** Skip past the '>' that closes the tag starting at `tagStart`. */
  private def skipTagEnd(s: String, tagStart: Int): Int = {
    val gt = s.indexOf('>', tagStart)
    if (gt < 0) s.length else gt + 1
  }

  /** Column function over a binary html column. Deterministic UDF — pure
    * per-row map, stays inside the scan stage. */
  val extractTextUdf = udf((html: Array[Byte]) => extractText(html))

  def extract_text(c: Column): Column = extractTextUdf(c)
}
