package graft.functions

/** HTML main-text extraction — the crawl front-end operator between
  * "gunzip the WARC payload" ([[GzipCodec]]) and every text-quality /
  * dedup operator: strip markup, decode entities, and drop boilerplate
  * blocks so downstream operators score CONTENT, not navigation chrome
  * (the justext / Arc90-readability family of text-density heuristics,
  * reduced to a deterministic, oracle-checkable core).
  *
  * One pass over the input, no DOM, no allocation beyond the output
  * builders — the per-row kernel a 100-TB scan can afford. Contract:
  *
  *  - markup between `<` and `>` is stripped; `<script>` / `<style>`
  *    element CONTENT is skipped entirely (case-insensitive, attributes
  *    allowed), as are `<!-- -->` comments;
  *  - BLOCK-level tags (p, div, li, h1-h6, br, td, title, nav, footer,
  *    ... — [[BlockTags]]) delimit text blocks; inline tags (a, b, em,
  *    span, ...) do not split a block;
  *  - entities decode: the common named set ([[Named]]), decimal
  *    `&#NN;` and hex `&#xHH;` code points; an unknown or malformed
  *    entity is emitted literally (never dropped — lossy guessing would
  *    corrupt content);
  *  - whitespace runs collapse to one space, blocks are trimmed;
  *  - a block is KEPT iff its text is at least [[MinBlockChars]] chars
  *    AND at most half of them arrived inside `<a>` elements (link
  *    density ≤ 1/2 — navigation/ad blocks are short and link-dense,
  *    content blocks are long and prose-dense);
  *  - kept blocks join with a single `\n`; no kept block yields `""`;
  *  - null in, null out; malformed input (unclosed tag, truncated
  *    comment, unterminated entity) degrades to best-effort text, never
  *    throws — one hostile document must not kill a corpus scan.
  */
object HtmlCodec {

  /** Minimum decoded chars for a block to count as content. */
  val MinBlockChars: Int = 25

  /** Tags that delimit text blocks (flush-on-open and flush-on-close).
    * Everything else (a, b, i, em, strong, span, code, img, ...) is
    * inline: stripped, but the surrounding text stays one block. */
  val BlockTags: Set[String] = Set(
    "html", "head", "body", "title", "p", "div", "section", "article",
    "main", "header", "footer", "nav", "aside", "ul", "ol", "li",
    "table", "tr", "td", "th", "blockquote", "pre", "form", "hr", "br",
    "h1", "h2", "h3", "h4", "h5", "h6")

  /** Common named entities (the HTML4 core + typographic set). */
  val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Decode the entity starting at `i` (which points at '&').
    * Returns (decoded, nextIndex) or null if not a known entity —
    * caller emits '&' literally. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return null
    val body = s.substring(i + 1, semi)
    val d: String =
      if (body.startsWith("#x") || body.startsWith("#X")) {
        try {
          val cp = Integer.parseInt(body.substring(2), 16)
          if (cp > 0 && cp <= 0x10ffff) new String(Character.toChars(cp)) else null
        } catch { case _: RuntimeException => null }
      } else if (body.startsWith("#")) {
        try {
          val cp = Integer.parseInt(body.substring(1))
          if (cp > 0 && cp <= 0x10ffff) new String(Character.toChars(cp)) else null
        } catch { case _: RuntimeException => null }
      } else Named.getOrElse(body, null)
    if (d == null) null else (d, semi + 1)
  }

  /** Value of `attr` inside a tag body (the chars between the tag name
    * and '>'): handles double-quoted, single-quoted, and unquoted
    * values, case-insensitive attribute names, and entity-decodes the
    * value (hrefs legally carry &amp;). Null if absent/valueless. */
  private def attrValue(body: String, attr: String): String = {
    val n = body.length
    var i = 0
    while (i < n) {
      while (i < n && (isWs(body.charAt(i)) || body.charAt(i) == '/')) i += 1
      val nameStart = i
      while (i < n && !isWs(body.charAt(i)) && body.charAt(i) != '=' &&
        body.charAt(i) != '/' ) i += 1
      val name = body.substring(nameStart, i)
      while (i < n && isWs(body.charAt(i))) i += 1
      var value: String = null
      if (i < n && body.charAt(i) == '=') {
        i += 1
        while (i < n && isWs(body.charAt(i))) i += 1
        if (i < n && (body.charAt(i) == '"' || body.charAt(i) == '\'')) {
          val q = body.charAt(i)
          val end = body.indexOf(q, i + 1)
          value = if (end < 0) body.substring(i + 1)
            else body.substring(i + 1, end)
          i = if (end < 0) n else end + 1
        } else {
          val valStart = i
          while (i < n && !isWs(body.charAt(i))) i += 1
          value = body.substring(valStart, i)
        }
      }
      if (name.equalsIgnoreCase(attr) && value != null) {
        // entity-decode the attribute value
        val sb = new java.lang.StringBuilder(value.length)
        var k = 0
        while (k < value.length) {
          val c = value.charAt(k)
          if (c == '&') {
            val e = decodeEntity(value, k)
            if (e == null) { sb.append('&'); k += 1 }
            else { sb.append(e._1); k = e._2 }
          } else { sb.append(c); k += 1 }
        }
        return sb.toString
      }
      if (name.isEmpty && (i >= n || !isWs(body.charAt(i)))) i += 1
    }
    null
  }

  /** Extract the href of every `<a>` tag, in document order — the
    * crawl-frontier feed. Same skip rules as [[extractText]]
    * (script/style content and comments can NOT contribute links);
    * anchors without an href contribute nothing; href values are
    * entity-decoded, otherwise RAW (resolution against the page URL is
    * the caller's job — [[graft.pipeline.Urls]] owns URL semantics). */
  def extractLinks(html: String): Array[String] = {
    if (html == null) return null
    val n = html.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else {
          val gt = html.indexOf('>', i + 1)
          if (gt < 0) { i = n }
          else {
            val closing = i + 1 < n && html.charAt(i + 1) == '/'
            var j = if (closing) i + 2 else i + 1
            val nameStart = j
            while (j < gt && html.charAt(j).isLetterOrDigit) j += 1
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val selfClosed = gt > i + 1 && html.charAt(gt - 1) == '/'
            val bodyEnd = if (selfClosed) gt - 1 else gt
            if (!closing && name == "a") {
              val href = attrValue(html.substring(j, bodyEnd), "href")
              if (href != null) out += href
            }
            i = gt + 1
            if (!closing && !selfClosed && (name == "script" || name == "style")) {
              val close = indexOfIgnoreCase(html, "</" + name, i)
              if (close < 0) i = n
              else {
                val cgt = html.indexOf('>', close)
                i = if (cgt < 0) n else cgt + 1
              }
            }
          }
        }
      } else i += 1
    }
    out.toArray
  }

  /** Case-insensitive indexOf for the `</script` / `</style` close scan. */
  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Extract the main text per the contract above. */
  def extractText(html: String): String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var anchorChars = 0
    var anchorDepth = 0
    var lastWasSpace = true
    // Whether the block's (single, collapsed) trailing space was
    // counted into anchorChars — flushBlock trims it from the length,
    // so it must also come off the anchor count or a block sitting
    // exactly at the 1/2 link-density boundary is spuriously dropped
    // (ADVICE r9).
    var lastSpaceAnchored = false

    def flushBlock(): Unit = {
      var len = block.length
      while (len > 0 && block.charAt(len - 1) == ' ') len -= 1
      val ac =
        if (len < block.length && lastSpaceAnchored) anchorChars - 1
        else anchorChars
      if (len >= MinBlockChars && 2 * ac <= len) {
        if (out.length > 0) out.append('\n')
        out.append(block, 0, len)
      }
      block.setLength(0)
      anchorChars = 0
      lastSpaceAnchored = false
      lastWasSpace = true
    }

    def appendChar(c: Char): Unit =
      if (isWs(c)) {
        if (!lastWasSpace) {
          block.append(' ')
          if (anchorDepth > 0) { anchorChars += 1; lastSpaceAnchored = true }
          else lastSpaceAnchored = false
          lastWasSpace = true
        }
      } else {
        block.append(c)
        if (anchorDepth > 0) anchorChars += 1
        lastSpaceAnchored = false
        lastWasSpace = false
      }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val close = html.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else {
          val gt = html.indexOf('>', i + 1)
          if (gt < 0) { i = n } // truncated tag: drop the tail as markup
          else {
            val closing = i + 1 < n && html.charAt(i + 1) == '/'
            var j = if (closing) i + 2 else i + 1
            val nameStart = j
            while (j < gt && (html.charAt(j).isLetterOrDigit)) j += 1
            val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val selfClosed = gt > i + 1 && html.charAt(gt - 1) == '/'
            i = gt + 1
            if (!closing && !selfClosed && (name == "script" || name == "style")) {
              val close = indexOfIgnoreCase(html, "</" + name, i)
              if (close < 0) i = n
              else {
                val cgt = html.indexOf('>', close)
                i = if (cgt < 0) n else cgt + 1
              }
            } else if (BlockTags.contains(name)) {
              flushBlock()
            } else if (name == "a") {
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!selfClosed) anchorDepth += 1
            }
          }
        }
      } else if (c == '&') {
        val e = decodeEntity(html, i)
        if (e == null) { appendChar('&'); i += 1 }
        else {
          var k = 0
          while (k < e._1.length) { appendChar(e._1.charAt(k)); k += 1 }
          i = e._2
        }
      } else {
        appendChar(c)
        i += 1
      }
    }
    flushBlock()
    out.toString
  }
}
