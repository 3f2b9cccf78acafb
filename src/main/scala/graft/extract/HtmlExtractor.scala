package graft.extract

import scala.collection.mutable.ArrayBuffer

/** HTML main-content extractor: from-scratch tag tokenizer + block
  * segmentation + Boilerpipe-style text-density / link-density block
  * classification.
  *
  * The reference has no HTML path (it OCRs page images); its zone
  * semantics inform this design: zone typing & confidence filtering
  * (core/models/layout_engine.py:42-48, :131), title decoration in
  * markdown mode (core/processors/document_processor.py:192-196), and
  * the strip → drop-empty → "\n\n"-join assembly
  * (document_processor.py:215-241). The density heuristics follow the
  * published Boilerpipe approach (Kohlschütter et al., WSDM 2010):
  * content blocks have high text density and low link density;
  * navigation/chrome has the opposite.
  *
  * Deterministic classification rules (co-designed with the corpus
  * generator, FIXTURES.md F-HTML):
  *   - blocks inside <nav>/<header>/<footer>/<aside> are boilerplate
  *     (structural prior — "nested boilerplate" case);
  *   - link_density = anchor_chars / chars > 1/3 → boilerplate
  *     ("link-farm paragraph (dropped)"); inline links below the
  *     threshold are kept;
  *   - text_density = words / ceil(chars / 80) < 1 → boilerplate
  *     (sparse chrome fragments);
  *   - <script>/<style> content and <!-- comments --> are dropped at
  *     the tokenizer level;
  *   - <title> and <h1>..<h6> blocks are headings: kept (outside
  *     boilerplate containers) and prefixed "# " in markdown mode.
  *
  * Output = surviving blocks in document order, whitespace-collapsed,
  * joined with "\n\n"; "" if nothing survives (span dropped at
  * reassembly — "nav-only page" case).
  */
object HtmlExtractor {

  final case class Block(text: String, anchorChars: Int, heading: Boolean,
      boiler: Boolean) {
    def chars: Int = text.length
    def words: Int = if (text.isEmpty) 0 else text.count(_ == ' ') + 1
    def linkDensity: Double = if (chars == 0) 0.0 else anchorChars.toDouble / chars
    def textDensity: Double =
      if (chars == 0) 0.0 else words.toDouble / math.ceil(chars / 80.0)
  }

  private val blockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "td", "th", "tr", "table", "thead", "tbody", "section", "article",
    "main", "header", "footer", "nav", "aside", "title", "blockquote",
    "pre", "figure", "figcaption", "form", "body", "html", "head", "br",
    "hr")

  private val boilerContainers = Set("nav", "header", "footer", "aside")
  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6", "title")
  private val rawTextTags = Set("script", "style")

  val MaxLinkDensity = 1.0 / 3.0
  val MinTextDensity = 1.0

  // ---------------------------------------------------------------- lexer

  private sealed trait Tok
  private final case class Open(name: String, selfClosing: Boolean) extends Tok
  private final case class Close(name: String) extends Tok
  private final case class Text(s: String) extends Tok

  /** Tolerant HTML tokenizer: quoted attribute values (may contain '>'),
    * comments, doctype, raw-text elements. Never throws; malformed tails
    * are treated as text.
    */
  private def lex(html: String): ArrayBuffer[Tok] = {
    val out = ArrayBuffer.empty[Tok]
    val n = html.length
    var i = 0
    var textStart = 0
    def flushText(until: Int): Unit =
      if (until > textStart) out += Text(html.substring(textStart, until))
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' ) {
          flushText(i)
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i)
            i = if (e < 0) n else e + 1
          }
          textStart = i
        } else if (c1 == '/' || c1.isLetter) {
          flushText(i)
          val close = c1 == '/'
          var j = if (close) i + 2 else i + 1
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // scan to tag end respecting quotes
          var self = false
          var quote: Char = 0
          var k = j
          var done = -1
          while (k < n && done < 0) {
            val ck = html.charAt(k)
            if (quote != 0) { if (ck == quote) quote = 0 }
            else if (ck == '"' || ck == '\'') quote = ck
            else if (ck == '>') done = k
            k += 1
          }
          val end = if (done < 0) n else done + 1
          if (done > 0 && html.charAt(done - 1) == '/') self = true
          if (name.nonEmpty) {
            if (close) out += Close(name)
            else if (rawTextTags.contains(name) && !self) {
              // skip raw content up to the matching close tag —
              // case-insensitive regionMatches scan (no O(n) lowercase
              // copy per raw-text element)
              val closeTag = "</" + name
              var e = -1
              var k2 = end
              while (e < 0 && k2 <= n - closeTag.length) {
                if (html.regionMatches(true, k2, closeTag, 0, closeTag.length))
                  e = k2
                else k2 += 1
              }
              if (e < 0) { i = n; textStart = n }
              else {
                val gt = html.indexOf('>', e)
                i = if (gt < 0) n else gt + 1
                textStart = i
              }
            } else out += Open(name, self)
          }
          if (!(rawTextTags.contains(name) && !close && !self)) {
            i = end
            textStart = i
          }
        } else { i += 1 }
      } else i += 1
    }
    flushText(n)
    out
  }

  // ------------------------------------------------------------- entities

  private[extract] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Integer.parseInt(e.substring(2), 16).toChar)
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Integer.parseInt(e.substring(1)).toChar)
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** HTML whitespace collapsing: ALL whitespace (incl. newlines) between
    * words renders as a single space.
    */
  private[extract] def collapseHtmlWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  // ------------------------------------------------------------ extractor

  /** Segment into blocks with density stats. Exposed for tests. */
  def blocks(html: String): ArrayBuffer[Block] = {
    val toks = lex(html)
    val out = ArrayBuffer.empty[Block]
    val sb = new java.lang.StringBuilder
    var anchorChars = 0
    var anchorDepth = 0
    var boilerDepth = 0
    var headingDepth = 0
    var blockIsHeading = false

    def flush(): Unit = {
      val text = collapseHtmlWs(decodeEntities(sb.toString))
      if (text.nonEmpty)
        out += Block(text, math.min(anchorChars, text.length),
          blockIsHeading, boilerDepth > 0)
      sb.setLength(0)
      anchorChars = 0
      blockIsHeading = false
    }

    toks.foreach {
      case Text(s) =>
        if (headingDepth > 0) blockIsHeading = true
        sb.append(' ').append(s)
        if (anchorDepth > 0)
          anchorChars += collapseHtmlWs(decodeEntities(s)).length
      case Open(name, self) =>
        if (name == "a") { if (!self) anchorDepth += 1 }
        else if (blockTags.contains(name)) {
          flush()
          if (!self) {
            if (boilerContainers.contains(name)) boilerDepth += 1
            if (headingTags.contains(name)) { headingDepth += 1; blockIsHeading = true }
          }
        }
      case Close(name) =>
        if (name == "a") { if (anchorDepth > 0) anchorDepth -= 1 }
        else if (blockTags.contains(name)) {
          flush()
          if (boilerContainers.contains(name) && boilerDepth > 0) boilerDepth -= 1
          if (headingTags.contains(name) && headingDepth > 0) headingDepth -= 1
        }
    }
    flush()
    out
  }

  private def isContent(b: Block): Boolean =
    !b.boiler && b.linkDensity <= MaxLinkDensity &&
      (b.heading || b.textDensity >= MinTextDensity)

  /** Full extraction: html span text → main-content text ("" = drop). */
  def extract(html: String, markdown: Boolean): String = {
    if (html == null || html.isEmpty) return ""
    blocks(html).iterator
      .filter(isContent)
      .map { b =>
        if (markdown && b.heading) "# " + b.text
        else b.text
      }
      .mkString("\n\n")
  }
}
