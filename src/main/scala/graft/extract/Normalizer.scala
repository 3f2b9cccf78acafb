package graft.extract

/** OCR-text normalizer for image spans.
  *
  * Semantics derived from the reference's `noisy_ocr` fixture family
  * (test_ai_models/dataset.json doc id 5: "ENVIR0NMENTAL C3RTIFICAT3",
  * "Tot4l Lif3cycle C4rb0n: 247.8 kg C02", questions q5_1-q5_3 require
  * extraction "despite OCR errors"): classic digit/letter confusions are
  * repaired, but genuine numbers are left untouched.
  *
  * Rules (deterministic, word-context-gated):
  *   1. Pure number tokens (optional sign, digits, '.'/',' groups) are
  *      NEVER altered — "247.8" stays "247.8".
  *   2. Tokens containing at least one ASCII letter are word tokens: the
  *      confusable digits are repaired to letters via the fixed table
  *      0→O, 1→I/l, 3→E, 4→A, 7→T. Replacement case follows the token's
  *      letter majority (upper → "O,I,E,A,T", otherwise lower
  *      "o,l,e,a,t"); e.g. "C02" → "CO2", "Tot4l" → "Total",
  *      "C3RTIFICAT3" → "CERTIFICATE".
  *   3. Everything else (punctuation runs, non-ASCII, unicode bullets,
  *      checkmarks) passes through unchanged.
  *
  * Whitespace canonicalization mirrors the reference's zone/page combine
  * (document_processor.py:215-241): lines are trimmed, empty lines are
  * dropped, consecutive non-empty lines join with "\n" inside a paragraph
  * and paragraphs (originally separated by blank lines) join with "\n\n".
  * Idempotent by construction: normalize(normalize(x)) == normalize(x).
  */
object Normalizer {

  private val digitToUpper: Map[Char, Char] =
    Map('0' -> 'O', '1' -> 'I', '3' -> 'E', '4' -> 'A', '7' -> 'T')
  private val digitToLower: Map[Char, Char] =
    Map('0' -> 'o', '1' -> 'l', '3' -> 'e', '4' -> 'a', '7' -> 't')

  /** The letters the noise injector may have produced from (inverse map),
    * exposed for the corpus generator (graft.data.CorpusGen).
    */
  val letterToDigit: Map[Char, Char] = Map(
    'O' -> '0', 'o' -> '0', 'I' -> '1', 'l' -> '1',
    'E' -> '3', 'e' -> '3', 'A' -> '4', 'a' -> '4',
    'T' -> '7', 't' -> '7')

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Pure number: optional +/- sign, then digits with '.'/',' group
    * separators ("247.8", "1,234.56", "-3").
    */
  private[extract] def isNumberToken(tok: String): Boolean = {
    val body = if (tok.nonEmpty && (tok.head == '+' || tok.head == '-')) tok.tail else tok
    body.nonEmpty && body.head.isDigit && body.last.isDigit &&
      body.forall(c => isDigit(c) || c == '.' || c == ',') &&
      !body.sliding(2).exists(p => p.length == 2 && !isDigit(p.head) && !isDigit(p(1)))
  }

  /** Repair one whitespace-delimited token. Leading/trailing punctuation
    * is held out so "C4rb0n:" repairs the word core only. Public so the
    * corpus generator can verify a noise injection is repairable.
    */
  def repairToken(tok: String): String = {
    // Strip leading/trailing non-alphanumerics (punctuation shell).
    var start = 0
    var end = tok.length
    while (start < end && !isAsciiLetter(tok(start)) && !isDigit(tok(start))) start += 1
    while (end > start && !isAsciiLetter(tok(end - 1)) && !isDigit(tok(end - 1))) end -= 1
    if (start >= end) return tok
    val core = tok.substring(start, end)
    val repaired = repairCore(core)
    if (repaired eq core) tok
    else tok.substring(0, start) + repaired + tok.substring(end)
  }

  private def repairCore(core: String): String = {
    if (isNumberToken(core)) return core
    var letters = 0
    var uppers = 0
    var i = 0
    while (i < core.length) {
      val c = core(i)
      if (isAsciiLetter(c)) {
        letters += 1
        if (c.isUpper) uppers += 1
      }
      i += 1
    }
    if (letters == 0) return core // symbol/digit soup that is not a number: leave it
    val table = if (uppers * 2 > letters) digitToUpper else digitToLower
    var changed = false
    val sb = new java.lang.StringBuilder(core.length)
    i = 0
    while (i < core.length) {
      val c = core(i)
      table.get(c) match {
        case Some(r) => sb.append(r); changed = true
        case None    => sb.append(c)
      }
      i += 1
    }
    if (changed) sb.toString else core
  }

  /** Repair confusions in a single line (token-by-token, whitespace kept
    * by re-splitting on single spaces after canonicalization happens at
    * the line level).
    */
  private def repairLine(line: String): String =
    line.split(' ').iterator.map(repairToken).mkString(" ")

  /** Full normalization: whitespace canonicalization + confusion repair.
    * Returns "" when nothing survives (span will be dropped at
    * reassembly, reference document_processor.py:236-239).
    */
  def normalize(text: String): String = {
    if (text == null) return ""
    // Split into paragraphs on blank lines; within a paragraph trim each
    // line and collapse internal whitespace runs to single spaces.
    val lines = text.split("\n", -1)
    val paras = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = {
      if (cur.length > 0) { paras += cur.toString; cur.setLength(0) }
    }
    var i = 0
    while (i < lines.length) {
      val t = collapseWs(lines(i))
      if (t.isEmpty) flush()
      else {
        if (cur.length > 0) cur.append('\n')
        cur.append(repairLine(t))
      }
      i += 1
    }
    flush()
    paras.mkString("\n\n")
  }

  /** Trim + collapse runs of spaces/tabs/CR to a single space. */
  private[extract] def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\u000B' || c == '\f') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
