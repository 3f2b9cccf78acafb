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
    * separators ("247.8", "1,234.56", "-3"). Index-based — this runs
    * once per token of every OCR span, so it must not allocate.
    */
  private[extract] def isNumberToken(tok: String): Boolean = {
    val start =
      if (tok.nonEmpty && (tok.charAt(0) == '+' || tok.charAt(0) == '-')) 1
      else 0
    val n = tok.length
    if (start >= n) return false
    if (!isDigit(tok.charAt(start)) || !isDigit(tok.charAt(n - 1))) return false
    var i = start
    var prevSep = false // two adjacent non-digits ('.'/',') disqualify
    while (i < n) {
      val c = tok.charAt(i)
      if (isDigit(c)) prevSep = false
      else if (c == '.' || c == ',') {
        if (prevSep) return false
        prevSep = true
      } else return false
      i += 1
    }
    true
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
    // branch tables inline (a Map lookup would box every Char — this is
    // the innermost per-character loop of the OCR route)
    val upper = uppers * 2 > letters
    var changed = false
    val sb = new java.lang.StringBuilder(core.length)
    i = 0
    while (i < core.length) {
      val c = core(i)
      val r = c match {
        case '0' => if (upper) 'O' else 'o'
        case '1' => if (upper) 'I' else 'l'
        case '3' => if (upper) 'E' else 'e'
        case '4' => if (upper) 'A' else 'a'
        case '7' => if (upper) 'T' else 't'
        case other => other
      }
      if (r != c) changed = true
      sb.append(r)
      i += 1
    }
    if (changed) sb.toString else core
  }

  /** Repair confusions in a single line (token-by-token, whitespace kept
    * by re-splitting on single spaces after canonicalization happens at
    * the line level). Fast path: repairs only ever touch the digits
    * 0/1/3/4/7, so a line without any of them is returned as-is —
    * most clean lines skip the split/rebuild entirely.
    */
  private def repairLine(line: String): String = {
    var i = 0
    var hasRepairable = false
    while (i < line.length && !hasRepairable) {
      val c = line.charAt(i)
      hasRepairable = c == '0' || c == '1' || c == '3' || c == '4' || c == '7'
      i += 1
    }
    if (!hasRepairable) line
    else line.split(' ').iterator.map(repairToken).mkString(" ")
  }

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

  /** Trim + collapse runs of spaces/tabs/CR to a single space. Returns
    * the SAME string when it is already canonical (no leading/trailing
    * space, no runs, no tab/CR/VT/FF) — the common case for clean text,
    * and this runs once per line of every span.
    */
  private[extract] def collapseWs(s: String): String = {
    var i0 = 0
    var canonical = s.isEmpty || (s.charAt(0) != ' ' && s.charAt(s.length - 1) != ' ')
    var prevSpace = false
    while (canonical && i0 < s.length) {
      val c = s.charAt(i0)
      if (c == '\t' || c == '\r' || c == '\u000B' || c == '\f') canonical = false
      else if (c == ' ') {
        if (prevSpace) canonical = false
        prevSpace = true
      } else prevSpace = false
      i0 += 1
    }
    if (canonical) return s
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
