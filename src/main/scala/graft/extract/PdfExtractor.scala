package graft.extract

import scala.collection.mutable.ArrayBuffer

/** PDF layout extractor: reconstructs reading order from glyph/token
  * positions via recursive XY-cut segmentation.
  *
  * Input grammar (the positioned-token encoding emitted by the corpus
  * generator, FIXTURES.md F-PDF):
  *
  *   span.text = "tok@x,y[,w,h];tok@x,y;..."
  *
  * where x,y are page coordinates (integers, y grows downward) and w,h
  * are optional token box extents (defaults: w = 10 * tok.length, h = 40
  * — i.e. ~150 dpi glyph boxes like the reference renders at,
  * core/processors/pdf_handler.py:15). Token text is %-escaped for the
  * reserved characters (%40=@ %3B=; %2C=, %25=%).
  *
  * Algorithm — recursive XY-cut (generalizing the reference's single-pass
  * line bucketing `(y1 // 50, x1)`, core/models/layout_engine.py:195-206):
  *
  *   1. Project token boxes onto an axis; find maximal uncovered gaps
  *      strictly inside the region.
  *   2. Split on the widest gap of width >= MIN_GAP (50 units on either
  *      axis); on ties prefer the horizontal cut (top-to-bottom order
  *      dominates, matching the reference's y-major sort).
  *   3. Recurse; recursion order = top block first (horizontal cut) /
  *      left block first (vertical cut) — producing the canonical
  *      top-to-bottom, left-to-right reading order.
  *   4. A region with no splittable gap is a leaf block: tokens are
  *      ordered by the reference's key (y / 50, x, input index) — the
  *      stable tie-break keeps goldens deterministic under input-span
  *      permutation; lines (same y-bucket) join tokens with " ", lines
  *      join with "\n".
  *
  * Blocks join with "\n\n" (reference zone combine,
  * document_processor.py:215-228). On single-column layouts there is no
  * valley, so the result reduces exactly to the reference's
  * `(y // 50, x)` ordering — the compatibility requirement of SURVEY.md
  * §7.1.
  */
object PdfExtractor {

  final case class Tok(text: String, x: Int, y: Int, w: Int, h: Int, idx: Int) {
    def x2: Int = x + w
    def y2: Int = y + h
  }

  val MinGapX = 50 // min vertical valley width to cut columns
  val MinGapY = 50 // min horizontal valley height to cut rows
  val LineBucket = 50 // reference layout_engine.py:201 `y1 // 50`

  /** %-escape token text for the positional grammar (generator side). */
  def escapeTok(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '%' => sb.append("%25")
      case '@' => sb.append("%40")
      case ';' => sb.append("%3B")
      case ',' => sb.append("%2C")
      case ' ' => sb.append("%20")
      case c   => sb.append(c)
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def unescapeTok(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      // invalid escapes (%G1, trailing %) pass through literally —
      // extraction must never throw on malformed input
      if (c == '%' && i + 2 < s.length && isHex(s(i + 1)) && isHex(s(i + 2))) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse the positional grammar. Malformed entries are skipped
    * (extraction never throws; a fully-unparseable span yields "").
    */
  def parse(text: String): Array[Tok] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = ArrayBuffer.empty[Tok]
    var idx = 0
    text.split(';').foreach { ent0 =>
      val ent = ent0.trim
      if (ent.nonEmpty) {
        val at = ent.lastIndexOf('@')
        if (at > 0) {
          val tok = unescapeTok(ent.substring(0, at))
          val nums = ent.substring(at + 1).split(',')
          try {
            if (nums.length >= 2) {
              val x = nums(0).trim.toInt
              val y = nums(1).trim.toInt
              val w = if (nums.length >= 3) nums(2).trim.toInt else 10 * math.max(tok.length, 1)
              val h = if (nums.length >= 4) nums(3).trim.toInt else 40
              out += Tok(tok, x, y, w, h, idx)
              idx += 1
            }
          } catch { case _: NumberFormatException => () }
        }
      }
    }
    out.toArray
  }

  /** Largest uncovered gap strictly inside [lo, hi] of the projected
    * intervals. Returns (gapStart, gapWidth) of the widest gap, or null.
    * Intervals arrive packed (start << 32 | end-as-unsigned) in one
    * primitive long array — this runs twice per XY-cut node, and a
    * tuple array would box every endpoint. Signed long order equals
    * (start, end) lexicographic order because starts sharing a sign
    * compare by the high word first; coordinates are span-local ints.
    */
  private def widestGap(packed: Array[Long]): Long = {
    // intervals sorted by start; merge, track gaps between merged runs
    java.util.Arrays.sort(packed)
    var bestStart = 0
    var bestW = -1
    var curEnd = packed(0).toInt
    var i = 1
    while (i < packed.length) {
      val s = (packed(i) >> 32).toInt
      val e = packed(i).toInt
      if (s > curEnd) {
        val w = s - curEnd
        if (w > bestW) { bestW = w; bestStart = curEnd }
      }
      if (e > curEnd) curEnd = e
      i += 1
    }
    if (bestW <= 0) -1L else (bestStart.toLong << 32) | (bestW.toLong & 0xFFFFFFFFL)
  }

  private def packY(toks: Array[Tok]): Array[Long] = {
    val a = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      a(i) = (toks(i).y.toLong << 32) | (toks(i).y2.toLong & 0xFFFFFFFFL)
      i += 1
    }
    a
  }

  private def packX(toks: Array[Tok]): Array[Long] = {
    val a = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      a(i) = (toks(i).x.toLong << 32) | (toks(i).x2.toLong & 0xFFFFFFFFL)
      i += 1
    }
    a
  }

  /** Recursion-depth cap: pathological layouts (alternating single-token
    * gaps) would otherwise make XY-cut O(n^2); past the cap the region is
    * rendered as one block in (y/50, x) order — the reference's own
    * single-pass ordering, so degradation is graceful.
    */
  val MaxDepth = 64

  /** Recursive XY-cut: emit leaf blocks in reading order. */
  private def xyCut(toks: Array[Tok], out: ArrayBuffer[Array[Tok]],
      depth: Int = 0): Unit = {
    if (toks.isEmpty) return
    if (toks.length > 1 && depth < MaxDepth) {
      val yGap = widestGap(packY(toks))
      val xGap = widestGap(packX(toks))
      val yW = if (yGap == -1L) -1 else yGap.toInt
      val xW = if (xGap == -1L) -1 else xGap.toInt
      val cutY = yGap != -1L && yW >= MinGapY
      val cutX = xGap != -1L && xW >= MinGapX
      if (cutY && (!cutX || yW >= xW)) {
        // horizontal cut: top region first
        val mid = (yGap >> 32).toInt + yW / 2
        val (top, bot) = toks.partition(_.y2 <= mid)
        if (top.nonEmpty && bot.nonEmpty) {
          xyCut(top, out, depth + 1); xyCut(bot, out, depth + 1); return
        }
      }
      if (cutX) {
        val mid = (xGap >> 32).toInt + xW / 2
        val (left, right) = toks.partition(_.x2 <= mid)
        if (left.nonEmpty && right.nonEmpty) {
          xyCut(left, out, depth + 1); xyCut(right, out, depth + 1); return
        }
      }
    }
    out += toks
  }

  /** Render one leaf block: reference ordering (y/50, x, idx); tokens of
    * one line join with " ", lines join with "\n".
    */
  private val blockOrder: java.util.Comparator[Tok] =
    new java.util.Comparator[Tok] {
      override def compare(a: Tok, b: Tok): Int = {
        // floorDiv matches Scala's Int./ only for non-negative y; use
        // the same truncating division sortBy compiled to
        val ba = a.y / LineBucket
        val bb = b.y / LineBucket
        if (ba != bb) Integer.compare(ba, bb)
        else if (a.x != b.x) Integer.compare(a.x, b.x)
        else Integer.compare(a.idx, b.idx)
      }
    }

  private def renderBlock(toks: Array[Tok]): String = {
    val sorted = toks.clone()
    java.util.Arrays.sort(sorted, blockOrder)
    val sb = new java.lang.StringBuilder
    var curBucket = Int.MinValue
    var first = true
    sorted.foreach { t =>
      val b = t.y / LineBucket
      if (first) { first = false }
      else if (b != curBucket) sb.append('\n')
      else sb.append(' ')
      sb.append(t.text)
      curBucket = b
    }
    sb.toString
  }

  /** Full extraction: positioned-token span text → reading-ordered text.
    * Empty / unparseable input yields "" (dropped at reassembly).
    */
  def extract(text: String): String = {
    val toks = parse(text)
    if (toks.isEmpty) return ""
    val blocks = ArrayBuffer.empty[Array[Tok]]
    xyCut(toks, blocks)
    blocks.iterator.map(renderBlock).filter(_.nonEmpty).mkString("\n\n")
  }
}
