package graft.data

import graft.extract.{Normalizer, PdfExtractor}
import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Deterministic self-golden corpus generator (FIXTURES.md §4).
  *
  * Emits input documents AND their expected extraction output side by
  * side, mirroring how the reference pairs documents with
  * expected_fields/expected_values (test_ai_models/dataset.json,
  * test_ai_models/model_evaluator.py:399-423). Expectations are built
  * CONSTRUCTIVELY from the generator's own ground-truth pieces — never
  * by calling the extractors — so golden tests are not tautological.
  *
  * Fully splittable: `genDoc(seed, i, cfg)` is a pure function of the
  * doc index, so a corpus of any size can be generated distributively
  * from `spark.range(n)` with no driver materialization and no external
  * data (input_hint: "no external data"; seed fixed).
  */
object CorpusGen {

  /** The SplitMix64 finalizer (Steele et al., OOPSLA 2014) — THE mixing
    * function of this codebase, shared by Rng, the similarity plane
    * generator, and the bench's skew-corpus generator so the constant
    * triple lives in exactly one place. Callers add the golden-ratio
    * gamma to their state/stream position themselves (each seeds
    * differently).
    */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** SplitMix64 — public-domain PRNG (Steele et al., OOPSLA 2014);
    * splittable by construction: state = f(seed, docIndex).
    */
  final class Rng(private var s: Long) {
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      mix64(s)
    }
    def nextInt(n: Int): Int = java.lang.Math.floorMod(nextLong(), n.toLong).toInt
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def chance(p: Double): Boolean = nextDouble() < p
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  final case class GenConfig(
      markdown: Boolean = false,
      /** every k-th doc is a mega-doc with `megaSpans` spans (0 = off) */
      megaEvery: Long = 0,
      megaSpans: Int = 20000)

  /** A generated pair: the input doc and its expected extraction. */
  final case class GoldenDoc(input: Doc, expected: ExtractedDoc)

  private val words: IndexedSeq[String] = Vector(
    "carbon", "report", "product", "energy", "lifecycle", "emission",
    "supply", "chain", "metric", "baseline", "audit", "datacenter",
    "module", "server", "display", "battery", "assembly", "footprint",
    "material", "recycled", "transport", "usage", "phase", "total",
    "annual", "estimate", "measured", "verified", "standard", "model")

  private val navWords: IndexedSeq[String] = Vector(
    "Home", "About", "Products", "Contact", "Login", "Careers",
    "Support", "Blog", "Legal", "Privacy")

  // ------------------------------------------------------------ plumbing

  private def sentence(r: Rng): String = {
    val n = 5 + r.nextInt(8)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val w = r.pick(words)
      if (i == 0) sb.append(w.capitalize) else sb.append(w)
      i += 1
      if (i < n) sb.append(' ')
    }
    sb.append('.')
    sb.toString
  }

  private def paragraph(r: Rng): String = {
    val n = 1 + r.nextInt(3)
    (0 until n).map(_ => sentence(r)).mkString(" ")
  }

  // ---------------------------------------------------------------- html

  /** Returns (htmlText, expectedExtractedText). */
  private[data] def genHtml(r: Rng, markdown: Boolean): (String, String) = {
    val html = new StringBuilder
    val expected = ArrayBuffer.empty[String]

    html.append("<html><head><title></title>")
    if (r.chance(0.5)) html.append("<script>var x = 1 < 2; track();</script>")
    if (r.chance(0.3)) html.append("<style>.nav { color: red; }</style>")
    html.append("</head><body>")

    if (r.chance(0.6)) { // nav boilerplate (high link density + container)
      html.append("<nav><ul>")
      val n = 3 + r.nextInt(5)
      (0 until n).foreach { _ =>
        html.append("<li><a href=\"#\">").append(r.pick(navWords)).append("</a></li>")
      }
      html.append("</ul></nav>")
    }
    if (r.chance(0.4)) { // header chrome
      html.append("<header><div>").append(r.pick(navWords))
        .append(" site</div></header>")
    }

    val navOnly = r.chance(0.12)
    if (!navOnly) {
      if (r.chance(0.8)) { // title heading
        val t = (0 until (2 + r.nextInt(3))).map(_ => r.pick(words).capitalize).mkString(" ")
        val tag = "h" + (1 + r.nextInt(3))
        html.append('<').append(tag).append('>').append(t)
          .append("</").append(tag).append('>')
        expected += (if (markdown) "# " + t else t)
      }
      val nParas = 1 + r.nextInt(4)
      (0 until nParas).foreach { _ =>
        if (r.chance(0.25)) { // link farm — dropped (density > 1/3)
          html.append("<p>")
          val n = 5 + r.nextInt(6)
          (0 until n).foreach { k =>
            if (k > 0) html.append(' ')
            html.append("<a href=\"/x\">").append(r.pick(navWords)).append("</a>")
          }
          html.append("</p>")
        } else {
          val pre = paragraph(r)
          if (r.chance(0.35)) { // inline link below threshold — kept
            val linkWord = r.pick(words)
            val post = sentence(r)
            html.append("<p>").append(pre).append(" <a href=\"/y\">")
              .append(linkWord).append("</a> ").append(post).append("</p>")
            expected += s"$pre $linkWord $post"
          } else {
            html.append("<p>").append(pre).append("</p>")
            expected += pre
          }
        }
      }
      if (r.chance(0.3)) html.append("<!-- generated page -->")
    }

    if (r.chance(0.5)) { // aside / nested boilerplate
      html.append("<aside><div><p>")
        .append((0 until 4).map(_ => r.pick(words)).mkString(" "))
        .append("</p></div></aside>")
    }
    if (r.chance(0.6)) {
      html.append("<footer><p>Copyright <a href=\"/l\">Legal</a></p></footer>")
    }
    html.append("</body></html>")
    (html.toString, expected.mkString("\n\n"))
  }

  // ----------------------------------------------------------------- pdf

  /** One positioned token. */
  private final case class PTok(text: String, x: Int, y: Int)

  /** A text line whose token boxes stay entirely within [x0, maxX] —
    * guarantees the inter-column whitespace valley the XY-cut relies on.
    * Intra-line token gaps are 20 (< PdfExtractor.MinGapX), so a line is
    * never split into column blocks by accident.
    */
  private def tokLine(r: Rng, x0: Int, y: Int, maxX: Int): ArrayBuffer[PTok] = {
    val out = ArrayBuffer.empty[PTok]
    var x = x0
    val n = 2 + r.nextInt(4)
    var i = 0
    var w = r.pick(words)
    while (i < n && x + w.length * 10 <= maxX) {
      out += PTok(w, x, y)
      x += w.length * 10 + 20
      w = r.pick(words)
      i += 1
    }
    if (out.isEmpty) out += PTok("total", x0, y) // never emit an empty line
    out
  }

  /** A full-width line: tokens at a tight 60-unit x-pitch so the union of
    * their boxes has no uncovered gap >= MinGapX anywhere across the page
    * (every word is >= 5 chars = 50 units wide). Used for headers/footers
    * that must bridge the inter-column valley, keeping the XY-cut's first
    * split horizontal.
    */
  private def denseLine(r: Rng, y: Int, count: Int): ArrayBuffer[PTok] = {
    val out = new ArrayBuffer[PTok](count)
    var i = 0
    while (i < count) {
      out += PTok(r.pick(words), i * 60, y)
      i += 1
    }
    out
  }

  private def encode(toks: Seq[PTok], r: Rng, shuffle: Boolean): String = {
    val arr = toks.toArray
    if (shuffle) { // permutation invariance: input order must not matter
      var i = arr.length - 1
      while (i > 0) {
        val j = r.nextInt(i + 1)
        val t = arr(i); arr(i) = arr(j); arr(j) = t
        i -= 1
      }
    }
    arr.map(t => s"${PdfExtractor.escapeTok(t.text)}@${t.x},${t.y}").mkString(";")
  }

  /** Returns (pdfPositionedText, expectedExtractedText). */
  private[data] def genPdf(r: Rng): (String, String) = {
    r.nextInt(4) match {
      case 0 => // single column — must match reference (y//50, x) order
        val nLines = 2 + r.nextInt(5)
        val toks = ArrayBuffer.empty[PTok]
        val lines = ArrayBuffer.empty[String]
        (0 until nLines).foreach { li =>
          val line = tokLine(r, 0, li * 60, 900)
          toks ++= line
          lines += line.map(_.text).mkString(" ")
        }
        (encode(toks.toSeq, r, shuffle = true), lines.mkString("\n"))

      case 1 => // two columns split by a vertical whitespace valley
        val nL = 2 + r.nextInt(4)
        val nR = 2 + r.nextInt(4)
        val toks = ArrayBuffer.empty[PTok]
        val left = ArrayBuffer.empty[String]
        val right = ArrayBuffer.empty[String]
        (0 until nL).foreach { li =>
          val line = tokLine(r, 0, li * 60, 380)
          toks ++= line; left += line.map(_.text).mkString(" ")
        }
        (0 until nR).foreach { li =>
          val line = tokLine(r, 500, li * 60, 880)
          toks ++= line; right += line.map(_.text).mkString(" ")
        }
        (encode(toks.toSeq, r, shuffle = true),
          left.mkString("\n") + "\n\n" + right.mkString("\n"))

      case 2 => // header + two columns + footer
        val toks = ArrayBuffer.empty[PTok]
        val header = denseLine(r, 0, 9 + r.nextInt(3))
        toks ++= header
        val colY0 = 120
        val nL = 2 + r.nextInt(3)
        val nR = 2 + r.nextInt(3)
        val left = ArrayBuffer.empty[String]
        val right = ArrayBuffer.empty[String]
        (0 until nL).foreach { li =>
          val line = tokLine(r, 0, colY0 + li * 60, 380)
          toks ++= line; left += line.map(_.text).mkString(" ")
        }
        (0 until nR).foreach { li =>
          val line = tokLine(r, 500, colY0 + li * 60, 880)
          toks ++= line; right += line.map(_.text).mkString(" ")
        }
        val footY = colY0 + math.max(nL, nR) * 60 + 80
        val footer = denseLine(r, footY, 9 + r.nextInt(3))
        toks ++= footer
        (encode(toks.toSeq, r, shuffle = true),
          header.map(_.text).mkString(" ") + "\n\n" +
            left.mkString("\n") + "\n\n" + right.mkString("\n") + "\n\n" +
            footer.map(_.text).mkString(" "))

      case _ => // table: tight grid, row-major reading order, tie-breaks
        val rows = 2 + r.nextInt(3)
        val cols = 2 + r.nextInt(3)
        val toks = ArrayBuffer.empty[PTok]
        val lines = ArrayBuffer.empty[String]
        (0 until rows).foreach { ri =>
          val cells = (0 until cols).map(_ => r.pick(words))
          cells.zipWithIndex.foreach { case (c, ci) =>
            toks += PTok(c, ci * 45, ri * 60) // 45 < MinGapX: stays one block
          }
          lines += cells.mkString(" ")
        }
        // ties preserved: emit in input order, no shuffle
        (encode(toks.toSeq, r, shuffle = false), lines.mkString("\n"))
    }
  }

  // --------------------------------------------------------------- image

  private def numStr(r: Rng): String =
    s"${10 + r.nextInt(990)}.${r.nextInt(10)}"

  /** Clean, already-normalized image OCR text (normalize(clean)==clean). */
  private[data] def genCleanImage(r: Rng): String = {
    val lines = ArrayBuffer.empty[String]
    lines += "ENVIRONMENTAL CERTIFICATE"
    if (r.chance(0.8)) lines += s"Product: ${r.pick(words).capitalize} ${r.pick(words).capitalize}"
    if (r.chance(0.8)) lines += s"Total Lifecycle Carbon: ${numStr(r)} kg CO2"
    if (r.chance(0.6)) lines += s"Energy Consumption: ${numStr(r)} kWh"
    if (r.chance(0.5)) lines += s"Weight: ${numStr(r)} kg"
    if (r.chance(0.4)) lines += s"• Certified by ${r.pick(words).capitalize}"
    if (r.chance(0.3)) lines += "✓ Compliant"
    lines.mkString("\n")
  }

  /** Inject OCR confusion + whitespace noise such that
    * Normalizer.normalize(noisy) == clean (checked per token — a
    * substitution is only kept when the repair provably restores it).
    */
  private[data] def injectNoise(clean: String, r: Rng): String = {
    val noisyLines = clean.split('\n').map { line =>
      val toks = line.split(' ').map { tok =>
        if (r.chance(0.55)) {
          val cand = tok.map { c =>
            Normalizer.letterToDigit.get(c) match {
              case Some(d) if r.chance(0.45) => d
              case _                         => c
            }
          }
          if (cand != tok && Normalizer.repairToken(cand) == tok) cand else tok
        } else tok
      }
      // whitespace noise: double spaces + stray leading/trailing blanks
      val sep = if (r.chance(0.3)) "  " else " "
      val pre = if (r.chance(0.2)) "  " else ""
      pre + toks.mkString(sep)
    }
    val withBlanks = noisyLines.flatMap { l =>
      if (r.chance(0.0)) Seq(l, "") else Seq(l) // blank lines would break
      // paragraph structure (blank line = paragraph break); disabled here,
      // covered by a dedicated fixture in the spec instead.
    }
    withBlanks.mkString("\n")
  }

  /** Returns (noisyImageText, expectedCleanText). */
  private[data] def genImage(r: Rng): (String, String) = {
    val clean = genCleanImage(r)
    val noisy = if (r.chance(0.85)) injectNoise(clean, r) else clean
    (noisy, clean)
  }

  // ----------------------------------------------------------- documents

  val DefaultSeed = 0x5eedL

  def docId(i: Long): String = f"doc-$i%012d"

  /** Generate one golden doc pair — pure function of (seed, index). */
  def genDoc(seed: Long, i: Long, cfg: GenConfig = GenConfig()): GoldenDoc = {
    val r = new Rng(seed ^ (i * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L))
    val id = docId(i)

    if (cfg.megaEvery > 0 && i % cfg.megaEvery == 0 && i > 0)
      return genMegaDoc(r, id, cfg)

    // ~2% empty docs (FIXTURES F-DOC "empty doc")
    val nSpans = if (r.chance(0.02)) 0 else 1 + r.nextInt(5)
    val spans = ArrayBuffer.empty[Span]
    val outs = ArrayBuffer.empty[OutSpan]
    var offset = 0
    var order = 0
    (0 until nSpans).foreach { _ =>
      offset += 1 + r.nextInt(3) // non-contiguous offsets: order is rank
      val roll = r.nextInt(100)
      if (roll < 6) { // empty / whitespace-only span — dropped
        spans += Span(r.pick(Vector("html", "pdf", "image")),
          if (r.chance(0.5)) "" else "  \n \t ", null, offset)
      } else if (roll < 37) {
        val (in, exp) = genHtml(r, cfg.markdown)
        spans += Span("html", in, null, offset)
        if (exp.nonEmpty) { outs += OutSpan("html", exp, null, order); order += 1 }
      } else if (roll < 68) {
        val (in, exp) = genPdf(r)
        spans += Span("pdf", in, null, offset)
        if (exp.nonEmpty) { outs += OutSpan("pdf", exp, null, order); order += 1 }
      } else {
        val (in, exp) = genImage(r)
        val ref = s"media://$id/$offset"
        spans += Span("image", in, ref, offset)
        if (exp.nonEmpty) { outs += OutSpan("image", exp, ref, order); order += 1 }
      }
    }
    GoldenDoc(Doc(id, spans.toSeq),
      ExtractedDoc(id, outs.toSeq, spans.length, success = true, null))
  }

  /** Mega-document (skew fixture): `cfg.megaSpans` simple spans. */
  private def genMegaDoc(r: Rng, id: String, cfg: GenConfig): GoldenDoc = {
    val n = cfg.megaSpans
    val spans = new ArrayBuffer[Span](n)
    val outs = new ArrayBuffer[OutSpan](n)
    var i = 0
    while (i < n) {
      val kind = i % 3
      if (kind == 0) {
        val t = s"Mega paragraph $i ${r.pick(words)} ${r.pick(words)} ${r.pick(words)} ${r.pick(words)}."
        spans += Span("html", s"<p>$t</p>", null, i)
        outs += OutSpan("html", t, null, outs.length)
      } else if (kind == 1) {
        val w1 = r.pick(words); val w2 = r.pick(words)
        spans += Span("pdf", s"$w1@0,0;$w2@${w1.length * 10 + 20},0", null, i)
        outs += OutSpan("pdf", s"$w1 $w2", null, outs.length)
      } else {
        val clean = s"Line $i of mega doc"
        spans += Span("image", clean, s"media://$id/$i", i)
        outs += OutSpan("image", clean, s"media://$id/$i", outs.length)
      }
      i += 1
    }
    GoldenDoc(Doc(id, spans.toSeq),
      ExtractedDoc(id, outs.toSeq, n, success = true, null))
  }

  /** Local (driver-side) corpus for unit tests. */
  def goldens(n: Int, seed: Long = DefaultSeed,
      cfg: GenConfig = GenConfig()): Seq[GoldenDoc] =
    (0L until n.toLong).map(genDoc(seed, _, cfg))
}
