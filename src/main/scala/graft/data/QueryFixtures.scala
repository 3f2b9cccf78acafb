package graft.data

import graft.extract.{Extractor, Zones}
import graft.functions.TextFunctions
import graft.model.{Doc, ExtractedDoc, OutFormat, OutSpan, Span, SpanRow}
import graft.Renderer

/** Deterministic fixtures behind the driver-oracled queries z1 / t6 / r1.
  *
  * Pattern (same as x5/m1/p2): every input is CONSTRUCTED from integer
  * arithmetic over `doc_id`, the query runs the REAL operator over it,
  * and the DuckDB oracle predicts the result analytically from the same
  * arithmetic — it never runs the operator. A drift in any operator
  * branch breaks the value hash.
  *
  * All kernels live here as object-level methods: lambdas in
  * SparkEntry's query closures may only call object methods (local defs
  * capture the enclosing instance and break Task serialization).
  */
object QueryFixtures {

  // ------------------------------------------------------------- z1 zones

  /** Synthetic zone layout for doc `d` (reference layout semantics,
    * core/models/layout_engine.py:208-278):
    *   - `(d % 3) + 1` well-separated horizontal chains of text zones,
    *     chain c of length `((d + c) % 3) + 1`, widths 80/90/100 and
    *     10px gaps (<= AdjacencyGap, so each chain merges to one zone);
    *   - one low-confidence text zone vertically adjacent to chain 0 —
    *     the confidence filter (F2) must drop it BEFORE merging or the
    *     chain-0 bbox grows to y2=105 and the hash breaks;
    *   - on even docs one "figure" zone at x=5000 that must pass through
    *     unmerged and sort last in reading order.
    * Confidences are exact hundredths in [0.50, 0.99] so the merged
    * area-weighted confidence is a small rational, never within 1e-5 of
    * a 4-decimal rounding boundary (validated over d < 100000).
    */
  def zones(d: Long): Seq[Zones.Zone] = {
    val zs = scala.collection.mutable.ArrayBuffer.empty[Zones.Zone]
    val clusters = (d % 3).toInt + 1
    var c = 0
    while (c < clusters) {
      val len = ((d + c) % 3).toInt + 1
      var x = c * 1000
      var j = 0
      while (j < len) {
        val w = 80 + 10 * j
        val conf = (((d + 7L * c + 3L * j) % 50) + 50) / 100.0
        zs += Zones.Zone(x, 0, x + w, 50, "text", conf)
        x += w + 10
        j += 1
      }
      c += 1
    }
    zs += Zones.Zone(0, 55, 80, 105, "text", ((d % 5) * 10 + 5) / 100.0)
    if (d % 2 == 0) zs += Zones.Zone(5000, 0, 5060, 50, "figure", 0.9)
    zs.toSeq
  }

  /** z1 row kernel: confidence filter -> merge-adjacent -> reading order,
    * emitted as one row per surviving zone with its final order index.
    */
  def zoneRows(d: Long): Iterator[(Long, Int, Int, Int, Int, Int, String, Double)] = {
    val merged = Zones.mergeAdjacentTextZones(Zones.filterConfident(zones(d)))
    merged.iterator.zipWithIndex.map { case (z, i) =>
      (d, i, z.x1, z.y1, z.x2, z.y2, z.zone_type, z.confidence)
    }
  }

  // --------------------------------------------------- t6 ocr word pairs

  /** Noisy/clean word pairs for the t6 ocr_normalize oracle. The clean
    * side is what `Normalizer.normalize` PRODUCES for the noisy side
    * (asserted pairwise by OcrNormalizeSpec); the same two lists appear
    * as DuckDB literals in the t6 oracle SQL — keep them in sync.
    */
  val NoisyWords: Seq[String] = Seq(
    "Tot4l", "C3RTIFICAT3", "C4rb0n:", "ENVIR0NMENTAL",
    "M0del", "C02", "Dur4ble", "r3new4ble")
  val CleanWords: Seq[String] = Seq(
    "Total", "CERTIFICATE", "Carbon:", "ENVIRONMENTAL",
    "Model", "CO2", "Durable", "renewable")

  // -------------------------------------------------------- p4 pdf layout

  /** All length 5, so every token box is 50 wide (w = 10·len default)
    * and the XY-cut geometry below is constant — only the letters vary
    * with doc_id. Mirrored as a DuckDB literal in the p4 oracle.
    */
  val PdfWords: Seq[String] = Seq(
    "alpha", "brick", "cloud", "delta", "eagle", "frost", "grape", "house")

  /** p4 kernel: a positioned-token span whose recursive XY-cut reading
    * order is closed-form, run through the REAL PdfExtractor.extract.
    * Geometry (all boxes 50x40):
    *   - header at y=0 (two tokens x=0/x=90 on even docs, one on odd);
    *   - body at y=100..240: a left column at x=0, plus on even docs a
    *     right column at x=240 (x-valley 100 >= MinGapX, and wider than
    *     the 60px header/body y-valley, so the top region cuts
    *     VERTICALLY first — left block, then right);
    *   - a footer at y=600 (y-valley 360, always the first cut);
    *   - entries arrive SCRAMBLED (footer first) so order must come
    *     from positions, not input order; one %-escaped token, one
    *     3-number entry (w explicit), one 4-number entry, and two
    *     malformed entries that must be skipped.
    * Expected: header line / left column / [right column] / "f end",
    * blocks joined "\n\n", lines "\n", same-bucket tokens " ".
    */
  def pdfLayoutRow(d: Long): (Long, String) = {
    val a = PdfWords((d % 8).toInt)
    val b = PdfWords(((d * 3 + 1) % 8).toInt)
    val c = (2 to 4).map(j => PdfWords(((d * 5 + j) % 8).toInt))
    val r = (5 to 7).map(j => PdfWords(((d * 7 + j) % 8).toInt))
    val entries =
      if (d % 2 == 0) Seq(
        s"${c(1)}@0,150,50", "f%20end@0,600", s"$a@0,0", s"${r(1)}@240,150",
        s"$b@90,0", s"${c(0)}@0,100", s"${r(0)}@240,100,50,40",
        s"${c(2)}@0,200", s"${r(2)}@240,200", "junk", "x@y,z")
      else Seq(
        s"${c(1)}@0,150,50", "f%20end@0,600", s"$a@0,0",
        s"${c(0)}@0,100", s"${c(2)}@0,200", "junk", "x@y,z")
    (d, graft.extract.PdfExtractor.extract(entries.mkString(";")))
  }

  // -------------------------------------------------- h1 html boilerplate

  /** h1 kernel: a constructed page through the REAL HtmlExtractor in
    * both plain and markdown mode. Because every word is length 5, the
    * density arithmetic is constant and only the letters vary:
    *   - title + h1 survive as headings ("# "-prefixed in markdown);
    *   - the 7-word paragraph (37 chars, one &amp; entity) has text
    *     density 7 >= 1 → kept;
    *   - the inline-link paragraph has link density 5/23 <= 1/3 → kept
    *     WITH the anchor text;
    *   - the nav block (structural prior), the all-anchor paragraph
    *     (link density 1), the 100-char single-word div (text density
    *     0.5), the style element, and the comment are all dropped.
    * Oracle = the expected survivor join, from the same word indices.
    */
  def htmlRow(d: Long): (Long, String, String) = {
    val w = PdfWords
    def W(i: Long) = w((i % 8).toInt)
    val t0 = W(d); val h = W(d * 3 + 1)
    val c = (0 to 5).map(j => W(d * 5 + j))
    val il = (0 to 3).map(j => W(d * 7 + j))
    val html =
      s"""<html><head><title>$t0</title><style>p{color:red}</style></head><body>
         |<nav><p>${W(d + 2)} <a href="/">${W(d + 3)}</a></p></nav>
         |<!-- chrome comment -->
         |<h1>$h</h1>
         |<p>${c(0)} ${c(1)} ${c(2)} &amp; ${c(3)} ${c(4)} ${c(5)}</p>
         |<p><a href="#">${W(d + 4)} ${W(d + 5)}</a></p>
         |<p>${il(0)} ${il(1)} <a href="#x">${il(2)}</a> ${il(3)}</p>
         |<div>${"x" * 100}</div>
         |</body></html>""".stripMargin
    (d, graft.extract.HtmlExtractor.extract(html, markdown = false),
      graft.extract.HtmlExtractor.extract(html, markdown = true))
  }

  // ------------------------------------------------------------ p5 pipeline

  /** p5 kernel: a Doc whose span mix is pure doc_id arithmetic, fed to
    * the REAL distributed pipeline (flatten → dispatch → reassemble —
    * unlike r1, which exercises the kernels driver-side) so the
    * pipeline's cardinality contract (n_spans / spans_in / success)
    * gets a closed-form oracle:
    *   - d % 29 == 0 → empty doc (spans_in = 0, n_spans = 0, and the
    *     explode_outer empty-doc row must still surface);
    *   - else n = 1 + d % 5 spans; span j's branch by (d + j) % 4:
    *       0 → pdf "W@0,0;W@60,0" → "W W"        (kept)
    *       1 → image PdfWord + media_ref          (kept — normalize
    *           is identity on the clean word list)
    *       2 → image whitespace → ""              (dropped, F3)
    *       3 → kind "bin" → whitelist reject      (dropped, F1)
    * so n_spans = |{j in [0,n) : (d+j)%4 ∈ {0,1}}| and success is
    * always true (no branch throws).
    */
  def pipelineDoc(d: Long): Doc = {
    val id = f"p5-$d%08d"
    if (d % 29 == 0) Doc(id, Seq.empty)
    else {
      val n = 1 + (d % 5).toInt
      Doc(id, (0 until n).map { j =>
        val w = PdfWords(((d + j) % 8).toInt)
        ((d + j) % 4).toInt match {
          case 0 => Span("pdf", s"$w@0,0;$w@60,0", null, j + 1)
          case 1 => Span("image", w, s"media://$id/$j", j + 1)
          case 2 => Span("image", "  \n \t ", null, j + 1)
          case _ => Span("bin", "junk", null, j + 1)
        }
      })
    }
  }

  // ------------------------------------------------------------ r1 render

  /** r1 kernel: three constructed spans routed through the REAL
    * dispatch (`Extractor.extractSpan` — image spans normalize + keep
    * media_ref, unknown kinds are rejected to ""), reassembled with the
    * pipeline's survivor rule (non-empty text, 0-based order), then
    * rendered by all three sinks plus the context truncation:
    *   - d%4==0: first span has a paragraph break (html <p> split +
    *     excerpt cuts at a late newline);
    *   - d%4==1: long first line (excerpt hard-cuts mid-line);
    *   - d%4==2: line exactly at the newline threshold;
    *   - d%4==3: second image span normalizes to "" and is DROPPED, and
    *     the short survivor skips truncation entirely.
    * Returns (doc_id, markdown, html, plain, excerpt).
    */
  def renderRow(d: Long): (Long, String, String, String, String) = {
    val aText = (d % 4) match {
      case 0 => "V4lue one\n\nline2"
      case 1 => "V4luation st4tement extr4"
      case 2 => "V4luation st4tement"
      case _ => "Sh0rt"
    }
    val cText = if (d % 4 == 3) "   " else "Gr33n & c3rt <ok>"
    val spans = Seq(
      SpanRow(d.toString, "image", aText, "img://" + d, 0),
      SpanRow(d.toString, "bin", "junk", null, 1),
      SpanRow(d.toString, "image", cText, null, 2))
    val survivors = spans.sortBy(_.offset)
      .map(sr => Extractor.extractSpan(sr, OutFormat.Plain))
      .filter(es => es.text != null && es.text.nonEmpty)
    val doc = ExtractedDoc(d.toString,
      survivors.zipWithIndex.map { case (es, i) =>
        OutSpan(es.kind, es.text, es.media_ref, i)
      }, spans.length, success = true, error = null)
    val plain = Renderer.toPlainText(doc)
    (d, Renderer.toMarkdown(doc), Renderer.toHtml(doc), plain,
      TextFunctions.smartTruncate(plain, 20))
  }
}
