package graft.extract

import graft.model._

/** Per-span extraction router: kind ∈ {html, pdf, image} → from-scratch
  * extractor (reference dispatch analog:
  * core/processors/document_processor.py:110-132 `_prepare_images`
  * routes by file extension; unknown kinds fail soft with an empty
  * result rather than poisoning the partition).
  *
  * Pure function — safe inside `mapPartitions`; all extractor state is
  * static (no model loading to amortize, unlike the reference's lazy
  * GOT-OCR load ocr_engine.py:32-71, but the per-partition placement
  * mirrors it so heavier tokenizer state could be added without a
  * redesign).
  */
object Extractor {

  /** Extract main content for one span. Returns the extracted span with
    * "" text when nothing survives (dropped at reassembly, reference
    * document_processor.py:236-239). media_ref passes through for image
    * spans (north_star: "media-ref passthrough with OCR-text
    * normalization").
    */
  def extractSpan(s: SpanRow, fmt: OutFormat): ExtractedSpan = {
    val markdown = fmt == OutFormat.Markdown
    val text = s.kind match {
      case "html"  => HtmlExtractor.extract(s.text, markdown)
      case "pdf"   => PdfExtractor.extract(s.text)
      case "image" => Normalizer.normalize(s.text)
      case _       => "" // unsupported kind — reference rejects unknown
                         // extensions (api/server.py:99-106)
    }
    val mediaRef = if (s.kind == "image") s.media_ref else null
    ExtractedSpan(s.doc_id, s.kind, text, mediaRef, s.offset)
  }
}
