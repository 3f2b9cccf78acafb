package graft

import graft.model.ExtractedDoc

/** Output renderers (reference core/processors/renderer.py:22-89 — HTML
  * and Markdown template sinks — and the result-shaping projection
  * core/pipeline.py:148-171). Edge-only string templating, not a
  * distributed op (SURVEY.md §2.1 S8/S9): apply via a final `map` before
  * the sink when the consumer wants rendered documents.
  */
object Renderer {

  private def escapeHtml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  /** Markdown document: spans in order, separated by blank lines; image
    * spans get an image link to their media_ref (renderer.py:63-89
    * analog).
    */
  def toMarkdown(doc: ExtractedDoc): String = {
    val parts = doc.spans.sortBy(_.order).map { s =>
      if (s.kind == "image" && s.media_ref != null)
        s"![${s.kind}](${s.media_ref})\n\n${s.text}"
      else s.text
    }
    s"# ${doc.doc_id}\n\n" + parts.mkString("\n\n")
  }

  /** Minimal standalone HTML page (renderer.py:22-61 analog). */
  def toHtml(doc: ExtractedDoc): String = {
    val body = doc.spans.sortBy(_.order).map { s =>
      val cls = escapeHtml(s.kind)
      val ref =
        if (s.media_ref != null)
          s"""<div class="media-ref">${escapeHtml(s.media_ref)}</div>"""
        else ""
      val paragraphs = s.text.split("\n\n")
        .map(p => s"<p>${escapeHtml(p).replace("\n", "<br/>")}</p>")
        .mkString("\n")
      s"""<section class="span $cls" data-order="${s.order}">$ref$paragraphs</section>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"/><title>${escapeHtml(doc.doc_id)}</title></head>
       |<body>
       |<article id="${escapeHtml(doc.doc_id)}">
       |$body
       |</article>
       |</body></html>""".stripMargin
  }

  /** Result shaping (pipeline.py:148-171 `_format_result` analog):
    * flat plain-text join of the ordered spans with "\n\n"
    * (document_processor.py:230-241 page combine).
    */
  def toPlainText(doc: ExtractedDoc): String =
    doc.spans.sortBy(_.order).map(_.text).filter(_.nonEmpty).mkString("\n\n")
}
