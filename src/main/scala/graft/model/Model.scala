package graft.model

/** Core row types of the extraction engine.
  *
  * Input schema is authoritative from BASELINE.json `input_hint`:
  *   docs(doc_id: string,
  *        spans: array<struct<kind:string, text:string,
  *                            media_ref:string, offset:int>>)
  *
  * Output invariant (the correctness contract): span-sequence equality on
  * (kind, text, media_ref, order) versus the golden fixtures — the Spark
  * re-expression of the reference's per-document extraction semantics
  * (reference: core/processors/document_processor.py:16-24
  * `ProcessingResult`).
  */

/** One input span of an interleaved document.
  *
  * kind ∈ {"html", "pdf", "image"}; `mediaRef` is non-null only for
  * kind == "image"; `offset` is the 0-based position within the doc.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One input document: interleaved text + media spans. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** One extracted output span. `order` is the 0-based final reading order
  * among the document's surviving (non-empty after extraction) spans.
  */
final case class OutSpan(kind: String, text: String, media_ref: String, order: Int)

/** Extraction result for one document — the engine's output row.
  * Mirrors the reference's ProcessingResult
  * (core/processors/document_processor.py:16-24): text+spans payload,
  * pages_processed analog (`spans_in`), success flag and error message.
  */
final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[OutSpan],
    spans_in: Int,
    success: Boolean,
    error: String)

/** Flattened per-span row used between explode and reassembly. */
final case class SpanRow(doc_id: String, kind: String, text: String,
    media_ref: String, offset: Int)

/** Extracted (but not yet reassembled) span. `text` is the extracted main
  * content ("" when the span is boilerplate-only / empty and must be
  * dropped at reassembly, reference document_processor.py:236-239).
  */
final case class ExtractedSpan(doc_id: String, kind: String, text: String,
    media_ref: String, offset: Int)

/** Output format, mirroring the reference's FormatType (api/models.py:10-14).
  * `markdown` turns on title decoration (`# ` prefix, reference
  * document_processor.py:192-196); `plain` is the default.
  */
sealed trait OutFormat
object OutFormat {
  case object Plain extends OutFormat
  case object Markdown extends OutFormat
  def parse(s: String): OutFormat = s match {
    case "markdown" => Markdown
    case _          => Plain
  }
}

/** Pipeline configuration.
  *
  * @param format        plain | markdown (title decoration)
  * @param partitions    target shuffle parallelism (0 = leave to session)
  * @param chunkSpans    salt granularity: spans of one mega-doc are spread
  *                      over ceil(nSpans / chunkSpans) partitions during
  *                      the extract stage, defusing mega-document skew
  *                      (north_rule "salted repartitioning on doc_id hash")
  * @param saltThreshold docs with <= this many spans take the fused
  *                      zero-shuffle path (extract + reassemble inside one
  *                      mapPartitions over Dataset[Doc]); larger docs take
  *                      the salted explode/shuffle path. The threshold
  *                      bounds per-task memory for the fused path.
  */
final case class ExtractConfig(
    format: OutFormat = OutFormat.Plain,
    partitions: Int = 0,
    chunkSpans: Int = 1024,
    saltThreshold: Int = 512)

/** Per-partition lineage + metrics row for the audit table
  * (FIXTURES.md §3; analog of the reference's run-metadata blocks,
  * use_api/batch_processor.py:147-158).
  */
final case class AuditRow(
    snapshot_id: Long,
    partition_id: Int,
    doc_id_min: String,
    doc_id_max: String,
    docs: Long,
    spans_html: Long,
    spans_pdf: Long,
    spans_image: Long,
    bytes_in: Long,
    bytes_out: Long,
    wall_ms: Long,
    status: String)
