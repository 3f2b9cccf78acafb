package graft

import graft.extract.Extractor
import graft.model._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator
import scala.collection.mutable.ArrayBuffer

/** The distributed extraction pipeline (SURVEY.md §3.4):
  *
  *   docs table
  *     → explode(spans)                       [flatten, keeps pushdown]
  *     → salted repartition                   [shuffle #1 — skew defense]
  *     → typed mapPartitions extract          [per-kind routing, pure]
  *     → repartition(doc_id)
  *       + sortWithinPartitions(doc_id, offset)  [shuffle #2]
  *     → streaming group-merge (mapPartitions)   [reassembly]
  *     → Dataset[ExtractedDoc]
  *
  * Scale posture: the only two shuffles are the salt and the reassembly.
  * The salt key is hash(doc_id, offset / chunkSpans) — a mega-document's
  * spans are spread over ceil(n/chunk) partitions during the (CPU-heavy)
  * extract stage, so one 10^6-span document cannot stall a single task
  * (north_rule: "salted repartitioning on doc_id hash to defuse skew from
  * mega-documents"). Reassembly necessarily co-locates one doc's spans
  * (the output row is the per-doc span array) but by then the heavy
  * string work is done; the secondary sort (sortWithinPartitions on
  * (doc_id, offset)) lets the group-merge stream without holding an
  * unsorted buffer (north_star's sortWithinPartitions + groupByKey shape,
  * implemented as the equivalent sort-based streaming merge).
  *
  * Extractor state is amortized per partition via mapPartitions
  * (north_star; reference analog: lazy model loading
  * core/models/ocr_engine.py:32-71).
  */
object Pipeline {

  /** Internal flattened row after explode (null kind = empty doc). */
  private[graft] final case class InRow(doc_id: String, kind: String,
      text: String, media_ref: String, offset: Int, spans_in: Int)

  /** Internal extracted row carried into reassembly. */
  private[graft] final case class ExRow(doc_id: String, kind: String,
      text: String, media_ref: String, offset: Int, spans_in: Int,
      in_len: Int, err: String)

  /** Flatten docs into one row per span. Empty docs survive as a single
    * null-kind row (explode_outer) so they still yield an output row.
    */
  private def flatten(docs: Dataset[Doc]): Dataset[InRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", size($"spans").as("spans_in"),
        explode_outer($"spans").as("s"))
      .select($"doc_id", $"s.kind".as("kind"), $"s.text".as("text"),
        $"s.media_ref".as("media_ref"),
        coalesce($"s.offset", lit(-1)).as("offset"),
        greatest($"spans_in", lit(0)).as("spans_in"))
      .as[InRow]
  }

  private def extractRow(r: InRow, fmt: OutFormat): ExRow = {
    if (r.kind == null) // empty doc marker
      return ExRow(r.doc_id, null, "", null, -1, r.spans_in, 0, null)
    val inLen = if (r.text == null) 0 else r.text.length
    try {
      val e = Extractor.extractSpan(
        SpanRow(r.doc_id, r.kind, r.text, r.media_ref, r.offset), fmt)
      ExRow(r.doc_id, e.kind, e.text, e.media_ref, e.offset, r.spans_in,
        inLen, null)
    } catch {
      case t: Throwable => // never poison the partition: fail the doc soft
        ExRow(r.doc_id, r.kind, "", null, r.offset, r.spans_in, inLen,
          s"${t.getClass.getSimpleName}: ${t.getMessage}")
    }
  }

  /** Reassemble sorted (doc_id, offset) rows into per-doc output rows,
    * streaming one group at a time. Optionally records one audit row per
    * partition into `audit` (lineage + metrics, FIXTURES.md §3).
    */
  private def reassemble(it: Iterator[ExRow], snapshotId: Long,
      audit: CollectionAccumulator[AuditRow]): Iterator[ExtractedDoc] = {
    val t0 = System.nanoTime()
    var docs = 0L
    var nHtml = 0L; var nPdf = 0L; var nImage = 0L
    var bytesIn = 0L; var bytesOut = 0L
    var docMin: String = null; var docMax: String = null
    val buf = it.buffered

    val out = new Iterator[ExtractedDoc] {
      override def hasNext: Boolean = buf.hasNext
      override def next(): ExtractedDoc = {
        val docId = buf.head.doc_id
        val outs = new ArrayBuffer[OutSpan]()
        var spansIn = 0
        var err: String = null
        while (buf.hasNext && buf.head.doc_id == docId) {
          val r = buf.next()
          spansIn = r.spans_in
          bytesIn += r.in_len
          r.kind match {
            case "html"  => nHtml += 1
            case "pdf"   => nPdf += 1
            case "image" => nImage += 1
            case _       => ()
          }
          if (r.err != null && err == null) err = r.err
          if (r.text != null && r.text.nonEmpty) {
            outs += OutSpan(r.kind, r.text, r.media_ref, outs.length)
            bytesOut += r.text.length
          }
        }
        docs += 1
        if (docMin == null || docId < docMin) docMin = docId
        if (docMax == null || docId > docMax) docMax = docId
        ExtractedDoc(docId, outs.toSeq, spansIn, err == null, err)
      }
    }

    // Wrap so the audit row is emitted exactly once, after the last group.
    new Iterator[ExtractedDoc] {
      private var finalized = false
      override def hasNext: Boolean = {
        val h = out.hasNext
        if (!h && !finalized) {
          finalized = true
          if (audit != null) {
            val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(-1)
            audit.add(AuditRow(snapshotId, pid, docMin, docMax, docs,
              nHtml, nPdf, nImage, bytesIn, bytesOut,
              (System.nanoTime() - t0) / 1000000L, "committed"))
          }
        }
        h
      }
      override def next(): ExtractedDoc = out.next()
    }
  }

  /** Full pipeline. When `audit` is non-null, one AuditRow per reassembly
    * partition is accumulated as a side output (driver-side table write —
    * P rows, tiny) once an action runs.
    */
  def extract(docs: Dataset[Doc], cfg: ExtractConfig = ExtractConfig(),
      snapshotId: Long = 0L,
      audit: CollectionAccumulator[AuditRow] = null): Dataset[ExtractedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parts =
      if (cfg.partitions > 0) cfg.partitions
      else spark.sessionState.conf.numShufflePartitions
    val fmt = cfg.format

    val flat = flatten(docs)
    // shuffle #1: salted — spreads a mega-doc's spans across partitions
    val salted = flat.repartition(parts,
      hash($"doc_id", floor($"offset" / lit(cfg.chunkSpans))))
    val extracted = salted
      .as[InRow]
      .mapPartitions(it => it.map(extractRow(_, fmt)))
    // shuffle #2: co-locate + secondary-sort, then stream-merge per doc
    extracted
      .repartition(parts, $"doc_id")
      .sortWithinPartitions($"doc_id", $"offset")
      .as[ExRow]
      .mapPartitions(it => reassemble(it, snapshotId, audit))
  }

  /** Register an audit accumulator on the session. */
  def auditAccumulator(spark: SparkSession): CollectionAccumulator[AuditRow] = {
    val acc = new CollectionAccumulator[AuditRow]
    spark.sparkContext.register(acc, "graft.audit")
    acc
  }

  /** Collapse possibly-duplicated accumulator entries (task retries) to
    * one row per partition id — last writer wins.
    */
  def auditRows(acc: CollectionAccumulator[AuditRow]): Seq[AuditRow] = {
    import scala.jdk.CollectionConverters._
    acc.value.asScala.groupBy(_.partition_id).map(_._2.last).toSeq
      .sortBy(_.partition_id)
  }
}
