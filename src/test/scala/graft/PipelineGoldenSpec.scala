package graft

import graft.data.CorpusGen
import graft.model._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden test: generated corpus → pipeline → span-sequence
  * equality (kind, text, media_ref, order) against the constructive
  * expectations, via the J2 full-outer join (SURVEY.md §2.3) — the Spark
  * re-expression of the reference's expected-vs-extracted comparison
  * (test_ai_models/model_evaluator.py:399-423), tightened to strict
  * equality per the north rule.
  */
class PipelineGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Zero-mismatch check via full-outer join on (doc_id, order). */
  private def assertSpanEquality(actual: org.apache.spark.sql.Dataset[ExtractedDoc],
      expected: Seq[ExtractedDoc]): Unit = {
    import spark.implicits._
    val a = actual.select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.kind", $"s.text", $"s.media_ref", $"s.order")
    val e = expected.toDS().select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.kind", $"s.text", $"s.media_ref", $"s.order")
    val mism = a.as("a").join(e.as("e"),
        $"a.doc_id" === $"e.doc_id" && $"a.order" === $"e.order", "full_outer")
      .filter(
        $"a.doc_id".isNull || $"e.doc_id".isNull ||
          $"a.kind" =!= $"e.kind" ||
          $"a.text" =!= $"e.text" ||
          not($"a.media_ref" <=> $"e.media_ref"))
    val bad = mism.limit(5).collect()
    if (bad.nonEmpty) {
      fail(s"span-sequence mismatches (${mism.count()}):\n" +
        bad.map(_.toString).mkString("\n"))
    }
    // doc-level cardinality: every expected doc present exactly once
    val docCounts = actual.groupBy($"doc_id").count()
      .filter($"count" =!= 1).count()
    assert(docCounts == 0, "duplicate output docs")
    assert(actual.count() == expected.size.toLong)
  }

  test("golden equality, plain format, 400 docs") {
    import spark.implicits._
    val goldens = CorpusGen.goldens(400)
    val input = goldens.map(_.input).toDS()
    val out = Pipeline.extract(input, ExtractConfig(partitions = 8))
    assertSpanEquality(out, goldens.map(_.expected))
  }

  test("golden equality, small tier (3000 docs, both paths, low threshold)") {
    import spark.implicits._
    val cfg = CorpusGen.GenConfig(megaEvery = 500, megaSpans = 2000)
    val goldens = CorpusGen.goldens(3000, cfg = cfg)
    val input = goldens.map(_.input).toDS()
    // saltThreshold 2: docs with 3+ spans exercise the salted path too
    val out = Pipeline.extract(input,
      ExtractConfig(partitions = 8, saltThreshold = 2, chunkSpans = 128))
    assertSpanEquality(out, goldens.map(_.expected))
  }

  test("golden equality, markdown format") {
    import spark.implicits._
    val cfg = CorpusGen.GenConfig(markdown = true)
    val goldens = CorpusGen.goldens(150, cfg = cfg)
    val input = goldens.map(_.input).toDS()
    val out = Pipeline.extract(input,
      ExtractConfig(format = OutFormat.Markdown, partitions = 8))
    assertSpanEquality(out, goldens.map(_.expected))
  }

  test("mega-document (skew fixture) extracts correctly with chunked salt") {
    import spark.implicits._
    val cfg = CorpusGen.GenConfig(megaEvery = 10, megaSpans = 5000)
    val goldens = CorpusGen.goldens(30, cfg = cfg)
    val input = goldens.map(_.input).toDS()
    // small chunk => the mega doc must spread over many extract partitions
    val out = Pipeline.extract(input,
      ExtractConfig(partitions = 8, chunkSpans = 64))
    assertSpanEquality(out, goldens.map(_.expected))
  }

  test("salted repartition actually spreads a mega-doc across partitions") {
    // the correctness of the salted path is covered above; this pins
    // the SCALE property the north rule names ("salted repartitioning
    // ... to defuse skew from mega-documents"): applying the exact
    // expression Pipeline uses — repartition(parts, hash(doc_id,
    // floor(offset / chunkSpans))) — to one 5000-span doc must land
    // bounded work on every physical partition, not one hot task
    import spark.implicits._
    val chunk = 64
    val parts = 8
    val flat = Seq(
        Doc("mega-0", (0 until 5000).map(i => Span("html", "x", null, i))))
      .toDS()
      .select($"doc_id", explode($"spans").as("s"))
      .select($"doc_id", $"s.offset".as("offset"))
      .as[(String, Int)]
    val loads = flat
      .repartition(parts, hash($"doc_id", floor($"offset" / chunk)))
      .mapPartitions(it => Iterator(it.length))
      .collect()
    val used = loads.count(_ > 0)
    val mean = 5000.0 / parts
    assert(used >= parts - 2, s"mega-doc landed on only $used of $parts partitions")
    assert(loads.max <= mean * 2,
      s"hot partition holds ${loads.max} of 5000 spans (mean $mean) — " +
        "the chunk salt is not spreading the skew")
  }

  test("success flags and empty docs survive") {
    import spark.implicits._
    val goldens = CorpusGen.goldens(200)
    val out = Pipeline.extract(goldens.map(_.input).toDS(),
      ExtractConfig(partitions = 8))
    val rows = out.collect()
    assert(rows.forall(_.success))
    val emptyIn = goldens.filter(_.input.spans.isEmpty).map(_.input.doc_id).toSet
    assert(emptyIn.subsetOf(rows.filter(_.spans.isEmpty).map(_.doc_id).toSet))
    assert(rows.filter(r => emptyIn.contains(r.doc_id)).forall(_.spans_in == 0))
  }

  test("audit accumulator: per-partition lineage rows cover all docs") {
    import spark.implicits._
    val goldens = CorpusGen.goldens(200)
    val acc = Pipeline.auditAccumulator(spark)
    val out = Pipeline.extract(goldens.map(_.input).toDS(),
      ExtractConfig(partitions = 8), snapshotId = 7L, audit = acc)
    val n = out.count()
    val rows = Pipeline.auditRows(acc)
    assert(rows.nonEmpty)
    assert(rows.map(_.docs).sum == n)
    assert(rows.forall(_.snapshot_id == 7L))
    assert(rows.forall(_.status == "committed"))
    val spansTotal = rows.map(r => r.spans_html + r.spans_pdf + r.spans_image).sum
    val expectedSpans = goldens.map(_.input.spans.size.toLong).sum
    assert(spansTotal == expectedSpans)
  }

  test("unknown kind fails soft, does not poison the doc") {
    import spark.implicits._
    val docs = Seq(
      Doc("d1", Seq(Span("html", "<p>Good text with words here.</p>", null, 0),
        Span("weird", "???", null, 1))),
      Doc("d2", Seq(Span("image", "ok", "media://d2/0", 0)))).toDS()
    val out = Pipeline.extract(docs, ExtractConfig(partitions = 4))
      .collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(out(0).spans.map(_.text) == Seq("Good text with words here."))
    assert(out(0).success) // unknown kind = empty extraction, not an error
    assert(out(1).spans.head.media_ref == "media://d2/0")
  }
}
