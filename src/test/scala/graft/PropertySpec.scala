package graft

import graft.data.CorpusGen
import graft.extract.{HtmlExtractor, Normalizer, PdfExtractor}
import graft.model._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial properties (SURVEY.md §7.5 risk register):
  * extractors must be total (never throw) on arbitrary input, the
  * generator must be deterministic, and document-level output must be
  * invariant under span-array permutation.
  */
class PropertySpec extends AnyFunSuite with PropHelper {

  // --- extractor totality on adversarial input --------------------------

  private val tagSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.const("<"), Gen.const(">"), Gen.const("</"), Gen.const("<!--"),
      Gen.const("-->"), Gen.const("<script>"), Gen.const("</script>"),
      Gen.const("<a href=\"x\">"), Gen.const("</a>"), Gen.const("<p"),
      Gen.const("=\"unclosed"), Gen.const("&amp;"), Gen.const("&#xZZ;"),
      Gen.alphaNumStr, Gen.const("<nav>"), Gen.const("</nav>"),
      Gen.const("<h1>"), Gen.const("\n"), Gen.const("<div a='b>c'>"))
    Gen.listOf(frag).map(_.mkString(" "))
  }

  test("html extractor is total on arbitrary tag soup") {
    forAllProp(tagSoup, minSuccessful = 200) { s =>
      HtmlExtractor.extract(s, markdown = false)
      HtmlExtractor.extract(s, markdown = true)
      true
    }
  }

  private val pdfSoup: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.const("@"), Gen.const(";"), Gen.const(","), Gen.const("tok@1,2"),
      Gen.const("x@"), Gen.const("@1,2"), Gen.const("a@b,c"),
      Gen.const("t@999999999999,2"), Gen.const("%41@0,0"),
      Gen.const("%@0,0"), Gen.alphaNumStr)
    Gen.listOf(frag).map(_.mkString(";"))
  }

  test("pdf extractor is total on arbitrary grammar soup") {
    forAllProp(pdfSoup, minSuccessful = 200) { s =>
      PdfExtractor.extract(s); true
    }
  }

  test("pdf: output tokens are exactly the parsed input tokens") {
    val gTok = for {
      n <- Gen.choose(1, 30)
      toks <- Gen.listOfN(n, for {
        t <- Gen.identifier.suchThat(_.nonEmpty)
        x <- Gen.choose(0, 1000); y <- Gen.choose(0, 1000)
      } yield (t, x, y))
    } yield toks
    forAllProp(gTok, minSuccessful = 100) { toks =>
      val in = toks.map { case (t, x, y) => s"$t@$x,$y" }.mkString(";")
      val out = PdfExtractor.extract(in)
        .split("[\n ]").filter(_.nonEmpty).sorted.toSeq
      out == toks.map(_._1).sorted.toSeq
    }
  }

  // --- generator determinism + self-consistency -------------------------

  test("generator is a pure function of (seed, index)") {
    forAllProp(Gen.choose(0L, 100000L), minSuccessful = 100) { i =>
      val a = CorpusGen.genDoc(CorpusGen.DefaultSeed, i)
      val b = CorpusGen.genDoc(CorpusGen.DefaultSeed, i)
      a == b
    }
  }

  test("generated noisy image spans repair exactly to the expectation") {
    forAllProp(Gen.choose(0L, 50000L), minSuccessful = 200) { i =>
      val g = CorpusGen.genDoc(CorpusGen.DefaultSeed, i)
      g.input.spans.filter(s => s.kind == "image" && s.media_ref != null)
        .forall { sp =>
          val expected = g.expected.spans.find(_.media_ref == sp.media_ref)
          val got = Normalizer.normalize(sp.text)
          expected.map(_.text).getOrElse("") == got
        }
    }
  }

  // --- pipeline permutation invariance ----------------------------------

  test("doc output is invariant under span-array permutation") {
    lazy val spark = TestSpark.spark
    import spark.implicits._
    val goldens = CorpusGen.goldens(60)
    val rng = new scala.util.Random(9)
    val shuffled = goldens.map(g =>
      g.input.copy(spans = rng.shuffle(g.input.spans)))
    val out = Pipeline.extract(shuffled.toDS(), ExtractConfig(partitions = 4))
      .collect().map(d => d.doc_id -> d.spans).toMap
    goldens.foreach { g =>
      assert(out(g.expected.doc_id) == g.expected.spans,
        s"mismatch for ${g.expected.doc_id}")
    }
  }
}
