package graft.extract

import graft.PropHelper
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** XY-cut reading-order reconstruction (reference order semantics:
  * core/models/layout_engine.py:195-206 — `(y1 // 50, x1)` buckets).
  */
class PdfExtractorSpec extends AnyFunSuite with PropHelper {

  test("single column reduces to reference (y//50, x) order") {
    // dense line coverage (real glyph boxes abut): explicit widths
    val in = "world@300,0;hello@0,0,280,40;again@0,60,180,40;line@200,60"
    assert(PdfExtractor.extract(in) == "hello world\nagain line")
  }

  test("two columns split on the vertical whitespace valley") {
    // left column covers x [0,230], right column from 500 — the only
    // gap >= MinGapX is the inter-column seam
    val in = List(
      "L1a@0,0,110,40", "L1b@120,0,110,40",
      "L2a@0,60,110,40", "L2b@120,60,110,40",
      "R1a@500,0,110,40", "R1b@620,0,110,40", "R2a@500,60,110,40")
      .mkString(";")
    assert(PdfExtractor.extract(in) ==
      "L1a L1b\nL2a L2b\n\nR1a R1b\nR2a")
  }

  test("header + two columns + footer reading order") {
    // header spans the inter-column seam; footer likewise
    val header = (0 until 9).map(i => s"h$i@${i * 60},0,55,40").mkString(";")
    val cols = List("A@0,120", "B@0,180", "C@500,120", "D@500,180").mkString(";")
    val footer = (0 until 9).map(i => s"f$i@${i * 60},320,55,40").mkString(";")
    val expected =
      (0 until 9).map("h" + _).mkString(" ") + "\n\n" +
        "A\nB\n\nC\nD\n\n" +
        (0 until 9).map("f" + _).mkString(" ")
    assert(PdfExtractor.extract(s"$header;$cols;$footer") == expected)
  }

  test("ties (same y-bucket, same x) break by input index — stable") {
    val in = "first@100,10;second@100,20" // same bucket 0, same x
    assert(PdfExtractor.extract(in) == "first second")
    val rev = "second@100,20;first@100,10"
    assert(PdfExtractor.extract(rev) == "second first")
  }

  test("escaped token characters round-trip") {
    val tok = PdfExtractor.escapeTok("a@b;c,d%e f")
    assert(PdfExtractor.extract(s"$tok@0,0") == "a@b;c,d%e f")
  }

  test("malformed entries are skipped, never throw") {
    assert(PdfExtractor.extract("ok@0,0;broken@x,y;@5,5;noat;") == "ok")
    assert(PdfExtractor.extract("") == "")
    assert(PdfExtractor.extract(null) == "")
    assert(PdfExtractor.extract("garbage with no positions") == "")
  }

  test("invalid %-escapes pass through literally, never throw") {
    assert(PdfExtractor.extract("a%G1@0,0") == "a%G1")
    assert(PdfExtractor.extract("a%4@0,0") == "a%4") // truncated escape
    assert(PdfExtractor.extract("%%41@0,0") == "%A") // literal % then %41
    assert(PdfExtractor.extract("tail%@0,0") == "tail%")
  }

  test("permutation invariance when keys are unique (property)") {
    // tokens on a grid: unique (y-bucket, x) keys
    val gTokens = for {
      n <- Gen.choose(1, 20)
      pts <- Gen.pick(n, for {
        xi <- 0 until 8; yi <- 0 until 6
      } yield (xi * 110, yi * 60))
    } yield pts.zipWithIndex.map { case ((x, y), i) => (s"t$i", x, y) }
    val g = for {
      toks <- gTokens
      shuffled <- Gen.const(
        new scala.util.Random(7).shuffle(toks.toList))
    } yield (toks.toList, shuffled)
    forAllProp(g, minSuccessful = 60) { case (orig, shuffled) =>
      def enc(ts: List[(String, Int, Int)]) =
        ts.map { case (t, x, y) => s"$t@$x,$y" }.mkString(";")
      PdfExtractor.extract(enc(orig)) == PdfExtractor.extract(enc(shuffled))
    }
  }
}
