package graft.extract

import graft.PropHelper
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** OCR-text normalizer semantics (reference noisy_ocr family,
  * test_ai_models/dataset.json doc id 5).
  */
class NormalizerSpec extends AnyFunSuite with PropHelper {

  test("reference noisy_ocr fixture strings repair exactly") {
    assert(Normalizer.normalize("ENVIR0NMENTAL C3RTIFICAT3") ==
      "ENVIRONMENTAL CERTIFICATE")
    assert(Normalizer.normalize("Tot4l Lif3cycle C4rb0n: 247.8 kg C02") ==
      "Total Lifecycle Carbon: 247.8 kg CO2")
  }

  test("pure numbers are never repaired") {
    assert(Normalizer.normalize("247.8") == "247.8")
    assert(Normalizer.normalize("1,234.56 007") == "1,234.56 007")
    assert(Normalizer.normalize("-3.0 +41") == "-3.0 +41")
  }

  test("case of replacement follows token letter majority") {
    assert(Normalizer.normalize("C3RT") == "CERT")
    assert(Normalizer.normalize("c3rt") == "cert")
    assert(Normalizer.normalize("Tot4l") == "Total")
  }

  test("punctuation shell is preserved") {
    assert(Normalizer.normalize("(C4rb0n):") == "(Carbon):")
  }

  test("unicode bullets and checkmarks pass through") {
    assert(Normalizer.normalize("• C0mpliant ✓") == "• Compliant ✓")
    assert(Normalizer.normalize("naïve café") == "naïve café")
  }

  test("whitespace canonicalization: trim, collapse, paragraph joins") {
    assert(Normalizer.normalize("  a   b  \n\n\n c \n d ") == "a b\n\nc\nd")
    assert(Normalizer.normalize("   \n \t \n ") == "")
    assert(Normalizer.normalize("") == "")
    assert(Normalizer.normalize(null) == "")
  }

  test("idempotence on fixture-like strings (property)") {
    val g = Gen.listOf(Gen.oneOf(
      "Tot4l", "247.8", "kg", "C02", "ENVIR0NMENTAL", "•", "✓", " ",
      "\n", "\n\n", "x1", "A4", "(7h3)", "naïve")).map(_.mkString(" "))
    forAllProp(g) { s =>
      val once = Normalizer.normalize(s)
      Normalizer.normalize(once) == once
    }
  }

  test("idempotence on arbitrary unicode strings (property)") {
    forAllProp(Gen.asciiPrintableStr.flatMap(a =>
      Gen.listOf(Gen.oneOf(Gen.const(a), Gen.const("\n"),
        Gen.oneOf("é", "中", "  ", "\t", "0O1l3E4A7T"))).map(_.mkString))) { s =>
      val once = Normalizer.normalize(s)
      Normalizer.normalize(once) == once
    }
  }
}
