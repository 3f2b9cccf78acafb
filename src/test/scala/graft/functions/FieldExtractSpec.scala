package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X7 tolerant comparator — every branch of the reference's
  * calculate_field_score / _values_match
  * (test_ai_models/model_evaluator.py:315-366) replayed on literal
  * columns, expected values computed from the reference's Python
  * semantics by hand.
  */
class FieldExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eval(c: Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  private def str(s: String): Column = lit(s).cast("string")
  private val nullStr = lit(null).cast("string")

  test("_values_match: numeric tolerance, case/trim strings, nulls") {
    assert(eval(FieldExtract.valuesMatch(str("247.8"), str("247.805"))) == true)
    assert(eval(FieldExtract.valuesMatch(str("247.8"), str("247.82"))) == false)
    assert(eval(FieldExtract.valuesMatch(str(" Acme "), str("acme"))) == true)
    assert(eval(FieldExtract.valuesMatch(str("Acme"), str("Acme Inc"))) == false)
    // exact branch fires before numeric: identical strings always match
    assert(eval(FieldExtract.valuesMatch(str("n/a"), str("n/a"))) == true)
    // both-null = Python None == None
    assert(eval(FieldExtract.valuesMatch(nullStr, nullStr)) == true)
    assert(eval(FieldExtract.valuesMatch(nullStr, str("x"))) == false)
    assert(eval(FieldExtract.valuesMatch(str("x"), nullStr)) == false)
    // int-vs-float string forms match numerically
    assert(eval(FieldExtract.valuesMatch(str("2005"), str("2005.000"))) == true)
    // Python strip() analog: tabs/newlines trimmed, not just spaces
    assert(eval(FieldExtract.valuesMatch(str("\tacme\n"), str("ACME"))) == true)
    assert(eval(FieldExtract.valuesMatch(str("\t 42 \n"), str("42.004"))) == true)
  }

  test("scalar score: null precedence mirrors the reference order") {
    // extracted None -> 0.0 (even when expected is also None)
    assert(eval(FieldExtract.tolerantScore(nullStr, nullStr)) == 0.0)
    assert(eval(FieldExtract.tolerantScore(nullStr, str("v"))) == 0.0)
    // expected None with extracted present -> 1.0
    assert(eval(FieldExtract.tolerantScore(str("v"), nullStr)) == 1.0)
    assert(eval(FieldExtract.tolerantScore(str("1.0"), str("1"))) == 1.0)
    assert(eval(FieldExtract.tolerantScore(str("a"), str("b"))) == 0.0)
  }

  test("dict score: per-expected-key match ratio, extras ignored") {
    def m(kv: (String, String)*): Column =
      map(kv.flatMap { case (k, v) =>
        Seq(lit(k), Option(v).map(lit(_)).getOrElse(nullStr)) }: _*)
    val exp = m("a" -> "1", "b" -> "x", "c" -> "7")
    // a matches numerically, b matches case-insensitively, c missing
    val ext = m("a" -> "1.004", "b" -> " X ", "extra" -> "zzz")
    assert(eval(FieldExtract.tolerantScoreMap(ext, exp)) == 2.0 / 3.0)
    // expected key with null value matches a missing/null extracted key
    // (dict.get -> None, None == None)
    val expN = m("a" -> null, "b" -> "2")
    val extN = m("b" -> "2")
    assert(eval(FieldExtract.tolerantScoreMap(extN, expN)) == 1.0)
    // empty expected dict -> 0.0 (reference total_keys > 0 guard)
    assert(eval(FieldExtract.tolerantScoreMap(ext, m())) == 0.0)
    // null precedence like the scalar branch
    val nullMap = lit(null).cast("map<string,string>")
    assert(eval(FieldExtract.tolerantScoreMap(nullMap, exp)) == 0.0)
    assert(eval(FieldExtract.tolerantScoreMap(ext, nullMap)) == 1.0)
  }

  test("list score: set equality — order/multiplicity free, exact values") {
    def a(xs: String*): Column = array(xs.map(lit(_)): _*)
    assert(eval(FieldExtract.tolerantScoreList(
      a("b", "a", "a"), a("a", "b"))) == 1.0)
    assert(eval(FieldExtract.tolerantScoreList(
      a("a", "b"), a("a", "b", "c"))) == 0.0)
    assert(eval(FieldExtract.tolerantScoreList(
      a("a", "b", "c"), a("a", "b"))) == 0.0)
    // set equality is EXACT, not tolerant: "1.0" != "1" as set members
    assert(eval(FieldExtract.tolerantScoreList(a("1.0"), a("1"))) == 0.0)
    val nullArr = lit(null).cast("array<string>")
    assert(eval(FieldExtract.tolerantScoreList(nullArr, a("a"))) == 0.0)
    assert(eval(FieldExtract.tolerantScoreList(a("a"), nullArr)) == 1.0)
  }
}
