package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's untimed adversarial-skew sideline must measure what it
  * claims: dense-hub candidate volumes that COLLAPSE when the re-split
  * is on, for both the cosine-LSH (s3) and SimHash (d4) defenses.
  */
class BenchSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("skew sideline: re-split cuts hub candidates for s3 and d4") {
    val m = Bench.skewSideline(spark).toMap
    val s3Off = m("skew_s3_candidates_nosplit")
    val s3On = m("skew_s3_candidates_resplit")
    val d4Off = m("skew_d4_candidates_nosplit")
    val d4On = m("skew_d4_candidates_resplit")
    // the sideline must not have hit its zeroed failure path
    assert(s3Off > 0 && d4Off > 0, s"sideline failed: $m")
    // the planted hubs make the uncapped joins quadratic-heavy
    assert(s3Off >= 1000000, s"s3 hub not dense enough: $s3Off")
    assert(d4Off >= 4000.0 * 3999 / 2, s"d4 hub not dense enough: $d4Off")
    // and the re-split delivers a real cut on both paths
    assert(s3On * 2 <= s3Off, s"s3 re-split cut too weak: $s3On vs $s3Off")
    assert(d4On * 8 <= d4Off, s"d4 re-split cut too weak: $d4On vs $d4Off")
    // d2 (PPJoin): the df-hub makes the naive shingle self-join
    // quadratic; the prefix filter must kill it wholesale, and the
    // positional filter must additionally cut the size-asymmetric
    // small-vs-big candidates the prefix filter passes
    val d2None = m("skew_d2_candidates_nofilter")
    val d2Prefix = m("skew_d2_candidates_prefix")
    val d2Full = m("skew_d2_candidates_full")
    assert(d2None >= 1000000, s"d2 hub not dense enough: $d2None")
    assert(d2Prefix * 100 <= d2None,
      s"d2 prefix cut too weak: $d2Prefix vs $d2None")
    assert(d2Full <= 0.8 * d2Prefix,
      s"d2 positional cut too weak: $d2Full vs $d2Prefix")
  }
}
