package graft

import graft.operators.Media
import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query executes; entry() smoke; media stub checks. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() == 200L)
  }

  test("every oracleSql key has a queries entry") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- qs
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      // pair queries may legitimately return 0 rows at the smallest
      // scale: d2 by threshold, s3 because sf0.001 has no pair at
      // cos >= 0.5 (the threshold sits above the random background by
      // design — see SimilaritySpec's s3 precondition)
      if (!Set("d2_ngram_jaccard", "s3_cosine_neardups").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("x2 two-level combine equals a global concat when a whole block is null") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // block 4096..8191 of lang "en" holds ONLY null text: a two-level
    // combine that blocks before dropping nulls would collect an empty
    // array there and splice an extra "\n\n" into the middle
    val tmp = java.nio.file.Files.createTempDirectory("x2null").toString
    Seq((10L, "en", "Alpha Text"), (4100L, "en", null),
        (4200L, "en", null), (9000L, "en", "Beta Text"),
        (20L, "fr", "Gamma"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("x2_combine_by_lang")(spark, tmp)
      .as[(String, String)].collect().toMap
    // single-level oracle: one global sorted collect_list (skips nulls)
    val want = spark.read.parquet(s"$tmp/documents.parquet")
      .select($"lang", $"doc_id",
        graft.functions.TextFunctions.normText($"text").as("nt"))
      .groupBy($"lang")
      .agg(array_join(
        transform(array_sort(collect_list(struct($"doc_id", $"nt"))),
          x => x.getField("nt")), "\n\n").as("combined"))
      .as[(String, String)].collect().toMap
    assert(got == want)
    assert(!got("en").contains("\n\n\n"), s"extra separator: ${got("en")}")
  }

  test("f2: per-lang quantiles match the closed-form interpolation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("f2cal").toString
    // lang aa: n_chars {10,20,30,40} -> p50 = 25 (rank 1.5), p90 = 37
    // (rank 2.7), p99 = 39.7 (rank 2.97); token counts {1,2,3,4} via
    // alnum runs -> tok_p50 = 2.5, tok_p90 = 3.7. lang bb: single row,
    // every quantile IS the value.
    Seq(
      (1L, "w", "aa", 10L), (2L, "w x", "aa", 20L),
      (3L, "w x y", "aa", 30L), (4L, "w x y z", "aa", 40L),
      (5L, "only doc", "bb", 7L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("f2_threshold_calibrate")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // 1e-9 tolerance: rank = p*(n-1) is inexact in binary (0.9*3 !=
    // 2.7); what the HASH gate needs is that Spark and DuckDB compute
    // the identical doubles, which the shared formula guarantees
    def close(a: Seq[Double], b: Seq[Double]) =
      a.size == b.size && a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    assert(got("aa")._1 == 4L &&
      close(got("aa")._2, Seq(25.0, 37.0, 39.7, 2.5, 3.7)),
      got("aa").toString)
    assert(got("bb")._1 == 1L &&
      close(got("bb")._2, Seq(7.0, 7.0, 7.0, 2.0, 2.0)), got("bb").toString)
  }

  test("media decode is deterministic and total") {
    val bytes = Media.pngBytes(20, 30, 2, "hello world".getBytes("UTF-8"))
    val m1 = Media.decode("x", bytes)
    val m2 = Media.decode("x", bytes)
    assert(m1 == m2)
    assert(m1.kind == "png" && m1.width == 20 && m1.n_bytes == bytes.length)
    val empty = Media.decode("e", Array.empty)
    assert(empty.n_bytes == 0L && empty.kind == "bin")
  }
}
