package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class OcrNormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ocr_normalize registered and usable from SQL") {
    OcrNormalize.register(spark)
    import spark.implicits._
    Seq("Tot4l Lif3cycle C4rb0n: 247.8 kg C02", "  a   b ")
      .toDF("t").createOrReplaceTempView("ocr_in")
    val rows = spark.sql("SELECT ocr_normalize(t) AS n FROM ocr_in")
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("Total Lifecycle Carbon: 247.8 kg CO2", "a b"))
  }

  test("null-safe and codegen-compatible") {
    OcrNormalize.register(spark)
    val out = spark.sql(
      "SELECT ocr_normalize(CAST(NULL AS STRING)) AS n").collect()
    assert(out.head.isNullAt(0))
    // force both codegen and interpreted paths to agree
    val df = spark.sql("SELECT ocr_normalize('ENVIR0NMENTAL C3RTIFICAT3') AS n")
    assert(df.collect().head.getString(0) == "ENVIRONMENTAL CERTIFICATE")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan) // native expression, not a UDF
  }

  test("codegen actually compiles — no silent interpreter fallback") {
    // GenerateUnsafeProjection.generate THROWS on codegen compile errors
    // (no CodeGeneratorWithInterpretedFallback at this layer), so a
    // broken doGenCode — e.g. referencing the companion without
    // $.MODULE$, which Janino resolves against the case class and fails
    // — is caught here instead of degrading every query to interpreted
    // eval behind a WARN.
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val proj = GenerateUnsafeProjection.generate(
      Seq(OcrNormalize(BoundReference(0, StringType, nullable = true))))
    val row = new GenericInternalRow(
      Array[Any](UTF8String.fromString("C4rb0n:  247.8")))
    assert(proj(row).getUTF8String(0).toString == "Carbon: 247.8")
  }

  test("extensions class registers via withExtensions") {
    // a second session sharing the context, with extensions applied
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = s2.sql("SELECT ocr_normalize('C4rb0n') AS n")
        .collect().head.getString(0)
      assert(v == "Carbon")
    } finally {
      // do not stop: shares the JVM-wide context with TestSpark
    }
  }
}
