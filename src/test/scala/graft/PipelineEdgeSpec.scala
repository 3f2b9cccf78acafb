package graft

import graft.model._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** External-schema tolerance: parquet/streaming inputs may declare
  * span offsets nullable; a null offset must soft-fail identically on
  * BOTH pipeline branches (sentinel -1, doc survives) instead of
  * killing the fused branch with the encoder's non-nullable-field
  * error.
  */
class PipelineEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def nullableDocs() = {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("spans", ArrayType(StructType(Seq(
        StructField("kind", StringType),
        StructField("text", StringType),
        StructField("media_ref", StringType),
        StructField("offset", IntegerType, nullable = true)))))))
    val rows = Seq(
      Row("d1", Seq(
        Row("image", "hello world", null, null), // null offset
        Row("image", "second span", null, 1))),
      Row("d2", Seq(Row("image", "fine doc", null, 0))))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  test("null span offset survives BOTH branches with sentinel -1") {
    import spark.implicits._
    val docs = nullableDocs().as[Doc]
    // fused branch (threshold high) and salted branch (threshold -1)
    val fused = Pipeline.extract(docs, ExtractConfig(partitions = 2,
      saltThreshold = Int.MaxValue)).collect()
    val salted = Pipeline.extract(docs, ExtractConfig(partitions = 2,
      saltThreshold = -1)).collect()
    for (out <- Seq(fused, salted)) {
      assert(out.length == 2, out.mkString("; "))
      val d1 = out.find(_.doc_id == "d1").get
      assert(d1.success && d1.spans.nonEmpty)
    }
    // identical results on both paths (null offset -> -1 sorts first)
    val f = fused.map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.order))).toMap
    val s = salted.map(d => d.doc_id -> d.spans.map(s => (s.kind, s.text, s.order))).toMap
    assert(f == s)
  }
}
