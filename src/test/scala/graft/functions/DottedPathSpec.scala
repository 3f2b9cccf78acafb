package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DottedPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = DottedPath.minimalSchema(Seq(
    "carbon_footprint.total.value", "carbon_footprint.total.unit",
    "manufacturer", "product.name"))

  test("minimal schema contains exactly the requested paths") {
    assert(DottedPath.flattenPaths(schema).toSet == Set(
      "carbon_footprint.total.value", "carbon_footprint.total.unit",
      "manufacturer", "product.name"))
    val cf = schema("carbon_footprint").dataType.asInstanceOf[StructType]
    assert(cf.fieldNames.toSeq == Seq("total"))
  }

  test("dotted get navigates parsed JSON like the reference evaluator") {
    import spark.implicits._
    val json =
      """{"carbon_footprint":{"total":{"value":247.8,"unit":"kg"}},
         |"manufacturer":"Acme","product":{"name":"Module"}}""".stripMargin
    val df = Seq(("d1", json)).toDF("doc_id", "raw")
      .withColumn("data", from_json($"raw", schema))
    val row = df.select(
      DottedPath.get($"data", "carbon_footprint.total.value").as("v"),
      DottedPath.get($"data", "manufacturer").as("m")).head()
    assert(row.getString(0) == "247.8")
    assert(row.getString(1) == "Acme")
  }

  test("path/value explode supports the evaluation equi-join (J2 shape)") {
    import spark.implicits._
    val json = """{"carbon_footprint":{"total":{"value":"1","unit":"kg"}},"manufacturer":"A","product":{"name":"P"}}"""
    val actual = Seq(("d1", json)).toDF("doc_id", "raw")
      .withColumn("data", from_json($"raw", schema))
      .select($"doc_id",
        explode(DottedPath.pathValuePairs($"data", schema)).as("pv"))
      .select($"doc_id", $"pv.path", $"pv.value")
    val expected = Seq(
      ("d1", "carbon_footprint.total.value", "1"),
      ("d1", "carbon_footprint.total.unit", "kg"),
      ("d1", "manufacturer", "A"),
      ("d1", "product.name", "P")).toDF("doc_id", "path", "value")
    val joined = actual.as("a").join(expected.as("e"),
      Seq("doc_id", "path"), "full_outer")
    assert(joined.filter(not($"a.value" <=> $"e.value")).count() == 0)
    assert(joined.count() == 4)
  }

  test("missing JSON fields become null values, not errors") {
    import spark.implicits._
    val df = Seq(("d2", """{"manufacturer":"OnlyThis"}""")).toDF("doc_id", "raw")
      .withColumn("data", from_json($"raw", schema))
    val v = df.select(
      DottedPath.get($"data", "carbon_footprint.total.value")).head()
    assert(v.isNullAt(0))
  }
}
