package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dotted-path utilities over nested structures — the reference's
  * `get_nested_value` / `set_nested_value` / `create_minimal_schema`
  * (test_ai_models/model_evaluator.py:228-271, X8 in SURVEY.md §2.7):
  * evaluation schemas address fields as "carbon_footprint.total.value".
  */
object DottedPath {

  /** Navigate a (possibly nested) column by dotted path:
    * get(col("data"), "a.b.c") == col("data").getField("a")... Missing
    * fields surface as null at runtime for map columns; for structs the
    * analyzer rejects unknown fields (schema is checked, like the
    * reference's KeyError-to-None behavior but typed).
    */
  def get(root: Column, path: String): Column = {
    val segs = path.split('.')
    require(segs.nonEmpty && segs.forall(_.nonEmpty),
      s"invalid dotted path: '$path'")
    segs.foldLeft(root)((c, f) => c.getField(f))
  }

  /** Build the minimal nested StructType containing exactly the given
    * dotted paths, leaves typed `leafType` (reference
    * `create_minimal_schema`: null-template with sentinel leaves —
    * here the sentinel is the type system).
    */
  def minimalSchema(paths: Seq[String],
      leafType: DataType = StringType): StructType = {
    // group by head segment; recurse on tails
    val grouped = paths.filter(_.nonEmpty).map(_.split('.').toList)
      .groupBy(_.head)
    StructType(grouped.toSeq.sortBy(_._1).map { case (head, ps) =>
      val tails = ps.collect { case _ :: rest if rest.nonEmpty => rest.mkString(".") }
      val isAlsoLeaf = ps.exists(_.lengthCompare(1) == 0)
      require(tails.isEmpty || !isAlsoLeaf,
        s"conflicting paths: '$head' is both a leaf and a struct prefix")
      if (tails.isEmpty) StructField(head, leafType)
      else StructField(head, minimalSchema(tails, leafType))
    })
  }

  /** Flatten a nested struct column into (path, value-as-string) pairs —
    * the explode-side of the reference's expected↔extracted field join
    * (J2-shaped evaluation, model_evaluator.py:399-423).
    */
  def flattenPaths(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => flattenPaths(s, p)
        case _             => Seq(p)
      }
    }

  /** All leaf paths of a struct column as an array<struct<path,value>>
    * column (values stringified) — ready for explode + equi-join on
    * (doc_id, path), the reference's evaluation join.
    */
  def pathValuePairs(root: Column, schema: StructType): Column = {
    val pairs = flattenPaths(schema).map { p =>
      struct(lit(p).as("path"), get(root, p).cast("string").as("value"))
    }
    array(pairs: _*)
  }
}
