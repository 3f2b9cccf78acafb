package graft

import graft.functions.{FieldExtract, TextFunctions}
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class RendererFieldSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val doc = ExtractedDoc("d1", Seq(
    OutSpan("html", "Title\n\nBody & more", null, 0),
    OutSpan("image", "OCR text", "media://d1/1", 1)),
    2, success = true, null)

  test("markdown render: ordered spans, image link") {
    val md = Renderer.toMarkdown(doc)
    assert(md.startsWith("# d1\n\n"))
    assert(md.contains("Title\n\nBody & more"))
    assert(md.contains("![image](media://d1/1)"))
  }

  test("html render: escaping, order attributes, media refs") {
    val html = Renderer.toHtml(doc)
    assert(html.contains("Body &amp; more"))
    assert(html.contains("data-order=\"0\""))
    assert(html.contains("""<div class="media-ref">media://d1/1</div>"""))
    assert(!html.contains("Body & more"))
  }

  test("plain text join mirrors page combine (\\n\\n)") {
    assert(Renderer.toPlainText(doc) == "Title\n\nBody & more\n\nOCR text")
  }

  test("smart truncate: cut at newline past 80% else hard cut (O6)") {
    val t = "aaaa\nbbbb\ncccc\ndddd"
    assert(TextFunctions.smartTruncate(t, 100) == t)
    // maxChars 16: hard cut at 16, last \n in prefix at 14 >= 12.8 -> 14
    assert(TextFunctions.smartTruncate(t, 16) == "aaaa\nbbbb\ncccc")
    // maxChars 8: last \n at 4 < 6.4 -> hard cut
    assert(TextFunctions.smartTruncate(t, 8) == "aaaa\nbbb")
    assert(TextFunctions.smartTruncate(null, 5) == null)
  }

  test("field extraction over certificate text (F-EXTRACT)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val txt =
      "ENVIRONMENTAL CERTIFICATE\nProduct: Carbon Module\n" +
        "Total Lifecycle Carbon: 247.8 kg CO2\nEnergy Consumption: 55.1 kWh\n" +
        "Weight: 12.5 kg\n• Certified by Verified 2023"
    val df = Seq(("d1", txt), ("d2", "no fields here")).toDF("doc_id", "text")
    val cols = FieldExtract.fields(col("text")).map { case (n, c) => c.as(n) }
    val out = df.select(Seq(col("doc_id")) ++ cols :+
        FieldExtract.completeness(col("text")).as("comp"): _*)
      .collect().map(r => r.getString(0) -> r).toMap
    val d1 = out("d1")
    assert(d1.getAs[String]("nom_produit") == "Carbon Module")
    assert(d1.getAs[String]("impact_carbone") == "247.8")
    assert(d1.getAs[String]("consommation_electrique") == "55.1")
    assert(d1.getAs[String]("poids_produit") == "12.5")
    assert(d1.getAs[String]("fabricant") == "Verified 2023")
    assert(d1.getAs[String]("annee") == "2023")
    assert(d1.getAs[Double]("comp") == 100.0)
    val d2 = out("d2")
    assert(d2.getAs[String]("nom_produit") == null)
    assert(d2.getAs[Double]("comp") == 0.0)
  }

  test("tolerant comparator: numeric tolerance + case-insensitive (X7)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(("247.8", "247.805"), ("ABC ", "abc"), ("247.8", "247.9"))
      .toDF("a", "b")
    val res = df.select(FieldExtract.tolerantEquals(col("a"), col("b")).as("m"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(res == Seq(true, true, false))
  }
}
