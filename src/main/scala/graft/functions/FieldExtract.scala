package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic structured-field extraction — the regex/path-based
  * re-expression of the reference's LLM field extraction over the fixed
  * sustainability schema (application/test_sustainability_reports.py:
  * 31-38: fabricant, annee, nom_produit, impact_carbone,
  * consommation_electrique, poids_produit), evaluated with the same
  * validity predicate and completeness metric
  * (test_sustainability_reports.py:123-138, F5/A1 in SURVEY.md §2).
  * All pure Catalyst expressions.
  */
object FieldExtract {

  /** Field name → extraction regex over the certificate-style text the
    * image extractor emits (generator family F-IMG).
    */
  val FieldPatterns: Seq[(String, String)] = Seq(
    "nom_produit" -> "Product:\\s*([^\\n]+)",
    "impact_carbone" -> "Total Lifecycle Carbon:\\s*([0-9][0-9.,]*)",
    "consommation_electrique" -> "Energy Consumption:\\s*([0-9][0-9.,]*)",
    "poids_produit" -> "Weight:\\s*([0-9][0-9.,]*)",
    "fabricant" -> "Certified by\\s*([^\\n]+)",
    "annee" -> "\\b(19[0-9]{2}|20[0-9]{2})\\b")

  /** One column per field, null when absent. */
  def fields(text: Column): Seq[(String, Column)] =
    FieldPatterns.map { case (name, pat) =>
      val v = regexp_extract(text, pat, 1)
      name -> when(length(trim(v)) > 0, trim(v)).otherwise(lit(null))
    }

  /** Field-validity predicate (reference F5,
    * test_sustainability_reports.py:131-137): extracted iff not null,
    * not the literal "null", non-blank.
    */
  def isValid(c: Column): Column =
    c.isNotNull && lower(trim(c)) =!= "null" && length(trim(c)) > 0

  /** Per-document completeness % (reference A1,
    * `_calculate_completeness`): valid fields / expected fields * 100.
    */
  def completeness(text: Column): Column = {
    val valids = fields(text).map { case (_, c) =>
      when(isValid(c), 1).otherwise(0)
    }
    round(valids.reduce(_ + _).cast("double") /
      lit(FieldPatterns.size) * 100, 2)
  }

  /** Tolerant value comparator (reference X7,
    * model_evaluator.py:338-366): exact numeric within |Δ| < 0.01, else
    * case-insensitive trimmed string equality.
    */
  def tolerantEquals(a: Column, b: Column): Column = {
    // try_cast: non-numeric strings become null (ANSI-safe), falling
    // through to the string branch
    val na = regexp_replace(a.cast("string"), ",", "").try_cast("double")
    val nb = regexp_replace(b.cast("string"), ",", "").try_cast("double")
    when(na.isNotNull && nb.isNotNull, abs(na - nb) < 0.01)
      .otherwise(lower(trim(a.cast("string"))) === lower(trim(b.cast("string"))))
  }
}
