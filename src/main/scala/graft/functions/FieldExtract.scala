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

  /** Numeric-leaning tolerant comparator used by the x3 financial
    * reconciliation query: strips thousands separators before the
    * numeric parse and null-propagates like ordinary SQL equality.
    * This is deliberately NOT the reference's `_values_match` — that
    * exact re-expression (no comma handling, null-safe exact branch,
    * never-null result) is [[valuesMatch]] below; pick by contract.
    */
  def tolerantEquals(a: Column, b: Column): Column = {
    // try_cast: non-numeric strings become null (ANSI-safe), falling
    // through to the string branch
    val na = regexp_replace(a.cast("string"), ",", "").try_cast("double")
    val nb = regexp_replace(b.cast("string"), ",", "").try_cast("double")
    when(na.isNotNull && nb.isNotNull, abs(na - nb) < 0.01)
      .otherwise(lower(trim(a.cast("string"))) === lower(trim(b.cast("string"))))
  }

  /** Python str.strip() analog: trims ALL leading/trailing whitespace
    * (tabs, newlines), not only spaces like Spark's trim().
    */
  private def wstrip(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** `_values_match` (model_evaluator.py:338-366) as a never-null
    * boolean Column: exact (null-safe) equality, else numeric parse of
    * both sides within |Δ| < 0.01, else case-insensitive
    * whitespace-stripped string equality.
    *
    * Re-expression boundary, on purpose: the reference gates its
    * numeric parse on `'.' in value` (so `int("1e3")` raises and falls
    * to the string branch, while `int("1_000")` parses); try_cast
    * accepts scientific notation and rejects underscore separators.
    * Both forms are absent from certificate-style extraction values —
    * matching CPython's literal grammar corner-for-corner is not the
    * contract.
    */
  def valuesMatch(a: Column, b: Column): Column = {
    val na = wstrip(a).try_cast("double")
    val nb = wstrip(b).try_cast("double")
    (a <=> b) ||
      (na.isNotNull && nb.isNotNull && abs(na - nb) < 0.01) ||
      coalesce(lower(wstrip(a)) === lower(wstrip(b)), lit(false))
  }

  /** Scalar branch of `calculate_field_score`
    * (model_evaluator.py:315-336): extracted null → 0; expected null
    * (with extracted present) → 1; else valuesMatch as 1.0/0.0.
    */
  def tolerantScore(ext: Column, exp: Column): Column =
    when(ext.isNull, lit(0.0))
      .when(exp.isNull, lit(1.0))
      .otherwise(when(valuesMatch(ext, exp), lit(1.0)).otherwise(lit(0.0)))

  /** Dict branch (model_evaluator.py:315-328) over MapType(string,
    * string): the score is the fraction of EXPECTED keys whose value
    * tolerantly matches the extracted map's value at that key (missing
    * key ≡ null value, exactly like dict.get); extra extracted keys are
    * ignored; an empty expected map scores 0, like the reference's
    * `total_keys > 0` guard.
    */
  def tolerantScoreMap(ext: Column, exp: Column): Column =
    when(ext.isNull, lit(0.0))
      .when(exp.isNull, lit(1.0))
      .when(size(map_keys(exp)) === 0, lit(0.0))
      .otherwise(
        size(filter(map_keys(exp), k =>
          valuesMatch(try_element_at(ext, k), try_element_at(exp, k))))
          .cast("double") / size(map_keys(exp)))

  /** List branch (model_evaluator.py:330-333) over ArrayType(string):
    * Python set equality — order- and multiplicity-insensitive exact
    * element equality — as a symmetric array_except emptiness check.
    */
  def tolerantScoreList(ext: Column, exp: Column): Column =
    when(ext.isNull, lit(0.0))
      .when(exp.isNull, lit(1.0))
      .otherwise(when(
        size(array_except(ext, exp)) === 0 &&
          size(array_except(exp, ext)) === 0, lit(1.0)).otherwise(lit(0.0)))
}
