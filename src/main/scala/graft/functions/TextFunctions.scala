package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column builders for large-scale training-data pipelines.
  * All pure Catalyst expressions (codegen'd, no UDFs) so they stay inside
  * whole-stage codegen and push down/prune like built-ins.
  */
object TextFunctions {

  /** Whitespace-canonicalized lowercase text (dedup normalization). */
  def normText(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Document fingerprint = md5 of normalized text (exact-dup key). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Whitespace token array of normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Token count via a BPE-ish word/number regex (alnum runs). */
  def tokenCount(c: Column): Column = regexp_count(c, lit("[A-Za-z0-9]+"))

  /** Token-window chunks — the sequence-prep step every training-data
    * pipeline runs before packing: greedy fixed-stride windows of
    * `maxTok` whitespace tokens, consecutive chunks sharing
    * `maxTok - stride` tokens of overlap, the final window short.
    * Returns an array of (chunk_idx, n_tok, chunk) structs the caller
    * explodes; output per row is bounded by ceil(tokens/stride)
    * elements and the whole thing is generator-side Catalyst (split →
    * sequence → transform → slice) — codegen'd, no UDF, no shuffle,
    * embarrassingly parallel at any corpus size.
    */
  def tokenChunks(c: Column, maxTok: Int, stride: Int,
      withText: Boolean = true): Column = {
    require(maxTok >= 1 && stride >= 1 && stride <= maxTok,
      "need 1 <= stride <= maxTok")
    val toks = split(trim(c), "\\s+")
    val t = size(toks)
    val n = when(t <= maxTok, lit(1))
      .otherwise(ceil((t - maxTok).cast("double") / stride).cast("int")
        + lit(1))
    // consumers that only need the window grid (e.g. packing) skip the
    // chunk strings entirely: the field is built inside this lambda, so
    // generator pruning cannot remove it after the fact
    transform(sequence(lit(0), n - 1), i => {
      val idx = i.as("chunk_idx")
      val nt = least(lit(maxTok), t - i * stride).as("n_tok")
      if (withText)
        struct(idx, nt,
          array_join(slice(toks, i * stride + 1, lit(maxTok)), " ")
            .as("chunk"))
      else struct(idx, nt)
    })
  }

  /** Character-class counts (quality-scoring inputs). */
  def alphaChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Za-z]", ""))
  def digitChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[0-9]", ""))
  def punctChars(c: Column): Column =
    length(c) - length(regexp_replace(c, """[!-/:-@\[-`{-~]""", ""))
  def spaceChars(c: Column): Column =
    length(c) - length(regexp_replace(c, """\s""", ""))

  /** Deterministic quality score in [0,1]:
    * alpha_ratio * (1 - digit_ratio) * min(tokens/20, 1), rounded.
    * (length/punct/stopword-ratio family — reference-free heuristic.)
    */
  def qualityScore(c: Column): Column = {
    val len = length(c) + lit(1)
    val alphaRatio = alphaChars(c).cast("double") / len
    val digitRatio = digitChars(c).cast("double") / len
    val tokFactor = least(tokenCount(c).cast("double") / lit(20.0), lit(1.0))
    round(alphaRatio * (lit(1.0) - digitRatio) * tokFactor, 4)
  }

  /** Stopword-indicator score for one language: number of marker words
    * present (substring match on the padded, normalized text).
    */
  def langScore(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), normText(c), lit(" "))
    markers.map(m => when(padded.contains(s" $m "), 1).otherwise(0))
      .reduce(_ + _)
  }

  val EnMarkers = Seq("the", "a", "of", "and", "is")
  val DeMarkers = Seq("der", "die", "das", "und", "ist")
  val FrMarkers = Seq("le", "la", "et", "est", "les")
  val EsMarkers = Seq("el", "los", "y", "es", "una")

  /** N-gram heuristic language guess (deterministic argmax with fixed
    * preference order en > de > fr > es > unknown on ties).
    */
  def langGuess(c: Column): Column = {
    val en = langScore(c, EnMarkers)
    val de = langScore(c, DeMarkers)
    val fr = langScore(c, FrMarkers)
    val es = langScore(c, EsMarkers)
    when(en === 0 && de === 0 && fr === 0 && es === 0, lit("unknown"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Word n-gram shingle set (distinct), the unit of Jaccard similarity.
    * Pure HOFs: sequence + transform + slice + array_join.
    */
  def wordShingles(c: Column, n: Int): Column = {
    // Let-binding via a 1-element array + transform: interpreted HOFs
    // re-evaluate any non-attribute subexpression referenced inside a
    // lambda body ONCE PER ELEMENT — binding the token array to a lambda
    // variable makes the per-shingle slice O(n) instead of re-splitting
    // the whole text per shingle (measured ~100x on sf0.1 documents).
    // Guard: sequence(0, -1) would COUNT DOWN in Spark, not be empty.
    val bound = transform(array(tokens(c)), toks =>
      when(size(toks) >= n,
        array_distinct(
          transform(sequence(lit(0), size(toks) - lit(n)),
            i => array_join(slice(toks, i + lit(1), lit(n)), " "))))
        .otherwise(array().cast("array<string>")))
    flatten(bound)
  }

  /** Rolling-hash document fingerprint (polynomial hash over tokens) —
    * order-sensitive counterpart of `fingerprint`. aggregate() HOF.
    */
  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))

  /** X6 prompt templating (reference core/models/reasoning_engine.py's
    * f-string prompt assembly over a field list): fill {key}
    * placeholders from columns; null values render as "". Pure nested
    * replace() — codegen'd, and trivially mirrored in any SQL engine.
    */
  def template(tpl: Column, vars: Seq[(String, Column)]): Column =
    vars.foldLeft(tpl) { case (acc, (k, v)) =>
      replace(acc, lit("{" + k + "}"), coalesce(v.cast("string"), lit("")))
    }

  /** X4 response cleaning (reference test_ai_models/model_evaluator.py:
    * 374-384): strip <think>...</think> chain-of-thought blocks
    * (DOTALL, non-greedy — multiple blocks all go), then trim.
    */
  def cleanResponse(c: Column): Column =
    trim(regexp_replace(c, "(?s)<think>.*?</think>", ""))

  /** Context-budget truncation (reference reasoning_engine.py:234-252
    * `_truncate_text`): cut to maxChars; if a newline exists past 80% of
    * the budget, cut at that newline instead (never mid-line when a
    * clean break is close enough). Pure Scala — applied at the edge.
    */
  def smartTruncate(text: String, maxChars: Int): String = {
    if (text == null || text.length <= maxChars) return text
    val hard = text.substring(0, maxChars)
    val nl = hard.lastIndexOf('\n')
    if (nl >= (maxChars * 0.8).toInt) hard.substring(0, nl)
    else hard
  }
}
