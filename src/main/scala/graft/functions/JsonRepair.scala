package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X3: the reference's JSON-repair cascade as pure Catalyst expressions
  * (reference core/models/reasoning_engine.py:182-232
  * `_parse_json_response`):
  *
  *   stage 1 — payload after a `<|message|>` channel marker;
  *   stage 2 — inside a ```json ... ``` fence;
  *   stage 3 — first-'{' .. last-'}' slice of the whole response;
  *   stage 0 — no JSON found (payload null; callers keep the raw
  *             response, mirroring the reference's error struct with
  *             raw_response).
  *
  * The reference validates each candidate with json.loads in a loop;
  * that is re-expressed deterministically as brace slicing so the whole
  * cascade stays codegen'd — the final parse happens via from_json on
  * the returned payload, which yields null (not an error) on junk.
  */
object JsonRepair {

  /** First-'{' .. last-'}' slice; null when there is no brace pair. */
  def braceSlice(c: Column): Column = {
    val start = locate("{", c)
    val endRev = locate("}", reverse(c))
    val end = length(c) - endRev + 1
    when(start > 0 && endRev > 0 && end >= start,
      c.substr(start, end - start + 1))
  }

  private def nonEmpty(c: Column): Column = when(length(c) > 0, c)

  /** Raw capture after the channel marker (null when absent) — exposed
    * so multi-stage pipelines can materialize the regex once and brace-
    * slice the aliased column (braceSlice references its input several
    * times; an attribute reference is free, a regex is not).
    */
  def channelRaw(c: Column): Column =
    // contains() pre-guard (r06): the regex can only match when the
    // literal marker is present, so the (much cheaper) substring scan
    // short-circuits the regex on the non-channel majority of rows;
    // when(false) yields null, exactly like nonEmpty of a no-match ""
    when(c.contains("<|message|>"),
      nonEmpty(regexp_extract(c, "(?s)<\\|message\\|>\\s*(\\{.*)", 1)))

  /** Stage 1: brace slice of whatever follows the channel marker. */
  def channelPayload(c: Column): Column = braceSlice(channelRaw(c))

  /** Stage 2: fenced ```json block (non-greedy, like the reference). */
  def fencePayload(c: Column): Column =
    // same contains() pre-guard as channelRaw: no backticks, no fence
    when(c.contains("```"),
      nonEmpty(regexp_extract(c, "(?s)```(?:json)?\\s*(\\{.*?\\})\\s*```", 1)))

  /** Which cascade stage produced the payload (0 = none). */
  def repairStage(c: Column): Column =
    when(channelPayload(c).isNotNull, 1)
      .when(fencePayload(c).isNotNull, 2)
      .when(braceSlice(c).isNotNull, 3)
      .otherwise(0)

  /** The extracted JSON payload (null when stage 0). */
  def repairPayload(c: Column): Column =
    coalesce(channelPayload(c), fencePayload(c), braceSlice(c))
}
