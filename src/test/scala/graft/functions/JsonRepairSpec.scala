package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X3 cascade semantics (reference reasoning_engine.py:182-232). */
class JsonRepairSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(inputs: (String, String)*): Map[String, (Int, String)] = {
    import spark.implicits._
    inputs.toSeq.toDF("name", "txt")
      .select($"name", JsonRepair.repairStage($"txt").as("stage"),
        JsonRepair.repairPayload($"txt").as("payload"))
      .collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getString(2)))
      .toMap
  }

  test("cascade picks channel > fence > brace slice > none") {
    val out = run(
      "channel" -> "analysis…<|message|>{\"a\": 1}\n<|end|>",
      "channelNested" -> "<|message|>{\"a\": {\"b\": 2}} trailing",
      "fence" -> "Sure!\n```json\n{\"a\": 3}\n```\nbye",
      "fencePlain" -> "```\n{\"a\": 4}\n```",
      "prose" -> "The answer is {\"a\": 5} as requested.",
      "plain" -> "{\"a\": 6}",
      "nothing" -> "no json anywhere",
      "channelAndFence" -> "<|message|>{\"m\": 1} or ```json\n{\"f\": 2}\n```")
    assert(out("channel") == ((1, "{\"a\": 1}")))
    // greedy-to-last-brace keeps nested objects whole
    assert(out("channelNested") == ((1, "{\"a\": {\"b\": 2}}")))
    assert(out("fence") == ((2, "{\"a\": 3}")))
    assert(out("fencePlain") == ((2, "{\"a\": 4}")))
    assert(out("prose") == ((3, "{\"a\": 5}")))
    assert(out("plain") == ((3, "{\"a\": 6}")))
    assert(out("nothing")._1 == 0 && out("nothing")._2 == null)
    assert(out("channelAndFence")._1 == 1) // reference pattern order
  }

  test("cleanResponse strips every think block") {
    import spark.implicits._
    val got = Seq("<think>a\nb</think>hello <think>c</think>world")
      .toDF("t").select(TextFunctions.cleanResponse($"t")).head.getString(0)
    assert(got == "hello world")
  }
}
