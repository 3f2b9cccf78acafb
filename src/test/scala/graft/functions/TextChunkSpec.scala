package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** tokenChunks: closed-form window arithmetic, overlap, and the ragged
  * edge cases the real-corpus oracle may not sample.
  */
class TextChunkSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  private def chunksOf(text: String, maxTok: Int = 32, stride: Int = 24) = {
    import spark.implicits._
    Seq(Tuple1(text)).toDF("text")
      .select(explode(TextFunctions.tokenChunks($"text", maxTok, stride))
        .as("c"))
      .select($"c.chunk_idx", $"c.n_tok", $"c.chunk")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
  }

  test("window count, sizes, and overlap are the closed form") {
    val words = (1 to 100).map(i => s"w$i")
    val got = chunksOf(words.mkString(" "))
    // ceil((100-32)/24)+1 = 4 windows; sizes 32,32,32, 100-3*24=28
    assert(got.map(c => (c._1, c._2)).toSeq ==
      Seq((0, 32), (1, 32), (2, 32), (3, 28)))
    // chunk i covers tokens [i*24, i*24+32) — verify text exactly
    got.foreach { case (i, n, chunk) =>
      assert(chunk == words.slice(i * 24, i * 24 + 32).mkString(" "))
      assert(chunk.split(" ").length == n)
    }
    // consecutive chunks share exactly maxTok-stride = 8 tokens
    val c0 = got(0)._3.split(" ")
    val c1 = got(1)._3.split(" ")
    assert(c0.takeRight(8).toSeq == c1.take(8).toSeq)
  }

  test("boundary cases: exact fit, one over, single short doc") {
    assert(chunksOf((1 to 32).map("t" + _).mkString(" "))
      .map(c => (c._1, c._2)).toSeq == Seq((0, 32)))
    assert(chunksOf((1 to 33).map("t" + _).mkString(" "))
      .map(c => (c._1, c._2)).toSeq == Seq((0, 32), (1, 9)))
    assert(chunksOf("only three words").toSeq == Seq((0, 3, "only three words")))
  }

  test("degenerate text still yields exactly one bounded chunk") {
    // trim strips SPACES only (both engines), split keeps empty
    // fields: "" gives one empty token, a surviving interior tab gives
    // two — DuckDB's trim + string_split_regex produce the identical
    // arrays, so the oracle replays both shapes bit-for-bit
    assert(chunksOf("").toSeq == Seq((0, 1, "")))
    assert(chunksOf("   \t  ").toSeq == Seq((0, 2, " ")))
  }

  test("null text propagates to a null array (caller filters)") {
    import spark.implicits._
    val n = Seq(Tuple1(null: String)).toDF("text")
      .select(explode(TextFunctions.tokenChunks($"text", 32, 24)).as("c"))
      .count()
    assert(n == 0L) // explode of null emits no rows
  }
}
