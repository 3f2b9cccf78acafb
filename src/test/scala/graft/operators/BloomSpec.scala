package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom membership filter: no false negatives ever, the two renditions
  * (oracle-replayable join vs broadcast-bitset narrow map) agree bit for
  * bit, and the filter arithmetic matches an independent JDK md5
  * reimplementation.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** Independent probe oracle: JDK MessageDigest md5 + plain Scala
    * double hashing — no Spark expressions shared with the operator.
    */
  private def jdkPositions(text: String, m: Long, k: Int): Seq[Long] = {
    val norm = text.trim.toLowerCase.replaceAll("\\s+", " ")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16)
    (0 until k).map(j => (h1 + j * h2) % m).distinct
  }

  /** Deterministic little corpus with planted cross-cohort duplicates:
    * committed = ids 0..199, arrivals = ids 1000..1099, where even
    * arrival ids repeat committed text (id % 200) and odd ids are
    * fresh strings absent from the committed side.
    */
  private def corpus = {
    import spark.implicits._
    val committed = (0L until 200L)
      .map(i => (i, s"committed doc $i with some   Body text ${i * 7}"))
      .toDF("doc_id", "text")
    val arrivals = (1000L until 1100L).map { i =>
      val text =
        if (i % 2 == 0) s"committed doc ${i % 200} with some   Body text ${(i % 200) * 7}"
        else s"fresh arrival $i never seen before ${i * 13}"
      (i, text)
    }.toDF("doc_id", "text")
    (committed, arrivals)
  }

  test("membershipJoin: is_dup implies bloom_hit (no false negatives)") {
    val (committed, arrivals) = corpus
    val out = Bloom.membershipJoin(committed, arrivals,
      df => df("text"), df => df("text"), "doc_id").collect()
    assert(out.length == 100)
    val dups = out.filter(_.getAs[Boolean]("is_dup"))
    assert(dups.length == 50, "all planted dups detected as ground truth")
    assert(dups.forall(_.getAs[Boolean]("bloom_hit")),
      "a Bloom filter can never miss a present key")
  }

  test("bitset rendition agrees with the join rendition bit for bit") {
    import spark.implicits._
    val (committed, arrivals) = corpus
    val joinOut = Bloom.membershipJoin(committed, arrivals,
        df => df("text"), df => df("text"), "doc_id")
      .select("doc_id", "fp", "bloom_hit")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    val m = committed.count() * Bloom.BitsPerKey
    val cFp = committed.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val bits = Bloom.bitsetOf(cFp, m)
    val bitOut = Bloom.probeBitset(arrivals, df => df("text"),
        "doc_id", bits, m)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(joinOut.toSeq == bitOut.toSeq)
  }

  test("filter arithmetic matches an independent JDK md5 oracle") {
    import spark.implicits._
    val (committed, arrivals) = corpus
    val m = committed.count() * Bloom.BitsPerKey
    // expected bitset from plain Scala over the committed texts
    val expectedBits = committed.as[(Long, String)].collect()
      .flatMap { case (_, t) => jdkPositions(t, m, Bloom.K) }.toSet
    // operator's bitset must set exactly those positions
    val cFp = committed.select(
      graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    val arr = Bloom.bitsetOf(cFp, m)
    val gotBits = (0L until m).filter(p =>
      (arr((p >> 6).toInt) & (1L << (p & 63))) != 0).toSet
    assert(gotBits == expectedBits)
    // and the per-arrival verdicts follow from the same closed form
    val verdicts = Bloom.probeBitset(arrivals, df => df("text"),
        "doc_id", arr, m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    arrivals.as[(Long, String)].collect().foreach { case (id, t) =>
      val expect = jdkPositions(t, m, Bloom.K).forall(expectedBits)
      assert(verdicts(id) == expect, s"doc $id")
    }
  }

  test("duplicate arrival rows cannot manufacture a false negative") {
    import spark.implicits._
    val (committed, arrivals) = corpus
    // replay every arrival twice (at-least-once delivery): hit counting
    // must be per distinct position, not per row, and the output stays
    // one row per distinct (doc_id, fp)
    val replayed = arrivals.union(arrivals)
    val out = Bloom.membershipJoin(committed, replayed,
      df => df("text"), df => df("text"), "doc_id").collect()
    assert(out.length == 100)
    val dups = out.filter(_.getAs[Boolean]("is_dup"))
    assert(dups.length == 50)
    assert(dups.forall(_.getAs[Boolean]("bloom_hit")),
      "replayed arrivals must still hit the filter")
  }

  test("null-content arrivals: both renditions report a miss, no crash") {
    import spark.implicits._
    val (committed, arrivals) = corpus
    val withNull = arrivals
      .union(Seq((2000L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val joinOut = Bloom.membershipJoin(committed, withNull,
        df => df("text"), df => df("text"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3))).toMap
    assert(joinOut(2000L) == ((false, false)))
    val m = committed.count() * Bloom.BitsPerKey
    val cFpNull = committed
      .union(Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      .select(graft.functions.TextFunctions.fingerprint($"text").as("fp"))
    // a null committed fingerprint sets no bits and does not crash the
    // fold; a null arrival probes to false
    val bits = Bloom.bitsetOf(cFpNull, m)
    val probed = Bloom.probeBitset(withNull, df => df("text"),
        "doc_id", bits, m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!probed(2000L))
    // and a non-integral id column is rejected up front, not cast to
    // null inside the typed map
    val strIds = Seq(("doc-1", "body")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Bloom.probeBitset(strIds, df => df("text"), "doc_id", bits, m)
    }
  }

  test("empty committed side: nothing hits, nothing is a dup") {
    import spark.implicits._
    val (_, arrivals) = corpus
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // join rendition: 0 committed keys -> membershipJoin floors m at 1
    // (greatest(count*bitsPerKey, 1)), so every probe maps to position
    // 0, which is unset because the filter table is empty -> no hit,
    // and no ANSI divide-by-zero in `% m`
    val out = Bloom.membershipJoin(empty, arrivals,
      df => df("text"), df => df("text"), "doc_id").collect()
    assert(out.length == 100)
    assert(out.forall(r => !r.getAs[Boolean]("bloom_hit")
      && !r.getAs[Boolean]("is_dup")))
    // bitset rendition guards m explicitly
    val bits = Bloom.bitsetOf(
      empty.select(graft.functions.TextFunctions.fingerprint($"text")
        .as("fp")), 64)
    assert(bits.forall(_ == 0L))
  }
}
