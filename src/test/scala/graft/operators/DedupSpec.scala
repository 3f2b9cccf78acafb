package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val nearDup = base.replace("today", "tonight") // high jaccard
    val exactDup = base
    val unrelated1 = "spark catalyst optimizer rewrites logical plans into physical stages efficiently always"
    val unrelated2 = "completely different words about cooking pasta with garlic butter and fresh basil leaves"
    Seq(
      (1L, base), (2L, exactDup), (3L, nearDup),
      (4L, unrelated1), (5L, unrelated2),
      (6L, unrelated1 + " extra tail words appended here")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical normalized text") {
    val g = Dedup.exactDupGroups(corpus(), "text", "doc_id")
    val dupGroups = g.filter(col("n") > 1).collect()
    assert(dupGroups.length == 1)
    assert(dupGroups.head.getAs[Long]("keep_id") == 1L)
    assert(dupGroups.head.getAs[Long]("n") == 2L)
  }

  test("jaccard pairs find near + exact dups with correct scores") {
    val pairs = Dedup.jaccardPairs(corpus(), "text", "doc_id", n = 3, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((1L, 2L)) == 1.0)         // exact dup
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) > 0.7) // near dup
    assert(asMap.contains((2L, 3L)))
    assert(asMap.contains((4L, 6L)))       // prefix-contained pair
    assert(!asMap.keys.exists(k => k._1 == 5L || k._2 == 5L))
  }

  test("minhash LSH recovers the jaccard pairs (recall on fixture)") {
    val truth = Dedup.jaccardPairs(corpus(), "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0).toString, r.getLong(1).toString)).toSet
    val found = Dedup.minhashNearDups(corpus(), "text", "doc_id",
        n = 3, perms = 64, bands = 16, minJ = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(found.subsetOf(truth)) // verification step guarantees precision
    assert(found.contains(("1", "2"))) // exact dups always collide
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.75, s"recall $recall, found=$found truth=$truth")
  }

  test("simhash: identical texts at distance 0, near texts close") {
    val a = Dedup.simhash64("the quick brown fox".split(" "))
    val b = Dedup.simhash64("the quick brown fox".split(" "))
    assert(Dedup.hamming64(a, b) == 0)
    val pairs = Dedup.simhashNearDups(corpus(), "text", "doc_id", maxHamming = 12)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("1", "2"))) // exact dup at hamming 0
  }
}
