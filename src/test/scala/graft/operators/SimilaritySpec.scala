package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecs() = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),  // close to 0
      (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),  // identical to 0
      (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite
      (5L, Seq(0.5f, 0.5f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
  }

  test("brute-force cosine top-k: exact scores and ranking") {
    import spark.implicits._
    val q = vecs().filter($"vec_id" === 0L)
    val res = Similarity.bruteForceTopK(vecs(), q, "embedding", "vec_id", k = 5)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score"),
        r.getAs[Int]("rk")))
    assert(res.head._1 == 3L && res.head._2 == 1.0) // identical vec first
    val m = res.map(r => r._1 -> r._2).toMap
    assert(m(2L) == 0.0)
    assert(m(4L) == -1.0)
    assert(math.abs(m(1L) - 0.9 / math.sqrt(0.82)) < 1e-6)
    assert(res.map(_._3).toSeq == (1 to 5))
  }

  test("lsh top-k: identical vectors share a bucket, scores exact") {
    import spark.implicits._
    val q = vecs().filter($"vec_id" === 0L)
    val res = Similarity.lshTopK(vecs(), q, "embedding", "vec_id",
        k = 5, planes = 4)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    val ids = res.map(_._1).toSet
    assert(ids.contains(3L)) // identical vector: same sign pattern, found
    // every returned score equals the brute-force score
    val bf = Similarity.bruteForceTopK(vecs(), q, "embedding", "vec_id", 5)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("score")).toMap
    res.foreach { case (id, s) => assert(bf(id) == s) }
  }

  test("lsh recall on the driver embeddings table") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    val bf = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    val lsh = Similarity.lshTopK(emb, q, "embedding", "vec_id", 10, planes = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    assert(recall >= 0.2, s"lsh recall@10 too low: $recall")
    assert(lsh.nonEmpty)
  }

  test("cosine near-dups finds identical pairs at score 1") {
    val pairs = Similarity.cosineNearDups(vecs(), "embedding", "vec_id",
        minCos = 0.999, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0))
  }
}
