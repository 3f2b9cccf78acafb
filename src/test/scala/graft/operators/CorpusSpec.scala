package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus mixing and decontamination: closed-form fates vs an
  * independent JDK md5, planted-overlap exactness, and the
  * reproducibility contract the operators exist for.
  */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  /** Independent reimplementation of the sampling uniform (JDK
    * MessageDigest, not Spark) — the spec's oracle for u32.
    */
  private def jdkU32(id: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"${b & 0xFF}%02x").mkString, 16)
  }

  test("weightedMix: per-doc fate matches the md5 closed form") {
    import spark.implicits._
    val weights = Seq("en" -> 1.5, "de" -> 0.6, "fr" -> 1.0, "zh" -> 0.0)
    val docs = (0L until 400L).map(i =>
      (i, Seq("en", "de", "fr", "zh")((i % 4).toInt))).toDF("doc_id", "lang")
    val got = Corpus.weightedMix(docs, "doc_id", "lang", weights)
      .orderBy("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val expected = (0L until 400L).flatMap { i =>
      val lang = Seq("en", "de", "fr", "zh")((i % 4).toInt)
      val w = weights.toMap.apply(lang)
      val whole = math.floor(w).toInt
      val extra =
        if (jdkU32(i.toString) < Corpus.fracThreshold(w)) 1 else 0
      (1 to whole + extra).map(c => (i, lang, c))
    }
    assert(got.toSeq == expected)
    // the classes behave as designed: fr = identity, zh = dropped,
    // en in {1,2} copies, de in {0,1}
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("fr") == 100)
    assert(!byLang.contains("zh"))
    assert(byLang("en") > 100 && byLang("en") < 200)
    assert(byLang("de") > 0 && byLang("de") < 100)
    // a class absent from the weights is dropped like weight 0
    val unknown = Corpus.weightedMix(
      Seq((1L, "xx")).toDF("doc_id", "lang"), "doc_id", "lang", weights)
    assert(unknown.count() == 0)
  }

  test("weightedMix is reproducible across runs and partitionings") {
    import spark.implicits._
    val weights = Seq("a" -> 0.5, "b" -> 1.25)
    val docs = (0L until 300L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("doc_id", "lang")
    def run(parts: Int) =
      Corpus.weightedMix(docs.repartition(parts), "doc_id", "lang", weights)
        .orderBy("doc_id", "copy").collect().toSeq
    assert(run(2) == run(7)) // the no-RNG-state contract
  }

  test("hashSplit: per-doc fate matches the md5 closed form, invariant") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val t1 = math.floor(0.8 * 4294967296.0).toLong
    val t2 = math.floor(0.9 * 4294967296.0).toLong
    val docs = (0L until 500L).map(i => Tuple1(i)).toDF("doc_id")
    val got = Corpus.hashSplit(docs, "doc_id", splits)
      .orderBy("doc_id").as[(Long, String)].collect()
    got.foreach { case (id, s) =>
      val u = jdkU32(id.toString)
      val expect = if (u < t1) "train" else if (u < t2) "val" else "test"
      assert(s == expect, s"doc $id: u=$u")
    }
    // every split nonempty at 500 docs and fractions roughly honored
    val byS = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byS("train") > 300 && byS("val") > 10 && byS("test") > 10, byS)
    // invariance under repartitioning (the held-out contract)
    val rep = Corpus.hashSplit(docs.repartition(7), "doc_id", splits)
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(rep.toSeq == got.toSeq)
    // malformed fraction vectors are rejected up front
    assertThrows[IllegalArgumentException] {
      Corpus.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    assertThrows[IllegalArgumentException] {
      Corpus.hashSplit(docs, "doc_id", Seq("a" -> 1.0))
    }
  }

  test("contaminationHits: planted overlap is counted exactly") {
    import spark.implicits._
    // bench doc grams (n=3): {a b c, b c d, c d e}
    val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x a b c y"),       // shares exactly {a b c}
      (2L, "a b c d q c d e"), // shares {a b c, b c d, c d e}... and more
      (3L, "p q r s t"),       // disjoint
      (4L, "c b a")            // same words, no shared 3-gram
    ).toDF("doc_id", "text")
    val got = Corpus.contaminationHits(corpus, bench, "text", "doc_id", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // doc 2's grams: a b c, b c d, c d q, d q c, q c d, c d e ->
    // shared = {a b c, b c d, c d e} = 3
    assert(got.toSeq == Seq(
      (1L, 1L, true), (2L, 3L, true), (3L, 0L, false), (4L, 0L, false)))
  }

  test("contaminationHits: short docs and repeated grams") {
    import spark.implicits._
    val bench = Seq((9L, "k k k k")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "k k"),          // under n tokens: no grams, clean
      (2L, "k k k k k k")   // 'k k k' appears 4 times but counts ONCE
    ).toDF("doc_id", "text")
    val got = Corpus.contaminationHits(corpus, bench, "text", "doc_id", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, 0L, false), (2L, 1L, true)))
  }
}
