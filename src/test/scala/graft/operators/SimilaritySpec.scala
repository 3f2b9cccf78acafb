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

  test("s3 oracle precondition: expected missed pairs bounded at every scale") {
    // s3's driver gate hash-compares LSH output to the EXACT cosine
    // oracle at minCos=0.5. In 64 dims the random-background cosine std
    // is ~1/8, so a threshold of 0.2 sits inside the background bulk
    // where borderline pairs are dense and recall cannot saturate (at
    // sf0.1's planes=4 the per-pair miss at c=0.2 is ~6e-3 — hundreds
    // of real misses). At 0.5 the background has thinned enough that
    // E[miss] = Σ_pairs (1 - p(c)^planes)^tables with p(c)=1-acos(c)/π
    // stays < 1e-3 on every test corpus — asserted here over the REAL
    // testdata (the d3 precondition pattern) so a corpus change that
    // re-densifies the boundary fails HERE with a clear message.
    // config comes from SparkEntry so the guard cannot desynchronize
    // from what the s3 query actually runs
    import graft.SparkEntry.{S3MaxBucket, S3MinCos, S3Tables, S3TargetBucket}
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val rows = emb
        .selectExpr("cast(embedding as array<double>)")
        .collect().map(_.getSeq[Double](0).toArray)
      val n = rows.length
      val planes = Similarity.sizePlanes(n, targetBucket = S3TargetBucket)
      val norms = rows.map(v => math.sqrt(v.map(x => x * x).sum))
      var expectedMisses = 0.0
      var pairs = 0
      var minC = 1.0
      for (i <- rows.indices; j <- (i + 1) until n) {
        var dot = 0.0
        var k = 0
        while (k < rows(i).length) { dot += rows(i)(k) * rows(j)(k); k += 1 }
        val c = dot / (norms(i) * norms(j))
        if (c >= S3MinCos) {
          pairs += 1
          if (c < minC) minC = c
          val p = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
          expectedMisses += math.pow(1.0 - math.pow(p, planes), S3Tables)
        }
      }
      // the E[miss] model above assumes the maxBucket re-split path is
      // INERT (re-splitting separates bucket members and adds misses
      // the closed form does not see) — assert no bucket exceeds the
      // cap at this scale, so the model is exact for this corpus
      val maxOcc = Similarity.bandedBuckets(emb, "embedding", "vec_id",
          planes = planes, tables = S3Tables)
        .groupBy("tbl", "bucket").count()
        .agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
      info(f"$sf%s: n=$n%d planes=$planes%d pairs=$pairs%d " +
        f"minCos=$minC%.4f E[missed]=$expectedMisses%.2e maxBucket=$maxOcc%d")
      assert(maxOcc <= S3MaxBucket,
        s"$sf: a bucket holds $maxOcc > $S3MaxBucket vectors — the s3 " +
          "re-split is live and the expected-miss model no longer " +
          "bounds the oracle gap; re-derive the bound for the re-split " +
          "path before trusting the hash gate")
      assert(expectedMisses < 1e-3,
        f"$sf%s: E[missed pairs]=$expectedMisses%.2e — a pair sits in " +
          "the LSH recall gap; s3's hash-equality oracle no longer " +
          "holds for this testdata, raise minCos/tables or switch the " +
          "gate to a recall-tolerance compare")
    }
  }

  test("s3 exactness on planted near-dups: LSH equals brute force") {
    // the live corpora hold only 0/1/14 pairs at cos >= S3MinCos, so
    // the driver gate alone exercises little recall — this test plants
    // a few hundred near-dup pairs across the saturation band and
    // asserts the LSH output IS the brute-force answer. dim=256 keeps
    // the random background (std 1/16) eight sigma below the
    // threshold, so the expected pair set is exactly the planted one
    // plus whatever brute force finds.
    import spark.implicits._
    import graft.SparkEntry.{S3MaxBucket, S3MinCos, S3Tables, S3TargetBucket}
    val dim = 256
    def u(s: Long): Float = {
      val z = s * 0x9E3779B97F4A7C15L
      ((z >>> 11).toDouble / 4503599627370496.0 - 1.0).toFloat
    }
    val base = (0 until 300).map(i =>
      Array.tabulate(dim)(d => u((i + 3L) * dim + d)))
    // 150 planted neighbors: vec 300+i = a unit-mix of base(i) and an
    // independent noise vector; alpha sweeps the cos range ~[0.62, 0.99]
    val planted = (0 until 150).map { i =>
      val alpha = 0.62f + 0.37f * (i / 150.0f)
      val noise = Array.tabulate(dim)(d => u((i + 7000L) * dim + d))
      val nb = math.sqrt(base(i).map(x => x.toDouble * x).sum).toFloat
      val nn = math.sqrt(noise.map(x => x.toDouble * x).sum).toFloat
      Array.tabulate(dim)(d =>
        alpha * base(i)(d) / nb +
          math.sqrt(1.0 - alpha * alpha).toFloat * noise(d) / nn)
    }
    val all = base ++ planted
    val df = all.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    // brute force
    val norms = all.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    val exact = (for {
      i <- all.indices; j <- (i + 1) until all.length
      c = (0 until dim).map(k => all(i)(k).toDouble * all(j)(k)).sum /
        (norms(i) * norms(j))
      if c >= S3MinCos
    } yield (i.toLong, j.toLong)).toSet
    assert(exact.size >= 140, s"planting failed: ${exact.size} pairs")
    val planes = Similarity.sizePlanes(all.length, S3TargetBucket)
    val lsh = Similarity.cosineNearDups(df, "embedding", "vec_id",
        minCos = S3MinCos, planes = planes, tables = S3Tables,
        maxBucket = S3MaxBucket)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact,
      s"missed=${(exact -- lsh).size} extra=${(lsh -- exact).size} " +
        s"of ${exact.size} true pairs")
  }

  test("cosine near-dups finds identical pairs at score 1") {
    val pairs = Similarity.cosineNearDups(vecs(), "embedding", "vec_id",
        minCos = 0.999, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0))
  }

  /** Deterministic spread corpus. With planes=1 per table every table
    * has only 2 buckets, so each bucket holds ~half the corpus — the
    * low-planes analog of a skewed hub, but separable by extension
    * planes (a cluster of literally identical vectors is NOT separable
    * by any plane; that pathological case is exact-dedup's job).
    */
  private def spread(n: Int, dim: Int = 16) = {
    import spark.implicits._
    def u(s: Long): Float = { // splitmix-ish deterministic noise [-1, 1)
      val z = s * 0x9E3779B97F4A7C15L
      ((z >>> 11).toDouble / 4503599627370496.0 - 1.0).toFloat
    }
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(d => u((i + 7L) * dim + d)).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("bucket cap re-splits oversized buckets: bounded, subset output") {
    val docs = spread(200)
    val free = Similarity.bandedBuckets(docs, "embedding", "vec_id",
      planes = 1, tables = 4)
    val maxFree = free.groupBy("tbl", "bucket").count()
      .agg(max("count")).head.getLong(0)
    assert(maxFree >= 80, s"fixture not skewed enough: $maxFree")
    val capped = Similarity.bandedBuckets(docs, "embedding", "vec_id",
      planes = 1, tables = 4, maxBucket = 20)
    val maxCapped = capped.groupBy("tbl", "bucket").count()
      .agg(max("count")).head.getLong(0)
    // re-split by ceil(log2(n/cap)) extension bits bounds the bucket to
    // ~cap in expectation; allow 3x slack for uneven splits
    assert(maxCapped <= 60, s"cap did not bound buckets: $maxCapped")
    // capped candidates are a subset => capped output is a subset
    val full = Similarity.cosineNearDups(docs, "embedding", "vec_id",
        minCos = 0.2, planes = 1, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cap = Similarity.cosineNearDups(docs, "embedding", "vec_id",
        minCos = 0.2, planes = 1, tables = 4, maxBucket = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cap.subsetOf(full))
    assert(cap.nonEmpty)
  }

  test("dense hub: maxBucket re-split cuts join volume, keeps true pairs") {
    // A 1000-vector hub (shared direction + noise, pairwise cos ~0.6)
    // crowds a handful of buckets per table — the skew shape that makes
    // an uncapped per-bucket self-join quadratic. The re-split's real
    // guarantee: the join VOLUME (sum of squared bucket sizes — exactly
    // the rows the bucket self-join produces) drops, while planted true
    // near-dups (cos ~1) survive, because near-identical vectors agree
    // on the extension planes too and multi-table union covers the
    // rest. A hub of mutual TRUE near-dups is irreducible — its output
    // is itself quadratic — so the bound is on wasted candidates, not
    // on genuine pairs.
    import spark.implicits._
    def u(s: Long): Float = {
      val z = s * 0x9E3779B97F4A7C15L
      ((z >>> 11).toDouble / 4503599627370496.0 - 1.0).toFloat
    }
    val dim = 16
    val base = Array.tabulate(dim)(d => u(999L * dim + d))
    val hub = (0 until 1000).map { i =>
      (i.toLong,
        Array.tabulate(dim)(d => base(d) + 0.8f * u((i + 3L) * dim + d)).toSeq)
    }
    // 5 planted near-dup pairs: ids 2000+2k ~ 2000+2k+1 at cos ~0.9999
    val planted = (0 until 5).flatMap { k =>
      val v = Array.tabulate(dim)(d => u((5000L + k) * dim + d))
      Seq((2000L + 2 * k, v.toSeq),
        (2001L + 2 * k, v.map(x => x + 0.005f * u(k * dim + x.hashCode)).toSeq))
    }
    val docs = (hub ++ planted).toDF("vec_id", "embedding")
    val (planes, tables, cap) = (4, 8, 50)

    def joinVolume(maxBucket: Int): Long =
      Similarity.bandedBuckets(docs, "embedding", "vec_id",
          planes, tables, maxBucket)
        .groupBy("tbl", "bucket").count()
        .agg(sum(col("count") * col("count"))).head.getLong(0)
    val volFree = joinVolume(0)
    val volCap = joinVolume(cap)
    assert(volFree >= 500000L, s"fixture hub not dense enough: $volFree")
    assert(volCap <= (volFree * 7) / 10,
      s"re-split did not cut join volume: $volCap vs $volFree")

    // recall through the cap: every planted pair is still found
    val out = Similarity.cosineNearDups(docs, "embedding", "vec_id",
        minCos = 0.99, planes = planes, tables = tables, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { k =>
      assert(out.contains((2000L + 2 * k, 2001L + 2 * k)),
        s"planted pair $k lost under maxBucket=$cap")
    }
    // and capped candidates stay a subset of uncapped candidates
    val candCap = Similarity.candidatePairs(docs, "embedding", "vec_id",
      planes, tables, cap).count()
    val candFree = Similarity.candidatePairs(docs, "embedding", "vec_id",
      planes, tables, 0).count()
    assert(candCap <= candFree)
  }

  test("bandedBuckets rejects plane counts the shard encoding cannot hold") {
    intercept[IllegalArgumentException] {
      Similarity.bandedBuckets(spread(4), "embedding", "vec_id",
        planes = 41, tables = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.bandedBuckets(spread(4), "embedding", "vec_id",
        planes = 0, tables = 1)
    }
  }

  test("sizePlanes: stats-driven blocking size") {
    assert(Similarity.sizePlanes(500, 125) == 2)
    assert(Similarity.sizePlanes(5000, 125) == 6)
    assert(Similarity.sizePlanes(10, 125) == 2) // floor
    assert(Similarity.sizePlanes(1000000000L, 125) == 23)
  }

  test("ivf top-k: probed cells cover the true neighbors, scores exact") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id")) ->
        r.getAs[Double]("score")).toMap
    val ivf = Similarity.ivfTopK(emb, q, "embedding", "vec_id",
        k = 10, cells = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score"), r.getAs[Int]("rk")))
    assert(ivf.nonEmpty)
    // every returned score equals the exact cosine (verification exact)
    ivf.foreach { case (qid, vid, s, _) =>
      bf.get((qid, vid)).foreach(exact => assert(exact == s))
    }
    // rk dense from 1 per query
    ivf.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
    }
    // recall against brute force is meaningful at nprobe=4/16 cells
    val recall = ivf.map(r => (r._1, r._2)).count(bf.contains).toDouble / bf.size
    assert(recall >= 0.3, s"ivf recall@10 too low: $recall")
    // nprobe = cells degenerates to exact brute-force
    val full = Similarity.ivfTopK(emb, q, "embedding", "vec_id",
        k = 10, cells = 16, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("vec_id"))).toSet
    assert(full == bf.keySet)
  }

  test("multi-table LSH recall tracks the independence theory curve") {
    // Regression guard for hyperplane quality: correlated planes (the
    // LCG-lattice bug) collapse recall far below the independent-plane
    // formula E[recall] = mean over true pairs of 1-(1-p^planes)^tables
    // with p = 1 - acos(cos)/pi. Parameters sit mid-curve on purpose —
    // that is where correlation shows up hardest.
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val minCos = 0.3
    val exact = (for {
      i <- vecs.indices.iterator; j <- (i + 1) until vecs.length
      c = Similarity.roundedCosine(vecs(i)._2, vecs(j)._2) if c >= minCos
    } yield ((vecs(i)._1, vecs(j)._1), c)).toMap
    assert(exact.size > 200, s"fixture too sparse: ${exact.size}")
    for ((k, l) <- Seq((4, 4), (6, 8))) {
      val got = Similarity.cosineNearDups(emb, "embedding", "vec_id",
          minCos, planes = k, tables = l)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.subsetOf(exact.keySet)) // precision exact by construction
      val recall = got.size.toDouble / exact.size
      val theory = exact.values.map { c =>
        val p = 1.0 - math.acos(math.min(1.0, c)) / math.Pi
        1.0 - math.pow(1.0 - math.pow(p, k), l)
      }.sum / exact.size
      assert(math.abs(recall - theory) <= 0.15,
        f"planes=$k tables=$l recall=$recall%.3f theory=$theory%.3f")
    }
  }

  test("top-k is two-phase: kernel pruning before the merge window") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" < 3),
      "embedding", "vec_id", 10)
    val plan = df.queryExecution.executedPlan.toString
    // the scored corpus is reduced inside mapPartitions (object path =>
    // SerializeFromObject) before any Exchange/Window merge
    assert(plan.contains("SerializeFromObject"), plan)
    assert(plan.contains("Window"), plan)
    val serIdx = plan.indexOf("SerializeFromObject")
    val winIdx = plan.indexOf("Window")
    assert(winIdx < serIdx, // tree prints parents first: Window consumes the kernel output
      s"Window should sit above the kernel stage:\n$plan")
  }
}
