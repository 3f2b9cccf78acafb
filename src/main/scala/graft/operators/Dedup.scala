package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale notes (designed for 10^9+ docs):
  *   - exact dedup: one shuffle on the md5 fingerprint — the grouping
  *     key is 16 bytes regardless of document size.
  *   - MinHash+LSH: signatures + band hashes are computed scan-side in a
  *     JIT-compiled Scala kernel inside typed mapPartitions (Spark array
  *     HOFs are interpreted, not codegen'd — measured 10x+ slower here);
  *     only (doc_id, band, bandHash) rows are shuffled — never the text.
  *     Candidate verification joins shingles back only for the (tiny)
  *     deduplicated candidate set.
  *   - SimHash: 64-bit signature per doc; pairs via 4-segment blocking
  *     (pigeonhole: hamming<=3 over 64 bits => at least one identical
  *     16-bit segment), so the self-join key is (segment, 16-bit value).
  *   - n-gram Jaccard: exact pairwise scores via shingle explode +
  *     shingle-key join; intended for candidate verification or small
  *     corpora — the LSH paths are the 100TB route.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct normalized text.
    * (keep = min doc id, n = group size).
    */
  def exactDupGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJ.
    */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, minJ: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema(idCol).dataType
    // shingling via the JIT Scala kernel (same values as wordShingles —
    // verified by the DuckDB oracle on this exact operator); ids pass
    // through as strings and are cast back to their original type below
    val sh = docs.select(col(idCol).cast("string").as("doc_id"),
        tokens(col(textCol)).as("t"))
      .as[(String, Seq[String])]
      .mapPartitions(_.map { case (id, ts) => (id, shingleSet(ts, n).toSeq) })
      .toDF("doc_id", "sh")
      .withColumn("doc_id", col("doc_id").cast(idType))
      .filter(size(col("sh")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("g"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (col("na") + col("nb") - col("common")), 4))
      .filter(col("jaccard") >= minJ)
      .select("id_a", "id_b", "jaccard")
  }

  /** Word n-gram shingle set — plain Scala kernel (JIT-compiled; Spark's
    * array HOFs are interpreted, not codegen'd, so per-row kernels belong
    * in typed mapPartitions).
    */
  def shingleSet(toks: Seq[String], n: Int): Array[String] = {
    if (toks.lengthCompare(n) < 0) return Array.empty
    val arr = toks.toArray
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= arr.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(arr(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out.toArray(Array.empty[String])
  }

  /** MinHash signature: permutation i's hash family = murmur3(g, i). */
  def minhashSig(shingles: Array[String], perms: Int): Array[Int] = {
    val sig = Array.fill(perms)(Int.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val g = shingles(s)
      var i = 0
      while (i < perms) {
        val h = scala.util.hashing.MurmurHash3.stringHash(g, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** MinHash+LSH near-duplicate candidate pairs, verified by exact
    * shingle Jaccard. bands*rowsPerBand must equal perms. Returned ids
    * are strings (cast from idCol).
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, perms: Int = 64, bands: Int = 16,
      minJ: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = perms / bands
    require(bands * rowsPerBand == perms, "bands must divide perms")
    val tokenized = docs.select(col(idCol).cast("string").as("doc_id"),
        tokens(col(textCol)).as("t"))
      .as[(String, Seq[String])]
    // one (band, bandHash) row per band — ids only; shingling + minhash
    // run exactly ONCE over the corpus, and the band self-join never
    // shuffles document content
    val banded = tokenized
      .mapPartitions(_.flatMap { case (id, ts) =>
        val shingles = shingleSet(ts, n)
        if (shingles.isEmpty) Iterator.empty
        else {
          val sig = minhashSig(shingles, perms)
          (0 until bands).iterator.map { b =>
            var bh = b
            var r = 0
            while (r < rowsPerBand) {
              bh = scala.util.hashing.MurmurHash3.mix(bh, sig(b * rowsPerBand + r))
              r += 1
            }
            (id, b, scala.util.hashing.MurmurHash3.finalizeHash(bh, rowsPerBand))
          }
        }
      })
      .toDF("doc_id", "band", "bh")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // verification: join raw tokens back and re-shingle ONLY the (tiny)
    // candidate set post-join — the corpus-wide scans stay cheap column
    // reads, no full-corpus shingle recomputation
    val toksDf = tokenized.toDF("doc_id", "t")
    cand
      .join(toksDf.select(col("doc_id").as("id_a"), col("t").as("ta")), "id_a")
      .join(toksDf.select(col("doc_id").as("id_b"), col("t").as("tb")), "id_b")
      .select("id_a", "id_b", "ta", "tb") // using-joins reorder columns
      .as[(String, String, Seq[String], Seq[String])]
      .mapPartitions(_.flatMap { case (idA, idB, ta, tb) =>
        val sa = shingleSet(ta, n)
        val sb = shingleSet(tb, n)
        if (sa.isEmpty || sb.isEmpty) Iterator.empty
        else {
          val setB = sb.toSet
          val common = sa.count(setB.contains)
          // HALF_UP to match jaccardPairs' Spark round() exactly
          val j = BigDecimal(common.toDouble /
            (sa.length + sb.length - common))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (j >= minJ) Iterator((idA, idB, j)) else Iterator.empty
        }
      })
      .toDF("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token multiset (pure Scala kernel — exposed
    * for the typed path and tests).
    */
  def simhash64(tokens: Iterable[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = scala.util.hashing.MurmurHash3.stringHash(t, 0x9747b28c).toLong << 32 |
        (scala.util.hashing.MurmurHash3.stringHash(t, 0x85ebca6b).toLong & 0xFFFFFFFFL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<= 15),
    * candidate generation via 4-segment pigeonhole blocking.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(maxHamming <= 15, "4-segment blocking covers hamming <= 3 " +
      "guaranteed; up to 15 heuristically")
    val sigs = docs.select(col(idCol).cast("string").as("doc_id"),
        tokens(col(textCol)).as("t"))
      .as[(String, Seq[String])]
      .mapPartitions(_.map { case (id, ts) => (id, simhash64(ts)) })
      .toDF("doc_id", "sig")
    val seg = sigs.select($"doc_id", $"sig",
      posexplode(array(Seq.tabulate(4)(i =>
        (shiftrightunsigned($"sig", i * 16) % lit(65536)).cast("int")): _*))
        .as(Seq("seg", "sv")))
    val ham = udfFreeHamming($"a.sig", $"b.sig")
    seg.as("a").join(seg.as("b"),
        $"a.seg" === $"b.seg" && $"a.sv" === $"b.sv" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
        ham.as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter($"hamming" <= maxHamming)
  }

  /** bit_count(a XOR b) as a Catalyst expression (no UDF). */
  private def udfFreeHamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
