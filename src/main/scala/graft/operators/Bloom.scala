package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership against a committed corpus — the index
  * structure that makes incremental snapshot dedup
  * ([[graft.streaming.StreamExtract.dedupAgainstSnapshot]]) affordable
  * at 10^12 docs: instead of anti-joining every arrival batch against
  * the full committed fingerprint table, arrivals probe a compact
  * bitset first and only the (tiny) possibly-present set pays the
  * exact join. The reference has no committed-corpus index at all —
  * its batch client re-reads prior results wholesale
  * (use_api/batch_processor.py:130-159); this is the from-scratch
  * scale path.
  *
  * Construction (Kirsch-Mitzenmacher double hashing, public standard):
  * the doc fingerprint is md5 of whitespace-normalized text (the same
  * [[TextFunctions.fingerprint]] every dedup layer keys on); h1/h2 are
  * its first/second 8 hex chars as uint32; bit j (j < k) is
  * (h1 + j*h2) mod m. All arithmetic is 64-bit-exact integer, so the
  * identical filter is computable in any SQL engine — the driver's
  * DuckDB oracle replays it bit-for-bit (query b1_bloom_dedup).
  *
  * Two renditions with IDENTICAL semantics (BloomSpec cross-checks):
  *
  *   - [[membershipJoin]]: the filter is a distinct (pos) table and the
  *     probe is a join — every step is a declarative Catalyst plan the
  *     oracle can mirror. Shuffle profile: one distinct on a key domain
  *     bounded by m, one join on the same bounded key, one 16-byte-key
  *     groupBy — no step ever carries document text.
  *   - [[bitsetOf]] / [[probeBitset]]: the filter is a real broadcast
  *     Array[Long] bitset (m/8 bytes; 32 bits/key ≈ 4 bytes/doc) built
  *     by one per-partition fold + tree reduce, and the probe is a pure
  *     narrow map — zero shuffles, the shape a 1000-executor cluster
  *     ships. At snapshot scale the filter is maintained incrementally
  *     (OR-ing each committed batch's bitset into the stored one —
  *     Bloom union IS bitwise OR) and sharded alongside the snapshot's
  *     bucket layout once m outgrows a single broadcast.
  *
  * False positives are the design trade (rate ≈ fill^k with
  * fill = 1 - exp(-k·n/m)); false negatives are impossible — BloomSpec
  * asserts `is_dup ⇒ bloom_hit` and the b1 query exposes both flags so
  * the gate would catch either kind of drift.
  */
object Bloom {

  /** Default bits per committed key (m = bitsPerKey * n): 32 bits/key
    * with k = 3 gives fill ≈ 9%, false-positive rate ≈ 0.07%.
    */
  val BitsPerKey = 32

  /** Default probe count. */
  val K = 3

  /** uint32 from 8 hex chars of the fingerprint starting at `from`
    * (1-based, matching SQL substring).
    */
  private def hexWord(fp: Column, from: Int): Column =
    conv(substring(fp, from, 8), 16, 10).cast("long")

  /** Array of the k DISTINCT bit positions of fingerprint `fp` in a
    * filter of `m` bits (m as a Column so it can ride a broadcast
    * scalar row instead of a driver-side count).
    */
  def positions(fp: Column, m: Column, k: Int = K): Column = {
    val h1 = hexWord(fp, 1)
    val h2 = hexWord(fp, 9)
    array_distinct(transform(sequence(lit(0), lit(k - 1)),
      j => (h1 + j.cast("long") * h2) % m))
  }

  /** Join-rendition membership probe: for each distinct arrival
    * (idCol, fp), `bloom_hit` (all k positions set in the filter built
    * from `committed`) and `is_dup` (fingerprint actually present — the
    * ground truth the bloom approximates). Output:
    * (idCol, fp, bloom_hit, is_dup), one row per distinct (idCol, fp)
    * — duplicate arrival rows collapse, they do not distort the hit
    * count (distinct matched POSITIONS are counted, not matched rows,
    * so an at-least-once replayed arrival cannot manufacture a false
    * negative).
    *
    * m = bitsPerKey * count(committed), computed as a one-row aggregate
    * cross-joined broadcast — sizing the filter costs no driver action
    * and stays inside the plan. The committed fingerprint table feeds
    * three consumers (sizing, filter build, ground truth), so it is
    * materialized through `caches` under the repo-wide recoverability
    * contract ([[CacheRegistry]]) instead of being rescanned three
    * times.
    */
  def membershipJoin(committed: DataFrame, arrivals: DataFrame,
      cContent: DataFrame => Column, aContent: DataFrame => Column,
      idCol: String, bitsPerKey: Int = BitsPerKey, k: Int = K,
      caches: CacheRegistry = sharedCaches): DataFrame = {
    val cFp = caches.materialize(committed
      .select(TextFunctions.fingerprint(cContent(committed)).as("fp")))
    // floor at 1 bit: an EMPTY committed side must yield all-miss, not
    // an ANSI divide-by-zero in `% m` on the arrival probe
    val mDf = cFp.agg(greatest(count(lit(1)) * bitsPerKey, lit(1L))
      .cast("long").as("m"))
    val bits = cFp.crossJoin(broadcast(mDf))
      .select(explode(positions(col("fp"), col("m"), k)).as("pos"))
      .distinct()
      .withColumn("__set", lit(1))
    val aPos = arrivals
      .select(col(idCol),
        TextFunctions.fingerprint(aContent(arrivals)).as("fp"))
      .crossJoin(broadcast(mDf))
      .select(col(idCol), col("fp"),
        positions(col("fp"), col("m"), k).as("pa"))
      .select(col(idCol), col("fp"), size(col("pa")).as("np"),
        explode(col("pa")).as("pos"))
    // distinct matched positions via collect_set (r06): same replay-safe
    // semantics as countDistinct (set size of non-null matched positions,
    // so an at-least-once replayed arrival row cannot distort the count)
    // but ONE exchange instead of the two-phase distinct aggregate — the
    // set is bounded by k elements per group
    val hits = aPos.join(bits, Seq("pos"), "left")
      .groupBy(col(idCol), col("fp"), col("np"))
      .agg(size(collect_set(when(col("__set").isNotNull, col("pos"))))
        .cast("long").as("nh"))
    val cDup = cFp.distinct().withColumn("__dup", lit(1))
    hits.join(cDup, Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        (col("nh") === col("np")).as("bloom_hit"),
        col("__dup").isNotNull.as("is_dup"))
  }

  /** Default registry for standalone callers (see [[CacheRegistry]]
    * for the scoping caveat); Verify/Bench release it between queries.
    */
  private val sharedCaches = new CacheRegistry

  /** Unpersist the shared registry's tables after the consuming action. */
  def releaseCaches(): Unit = sharedCaches.releaseAll()

  /** Build the real bitset from a one-column fingerprint DataFrame:
    * per-partition fold into a local Array[Long], then a bitwise-OR
    * tree reduce — ONE pass over the data (a zero-bitset seed row is
    * unioned in so the reduce also covers the empty input, instead of
    * a separate isEmpty job re-running the fingerprint scan), no
    * shuffle of positions. NULL fingerprints (a null-content doc) are
    * dropped — they set no bits, exactly as in [[membershipJoin]].
    */
  def bitsetOf(fps: DataFrame, m: Long, k: Int = K): Array[Long] = {
    require(m > 0 && m <= (1L << 34), s"bitset of $m bits not broadcastable")
    val spark = fps.sparkSession
    import spark.implicits._
    val words = ((m + 63) / 64).toInt
    val fpCol = fps.columns.head
    val posDs = fps
      .where(col(fpCol).isNotNull)
      .select(positions(col(fpCol), lit(m), k).as("pa"))
      .as[Seq[Long]]
    val parts = posDs.mapPartitions { it =>
      val arr = new Array[Long](words)
      it.foreach(_.foreach(p => arr((p >> 6).toInt) |= 1L << (p & 63)))
      Iterator.single(arr)
    }
    parts.union(spark.createDataset(Seq(new Array[Long](words))))
      .reduce { (a, b) =>
        // fresh result array (round-5 ADVICE): mutating `a` in place
        // worked only because the Array[Long] encoder deserializes a
        // copy per element — an implicit dependency on encoder copy
        // semantics that object reuse would silently break
        val out = new Array[Long](words)
        var i = 0; while (i < words) { out(i) = a(i) | b(i); i += 1 }; out
      }
  }

  /** Narrow-map probe of a broadcast bitset (the executor-side shape):
    * same (idCol, fp, bloom_hit) flags as [[membershipJoin]] minus the
    * ground-truth column, zero shuffles. The id column must be an
    * integral type (asserted up front — a silent cast-to-null would
    * otherwise kill the typed map at runtime); a NULL fingerprint (a
    * null-content arrival) probes to bloom_hit = false, matching the
    * join rendition.
    */
  def probeBitset(arrivals: DataFrame, aContent: DataFrame => Column,
      idCol: String, bits: Array[Long], m: Long, k: Int = K): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType,
      ShortType}
    val idType = arrivals.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"probeBitset needs an integral id column; $idCol is $idType")
    val spark = arrivals.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(bits)
    arrivals
      .select(col(idCol).cast("long").as("id"),
        TextFunctions.fingerprint(aContent(arrivals)).as("fp"))
      .as[(Long, String)]
      .map { case (id, fp) => (id, fp, probeOne(fp, bc.value, m, k)) }
      .toDF(idCol, "fp", "bloom_hit")
      // restore the caller's id type (the typed map rode a long): the
      // renditions promise schema parity, so an int id must come back
      // int, not silently widened
      .withColumn(idCol, col(idCol).cast(idType))
  }

  /** Scalar probe of one hex fingerprint against a local bitset — the
    * executor-side kernel [[probeBitset]] and the streaming ingest
    * pre-filter ([[graft.streaming.StreamExtract.dedupAgainstSnapshot]])
    * share. A null fingerprint is a miss.
    */
  private[graft] def probeOne(fp: String, arr: Array[Long], m: Long,
      k: Int = K): Boolean =
    fp != null && {
      val h1 = java.lang.Long.parseLong(fp.substring(0, 8), 16)
      val h2 = java.lang.Long.parseLong(fp.substring(8, 16), 16)
      var j = 0; var h = true
      while (j < k && h) {
        val p = (h1 + j * h2) % m
        h = (arr((p >> 6).toInt) & (1L << (p & 63))) != 0
        j += 1
      }
      h
    }
}
