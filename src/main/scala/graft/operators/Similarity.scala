package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (exact; broadcast the query set,
  * one scan of the corpus, per-query top-k via window — no shuffle of
  * the corpus itself beyond the top-k aggregation).
  *
  * Scale path: random-hyperplane LSH — each vector maps to a `planes`-bit
  * bucket computed scan-side; queries probe only their own bucket
  * (optionally multi-probe). At 10^9 vectors the bucket join shuffles
  * only (bucket, id, vec-of-query-candidates), not the full cross
  * product.
  */
object Similarity {

  /** Cosine similarity between two array<float/double> columns — pure
    * HOFs (zip_with + aggregate), stays in codegen.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), _ + _)
    val na = aggregate(a, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double"))
    dot / (sqrt(na) * sqrt(nb))
  }

  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double")))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (excluding self-match on id). Query set must be
    * small (it is broadcast).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"))
      .join(q, col("vec_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed integer hash scaled to [-1, 1). No RNG state — reproducible
    * across executors by construction.
    */
  private def planeComponent(plane: Int, d: Column): Column =
    (hash(lit(plane), d).cast("double") / lit(Int.MaxValue.toDouble))

  /** LSH bucket id: sign pattern of `planes` random hyperplanes. */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = Seq.tabulate(planes) { p =>
      val dot = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") * planeComponent(p, i)),
        lit(0.0), _ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed approximate top-k with multi-probe: the query probes
    * its own bucket plus every bucket at hamming distance 1 (flip one
    * plane bit) — the standard recall/cost lever. Candidate set size is
    * ~ (planes+1)/2^planes of the corpus per query. Recall measured
    * against bruteForceTopK in tests.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, planes: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    val probes = explode(array(
      (lit(0L) +: Seq.tabulate(planes)(p => lit(1L << p))): _*))
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"), lshBucket(col(vecCol), planes).as("qbucket"))
      .withColumn("flip", probes)
      .withColumn("bucket", col("qbucket").bitwiseXOR(col("flip")))
      .drop("qbucket", "flip"))
    val scored = cb.join(qb, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("qv"), col("v")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("score"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (score >= minCos) via LSH
    * blocking: only same-bucket pairs are scored.
    */
  def cosineNearDups(corpus: DataFrame, vecCol: String, idCol: String,
      minCos: Double, planes: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes).as("bucket"))
    cb.as("a").join(cb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("score", round(cosine(col("a.v"), col("b.v")), 6))
      .filter(col("score") >= minCos)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("score"))
  }
}
