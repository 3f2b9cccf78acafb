package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries at a scale dir.
  *   runMain graft.QueryTime <sfDir> <queryName>...
  * Each query runs once warm (JIT + parquet footers) and twice timed;
  * prints the best. Mirrors Bench's noop-sink methodology so numbers
  * are comparable to BENCH_r*.json lines — EXCEPT d5_dup_clusters and
  * d6_dedup_corpus, which Bench times standalone over a
  * pre-materialized pair table (here they run the full pipeline
  * including d2's PPJoin).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-qtime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val best = (1 to 2).map(_ => run()).min
      println(f"[qtime] $n%s $best%.3f s")
    }
    spark.stop()
  }
}
