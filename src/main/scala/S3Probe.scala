import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object S3Probe {
  def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[s3probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%.3f s")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.files.maxPartitionBytes", (8L*1024*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{Dedup, Similarity}
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val n = graft.sources.TableStats.parquetRowCount(spark, "/root/testdata/sf0.1/embeddings.parquet")
    val planes = Similarity.sizePlanes(n, 125)
    println(s"[s3probe] n=$n planes=$planes")
    // warm
    Similarity.cosineNearDups(emb, "embedding", "vec_id", 0.5, planes, 48, 500)
      .write.format("noop").mode("overwrite").save()
    Dedup.releaseCaches()
    t("banded buckets (cache fill)") {
      Similarity.bandedBuckets(emb, "embedding", "vec_id", planes, 48, 500)
        .write.format("noop").mode("overwrite").save()
    }
    Dedup.releaseCaches()
    t("candidatePairs") {
      Similarity.candidatePairs(emb, "embedding", "vec_id", planes, 48, 500)
        .write.format("noop").mode("overwrite").save()
    }
    Dedup.releaseCaches()
    val cnt = Similarity.candidatePairs(emb, "embedding", "vec_id", planes, 48, 500).count()
    println(s"[s3probe] candidate pairs = $cnt")
    Dedup.releaseCaches()
    t("full cosineNearDups") {
      Similarity.cosineNearDups(emb, "embedding", "vec_id", 0.5, planes, 48, 500)
        .write.format("noop").mode("overwrite").save()
    }
    Dedup.releaseCaches()
    spark.stop()
  }
}
