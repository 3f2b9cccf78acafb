package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TableStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("footer row count equals the scan count, without running a job") {
    for (t <- Seq("embeddings", "documents", "lineitem")) {
      val path = s"/root/testdata/sf0.001/$t.parquet"
      val fromStats = TableStats.parquetRowCount(spark, path)
      val fromScan = spark.read.parquet(path).count()
      assert(fromStats == fromScan, s"$t: $fromStats != $fromScan")
    }
  }

  test("multi-file tables sum across part files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stats").toString
    spark.range(0, 1234, 1, 7).map(_.toString).write
      .mode("overwrite").parquet(dir)
    assert(TableStats.parquetRowCount(spark, dir) == 1234L)
  }

  test("hive-partitioned trees recurse; metadata files are skipped") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-stats-p").toString
    spark.range(0, 300).withColumn("k", col("id") % 3)
      .write.partitionBy("k").mode("overwrite").parquet(dir)
    assert(TableStats.parquetRowCount(spark, dir) == 300L)
  }
}
