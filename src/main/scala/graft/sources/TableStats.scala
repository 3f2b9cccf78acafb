package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Driver-side table statistics from parquet footers — no Spark job.
  *
  * Production tables (Iceberg) carry row counts in snapshot metadata
  * (`total-records` in the snapshot summary); operators that size
  * data-dependent parameters (LSH plane counts, shuffle partitioning)
  * read the stat instead of running a count() scan job. This is the
  * plain-parquet analog: footers hold per-file row counts, so the
  * driver answers "how many rows" with a metadata read measured in
  * milliseconds, not an extra job over the corpus.
  */
object TableStats {

  /** Total row count of a parquet table path (file or directory of
    * part files), read from footers only.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      else Seq(fs.getFileStatus(p))
    files.map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount
      finally r.close()
    }.sum
  }
}
