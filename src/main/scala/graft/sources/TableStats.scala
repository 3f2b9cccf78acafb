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

  /** Total row count of a parquet table path — a single file, a flat
    * directory of part files, or a hive-partitioned tree (`k=v/`
    * subdirectories are recursed; `_`/`.`-prefixed metadata files are
    * skipped, like Spark's own listing) — read from footers only.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    def walk(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filterNot { c =>
            val n = c.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
          .flatMap(walk)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st)
      else Seq.empty
    walk(fs.getFileStatus(p)).map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount
      finally r.close()
    }.sum
  }
}
