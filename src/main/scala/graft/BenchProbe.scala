package graft

import graft.data.CorpusGen
import graft.model._
import org.apache.spark.sql.SparkSession

/** Temporary scaling probe: full pipeline throughput across masters.
  * PROBE_MASTERS = colon-free ;-separated master URLs.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "120000").toLong
    val masters = sys.env.getOrElse("PROBE_MASTERS", "local[8];local[32]")
      .split(";").toSeq
    val classesDir = sys.env.getOrElse("PROBE_CLASSPATH",
      "/root/repo/target/scala-2.13/classes")
    masters.foreach { master =>
      val parts = sys.env.getOrElse("PROBE_PARTS", "64").toInt
      val spark = SparkSession.builder()
        .master(master)
        .appName(s"probe")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions",
          sys.env.getOrElse("PROBE_EXEC_OPTS", ""))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val mult = sys.env.getOrElse("PROBE_SPAN_MULT", "1").toInt
      def corpus = spark.range(0, n, 1, parts).mapPartitions(_.map { i =>
        val d = CorpusGen.genDoc(CorpusGen.DefaultSeed, i).input
        if (mult <= 1) d
        else d.copy(spans = (0 until mult).flatMap(k =>
          d.spans.map(s => s.copy(offset = s.offset + k * 1000))))
      })
      val stage = sys.env.getOrElse("PROBE_STAGE", "full")
      def run(): Unit = (stage match {
        case "gen" => corpus.toDF()
        case "gen_deser" =>
          import org.apache.spark.sql.functions._
          corpus.mapPartitions(_.map(d => d.doc_id.length + d.spans.size))
            .toDF()
        case _ => Pipeline.extract(corpus, ExtractConfig(partitions = parts))
          .toDF()
      }).write.format("noop").mode("overwrite").save()
      run() // warm
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      val best = secs.min
      println(f"[probe] master=$master%-24s best=$best%7.2fs  ${n / best}%10.0f docs/s  trials=${secs.map(s => f"$s%.2f").mkString(",")}")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
