package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1: measure first).
  *
  * Times SparkEntry queries under the EXACT session shape Bench.session
  * uses (local[$SPARK_GRAFT_CPUS], shuffle.partitions = cpus*2,
  * maxPartitionBytes = 8 MB, UTC, noop sink), replicating Bench's
  * d5/d6 stage-billing protocol (pairs pre-materialized, untimed), and
  * additionally reports per-query job/stage/task counts from a listener
  * so stage-count regressions are visible without the UI.
  *
  *   runMain graft.BenchExtra <sfDir> [query ...]     (default: all)
  *
  * Env:
  *   BENCHX_RUNS=n     timed runs per query (default 2; first run after
  *                     the warmup mirrors Bench's cold single-shot)
  *   BENCHX_PLANS=tag  also write plans/r06/<query>_<tag>.txt with the
  *                     .explain("formatted") output
  */
object BenchExtra {

  private class Counts extends SparkListener {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      stages += 1
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    def reset(): Unit = { jobs = 0; stages = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("BENCHX_RUNS", "2").toInt
    val plansTag = sys.env.get("BENCHX_PLANS")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchx")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    // mirror Bench's t4 warmup
    SparkEntry.queries.get("t4_fingerprint").foreach { fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }

    // Bench's d5/d6 protocol: pairs materialized untimed, billed on d2
    lazy val pairs = {
      val p = SparkEntry.dupPairs(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      graft.operators.Dedup.releaseCaches()
      p
    }

    names.foreach { name =>
      def frame(): org.apache.spark.sql.DataFrame = name match {
        case "d5_dup_clusters" =>
          graft.operators.Dedup.dupClustersLargeStar(pairs)
        case "d6_dedup_corpus" =>
          graft.operators.Dedup.dedupCorpus(
            spark.read.parquet(s"$sfDir/documents.parquet"),
            "text", "doc_id", precomputedPairs = Some(pairs))
        case _ => SparkEntry.queries(name)(spark, sfDir)
      }
      plansTag.foreach { tag =>
        Files.createDirectories(Paths.get("plans/r06"))
        val plan = frame().queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"plans/r06/${name}_$tag.txt"), plan)
        graft.operators.Dedup.releaseCaches()
        graft.operators.Bloom.releaseCaches()
      }
      val times = (1 to runs).map { _ =>
        counts.reset()
        val t0 = System.nanoTime()
        try frame().write.format("noop").mode("overwrite").save()
        catch { case t: Throwable =>
          System.err.println(s"[benchx] $name FAILED: ${t.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Dedup.releaseCaches()
        graft.operators.Bloom.releaseCaches()
        (dt, counts.jobs, counts.stages, counts.tasks)
      }
      val line = times.map { case (dt, j, s, t) =>
        f"$dt%6.3fs j=$j%-3d st=$s%-4d tk=$t%-5d"
      }.mkString(" | ")
      println(f"[benchx] $name%-24s $line")
    }
    spark.stop()
  }
}
