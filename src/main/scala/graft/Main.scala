package graft

import graft.data.CorpusGen
import graft.model._
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

/** spark-submit entry point (north_rule: "run via spark-submit").
  *
  * Modes:
  *   --gen N          generate an N-doc synthetic corpus as input
  *   --in PATH        read an existing docs parquet table instead
  *   --out PATH       output table root (required)
  *   --format F       plain | markdown
  *   --parallelism P  shuffle/partition parallelism (default: session)
  *   --master M       spark master override (default local[*]; under a
  *                    real spark-submit the cluster master wins)
  *   --mega-every K   every K-th generated doc is a mega-doc
  *
  * Writes:
  *   out/extracted/   the ExtractedDoc table (parquet)
  *   out/audit/       per-partition lineage + metrics rows
  *
  * Local example:
  *   sbt "runMain graft.Main --gen 10000 --out /tmp/graft-out"
  */
object Main {

  /** --key value pairs; a bare --flag (no value) maps to "true" without
    * shifting subsequent pairs.
    */
  private def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
          out += a.drop(2) -> args(i + 1)
          i += 2
        } else {
          out += a.drop(2) -> "true"
          i += 1
        }
      } else i += 1
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val out = opts.getOrElse("out",
      sys.error("--out <path> is required"))
    val parallelism = opts.get("parallelism").map(_.toInt).getOrElse(0)

    val builder = SparkSession.builder().appName("graft-extract")
    if (!sys.props.contains("spark.master") && !opts.contains("no-local"))
      builder.master(opts.getOrElse("master", "local[*]"))
    val spark = builder
      .config("spark.sql.shuffle.partitions",
        if (parallelism > 0) parallelism.toString
        else sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cfg = ExtractConfig(
      format = OutFormat.parse(opts.getOrElse("format", "plain")),
      partitions = parallelism)

    val docs: Dataset[Doc] = opts.get("in") match {
      case Some(path) =>
        spark.read.parquet(path).as[Doc]
      case None =>
        val n = opts.getOrElse("gen", "1000").toLong
        val genCfg = CorpusGen.GenConfig(
          markdown = cfg.format == OutFormat.Markdown,
          megaEvery = opts.get("mega-every").map(_.toLong).getOrElse(0L))
        // distributed generation — no driver materialization
        spark.range(0, n)
          .mapPartitions(_.map(i =>
            CorpusGen.genDoc(CorpusGen.DefaultSeed, i, genCfg).input))
    }

    val t0 = System.nanoTime()
    opts.get("buckets").map(_.toInt) match {
      case Some(nBuckets) =>
        // resumable snapshot mode: out/ is a SnapshotStore table root
        val store = new graft.snapshot.SnapshotStore(out)
        val maxBuckets = opts.get("max-buckets").map(_.toInt).getOrElse(-1)
        val genN = opts.get("gen").map(_.toLong)
        val bucketInput: Int => Dataset[Doc] = genN match {
          case Some(n) =>
            val genCfg = CorpusGen.GenConfig(
              markdown = cfg.format == OutFormat.Markdown,
              megaEvery = opts.get("mega-every").map(_.toLong).getOrElse(0L))
            val per = (n + nBuckets - 1) / nBuckets
            b => spark.range(b * per, math.min((b + 1) * per, n))
              .mapPartitions(_.map(i =>
                CorpusGen.genDoc(CorpusGen.DefaultSeed, i, genCfg).input))
          case None =>
            import org.apache.spark.sql.functions.{hash, pmod, lit}
            b => docs.filter(
              pmod(hash(docs("doc_id")), lit(nBuckets)) === lit(b))
        }
        val (ran, nd) = Job.runResumable(spark, store, nBuckets,
          bucketInput, cfg, maxBuckets)
        val wallSec = (System.nanoTime() - t0) / 1e9
        println(f"[graft] resumable: buckets_run=$ran docs=$nd " +
          f"committed=${store.committedBuckets.size}/$nBuckets " +
          f"snapshot=${store.latest.map(_.snapshot_id).getOrElse(0L)} " +
          f"wall=$wallSec%.2fs")
      case None =>
        val acc = Pipeline.auditAccumulator(spark)
        val extracted = Pipeline.extract(docs, cfg, snapshotId = 1L, audit = acc)
        extracted.write.mode(SaveMode.Overwrite).parquet(s"$out/extracted")
        val wallSec = (System.nanoTime() - t0) / 1e9
        val audit = Pipeline.auditRows(acc)
        spark.createDataset(audit).coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/audit")
        val nDocs = audit.map(_.docs).sum
        val nSpans = audit.map(r => r.spans_html + r.spans_pdf + r.spans_image).sum
        println(f"[graft] docs=$nDocs spans=$nSpans wall=$wallSec%.2fs " +
          f"throughput=${nDocs / wallSec}%.1f docs/s partitions=${audit.size}")
    }
    spark.stop()
  }
}
