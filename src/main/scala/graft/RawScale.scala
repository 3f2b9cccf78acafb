package graft

/** Dev probe: RAW (unnormalized) 4->16 thread scaling of the bench's
  * extraction phase, interleaved A/B across repeats so box drift shows
  * up as spread instead of bias. Prints one line per repeat plus the
  * median ratio. Not part of the bench artifact.
  */
object RawScale {

  /** One timed stage run (docs/sec) at a core count. stage:
    *   full = the bench's extraction phase (parquet -> extract -> noop)
    *   read = parquet -> Doc deserialize -> cheap fold (no extractors)
    *   kernel = in-memory extract of a per-partition replayed doc set
    *            (no parquet, no shuffle — the pure extractor kernel)
    */
  private def trial(cores: Int, stage: String): Double = {
    if (stage == "full") return Bench.extractionTrials(cores, 1).max
    val spark = Bench.sessionForDev(cores)
    import spark.implicits._
    val docs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "600000").toLong
    def run(): Unit = stage match {
      case "read" =>
        spark.read.parquet(
            sys.env.getOrElse("SPARK_GRAFT_BENCH_CORPUS", "/tmp/graft-bench-corpus"))
          .as[graft.model.Doc]
          .mapPartitions(it => Iterator.single(
            it.foldLeft(0L)((a, d) => a + d.spans.length)))
          .write.format("noop").mode("overwrite").save()
      case _ =>
        spark.range(0, docs, 1, cores * 2)
          .mapPartitions(_.map { i =>
            val d = graft.data.CorpusGen.genDoc(graft.data.CorpusGen.DefaultSeed,
              i % 20000) // small replayed set: generation cost amortized
            var sink = 0L
            d.input.spans.foreach { sp =>
              sink += graft.extract.Extractor.extractSpan(
                graft.model.SpanRow(d.input.doc_id, sp.kind, sp.text,
                  sp.media_ref, sp.offset), graft.model.OutFormat.Plain)
                .text.length
            }
            sink
          })
          .write.format("noop").mode("overwrite").save()
    }
    run() // warm
    val t0 = System.nanoTime()
    run()
    val r = docs / ((System.nanoTime() - t0) / 1e9)
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    r
  }

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("RAWSCALE_REPS", "3").toInt
    val stage = sys.env.getOrElse("RAWSCALE_STAGE", "full")
    Bench.ensureCorpus()
    trial(16, stage) // global warm
    val ratios = (1 to reps).map { r =>
      // symmetric best-of-2 on BOTH sides, interleaved 4/16/4/16 — a
      // lopsided max-of-2 on one side alone biases E[ratio] upward and
      // would credit part of that bias to whatever A/B treatment the
      // probe is being used to judge
      val a4 = trial(4, stage); val a16 = trial(16, stage)
      val b4 = trial(4, stage); val b16 = trial(16, stage)
      val t4 = math.max(a4, b4)
      val t16 = math.max(a16, b16)
      val ratio = (t16 / t4) / 4.0
      println(f"[rawscale] stage=$stage rep=$r thr4=$t4%.0f thr16=$t16%.0f raw=$ratio%.3f")
      ratio
    }
    val med = ratios.sorted.apply((ratios.size - 1) / 2)
    println(f"[rawscale] stage=$stage median_raw=$med%.3f over $reps reps")
  }
}
