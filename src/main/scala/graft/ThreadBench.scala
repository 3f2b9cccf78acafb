package graft

import graft.data.CorpusGen
import graft.extract.Extractor
import graft.model._
import java.util.concurrent.atomic.AtomicLong

/** Temporary: raw JVM thread-scaling ceiling of the gen+extract kernel,
  * no Spark involved.
  */
object ThreadBench {
  def main(args: Array[String]): Unit = {
    val perThread = sys.env.getOrElse("TB_DOCS", "30000").toLong
    Seq(8, 32).foreach { nThreads =>
      // warm
      (0L until 5000L).foreach { i =>
        val d = CorpusGen.genDoc(42L, i).input
        d.spans.foreach(sp => Extractor.extractSpan(
          SpanRow(d.doc_id, sp.kind, sp.text, sp.media_ref, sp.offset),
          OutFormat.Plain))
      }
      val done = new AtomicLong()
      val t0 = System.nanoTime()
      val threads = (0 until nThreads).map { t =>
        new Thread(() => {
          var i = t * perThread
          val end = i + perThread
          var sink = 0
          while (i < end) {
            val d = CorpusGen.genDoc(42L, i).input
            d.spans.foreach { sp =>
              sink += Extractor.extractSpan(
                SpanRow(d.doc_id, sp.kind, sp.text, sp.media_ref, sp.offset),
                OutFormat.Plain).text.length
            }
            i += 1
          }
          done.addAndGet(sink.toLong)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      val total = nThreads * perThread
      println(f"[tbench] threads=$nThreads docs=$total wall=$sec%.2fs ${total / sec}%10.0f docs/s (sink=${done.get()})")
    }
  }
}
