package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * binary columns with typed metadata.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs exist
  * in this container): `decodeStub` derives deterministic fake metadata
  * and features from the raw bytes. Everything around it — binary column
  * schema, per-partition batching, typed mapPartitions signature, output
  * schema — is the real Spark plumbing a production decoder would slot
  * into (swap `decodeStub` for a JNI/codec call; state is amortized per
  * partition exactly like the reference's lazy model loading,
  * core/models/ocr_engine.py:32-71).
  */
object Media {

  final case class MediaMeta(doc_id: String, width: Int, height: Int,
      channels: Int, n_bytes: Long, mean_byte: Double)

  /** STUB decoder: deterministic fake "image header" parse.
    * A real implementation would decode the codec header; the fake is a
    * pure function of the payload so tests are reproducible.
    */
  def decodeStub(id: String, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xFF; i += 1 }
    MediaMeta(id,
      width = n % 640 + 16,
      height = n % 480 + 16,
      channels = n % 3 + 1,
      n_bytes = n.toLong,
      mean_byte = if (n == 0) 0.0 else
        math.rint(sum.toDouble / n * 10000) / 10000)
  }

  /** Attach a binary payload column (here: utf-8 bytes of a text column,
    * standing in for fetched media bytes keyed by media_ref).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Decode metadata/features from binary payloads — typed mapPartitions
    * so decoder state would be initialized once per partition.
    */
  def extractMeta(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // real decoder init would happen here, once per partition
        it.map { case (id, bytes) =>
          decodeStub(id, if (bytes == null) Array.empty else bytes)
        }
      }
  }
}
