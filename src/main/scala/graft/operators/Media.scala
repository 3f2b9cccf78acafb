package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio payloads as opaque binary
  * columns with typed metadata, decoded by REAL container-header
  * parsers.
  *
  * The container has no pixel/sample codec libraries, so full raster
  * decode stays out of scope — but PNG / BMP / WAV metadata lives in
  * documented public header layouts that need no codec, and the parsers
  * below implement them for real (they are validated in MediaSpec
  * against files produced by the JDK's own encoders, javax.imageio and
  * javax.sound.sampled). The matching builders emit spec-correct
  * headers (PNG chunk CRCs included), so the m1 query round-trips
  * build -> bytes -> parse while its DuckDB oracle predicts the
  * metadata independently from the construction parameters — the
  * oracle no longer mirrors the decoder.
  *
  * Decoder state is amortized per partition in `extractMeta`, the slot
  * a JNI/codec call would occupy (reference's lazy model loading,
  * core/models/ocr_engine.py:32-71).
  */
object Media {

  final case class MediaMeta(doc_id: String, kind: String, width: Int,
      height: Int, channels: Int, sample_rate: Int, n_bytes: Long)

  // ------------------------------------------------------- byte helpers

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  // ---------------------------------------------------------- PARSERS

  /** PNG IHDR (PNG spec, W3C): width/height big-endian at offsets
    * 16/20; bit depth @24; color type @25 (0 grey, 2 rgb, 3 palette,
    * 4 grey+alpha, 6 rgba).
    */
  private def parsePng(id: String, b: Array[Byte]): MediaMeta = {
    val channels = b(25) match {
      case 0 | 3 => 1
      case 4 => 2
      case 2 => 3
      case 6 => 4
      case _ => 0
    }
    MediaMeta(id, "png", be32(b, 16), be32(b, 20), channels, 0, b.length)
  }

  /** BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): width LE @18, height
    * LE @22 (negative = top-down), bits-per-pixel LE16 @28.
    */
  private def parseBmp(id: String, b: Array[Byte]): MediaMeta =
    MediaMeta(id, "bmp", le32(b, 18), math.abs(le32(b, 22)),
      le16(b, 28) / 8, 0, b.length)

  /** Canonical RIFF/WAVE fmt chunk: channels LE16 @22, sample rate
    * LE32 @24 (holds for the standard 44-byte header layout the JDK
    * and the builder below emit; a fully chunk-walking parser would
    * scan for "fmt " — offsets 12.. hold it in canonical files).
    */
  private def parseWav(id: String, b: Array[Byte]): MediaMeta =
    MediaMeta(id, "wav", 0, 0, le16(b, 22), le32(b, 24), b.length)

  /** Sniff + parse. Unknown/truncated payloads degrade to kind=bin
    * with byte count only — one bad blob must not kill a 10^12-doc
    * job.
    */
  def decode(id: String, bytes: Array[Byte]): MediaMeta = {
    val b = if (bytes == null) Array.empty[Byte] else bytes
    def sig(off: Int, s: String): Boolean =
      b.length >= off + s.length &&
        s.indices.forall(i => b(off + i) == s(i).toByte)
    try {
      if (b.length >= 26 && b.take(8).sameElements(PngSig)) parsePng(id, b)
      else if (b.length >= 30 && sig(0, "BM")) parseBmp(id, b)
      else if (b.length >= 44 && sig(0, "RIFF") && sig(8, "WAVE"))
        parseWav(id, b)
      else MediaMeta(id, "bin", 0, 0, 0, 0, b.length)
    } catch {
      case _: IndexOutOfBoundsException =>
        MediaMeta(id, "bin", 0, 0, 0, 0, b.length)
    }
  }

  // ---------------------------------------------------------- BUILDERS

  private def be32b(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le32b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16b(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)

  /** Spec-correct PNG prefix (signature + IHDR with CRC32) followed by
    * the body bytes as payload. Parsers that only read IHDR (ours, and
    * any standard header sniffer) accept it.
    */
  def pngBytes(width: Int, height: Int, colorType: Int,
      body: Array[Byte]): Array[Byte] = {
    val ihdr = be32b(width) ++ be32b(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val typed = "IHDR".getBytes("US-ASCII") ++ ihdr
    val crc = new java.util.zip.CRC32
    crc.update(typed)
    PngSig ++ be32b(ihdr.length) ++ typed ++ be32b(crc.getValue.toInt) ++ body
  }

  /** Standard 54-byte BMP header (24bpp) + body. */
  def bmpBytes(width: Int, height: Int, body: Array[Byte]): Array[Byte] = {
    val size = 54 + body.length
    "BM".getBytes("US-ASCII") ++ le32b(size) ++ le32b(0) ++ le32b(54) ++
      le32b(40) ++ le32b(width) ++ le32b(height) ++ le16b(1) ++ le16b(24) ++
      le32b(0) ++ le32b(body.length) ++ le32b(2835) ++ le32b(2835) ++
      le32b(0) ++ le32b(0) ++ body
  }

  /** Canonical 44-byte WAV header (PCM16) + body as sample data. */
  def wavBytes(channels: Int, sampleRate: Int,
      body: Array[Byte]): Array[Byte] = {
    val byteRate = sampleRate * channels * 2
    "RIFF".getBytes("US-ASCII") ++ le32b(36 + body.length) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      le32b(16) ++ le16b(1) ++ le16b(channels) ++ le32b(sampleRate) ++
      le32b(byteRate) ++ le16b(channels * 2) ++ le16b(16) ++
      "data".getBytes("US-ASCII") ++ le32b(body.length) ++ body
  }

  // ------------------------------------------------------ Spark surface

  /** Fixture payload builder: emits (doc_id, payload) where payload is
    * REAL container bytes built from per-row parameters (kind rotates
    * png/bmp/wav by doc_id; dims/rate derive from n_chars) with the
    * utf-8 text as body — the stand-in for fetched media bytes keyed
    * by media_ref. REQUIRES doc_id and n_chars columns (the documents
    * table shape); other columns are intentionally dropped.
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(df.columns.contains("doc_id") && df.columns.contains("n_chars"),
      "withPayload expects the documents table shape (doc_id, n_chars)")
    df.select(col("doc_id").cast("long"), col("n_chars").cast("int"),
        encode(col(textCol), "UTF-8"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (did, nc, body) =>
        val payload = (did % 3) match {
          case 0 => pngBytes(nc % 640 + 16, nc % 480 + 16,
            Seq(0, 2, 6)(nc % 3), body)
          case 1 => bmpBytes(nc % 640 + 16, nc % 480 + 16, body)
          case _ => wavBytes(nc % 2 + 1, 8000 + (nc % 4) * 8000, body)
        }
        (did, payload)
      })
      .toDF("doc_id", "payload")
  }

  /** Decode metadata from binary payloads — typed mapPartitions so
    * decoder state is initialized once per partition.
    */
  def extractMeta(df: DataFrame, idCol: String,
      payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // real decoder/codec init would happen here, once per partition
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }
}
