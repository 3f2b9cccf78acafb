package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.scalatest.funsuite.AnyFunSuite

/** The header parsers are validated against REAL files produced by the
  * JDK's own encoders (javax.imageio, javax.sound.sampled) — no
  * external codec libraries involved — plus builder round-trips and
  * junk-tolerance.
  */
class MediaSpec extends AnyFunSuite {
  System.setProperty("java.awt.headless", "true")

  test("PNG parser reads ImageIO-encoded files") {
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val m = Media.decode("x", bos.toByteArray)
    assert(m.kind == "png" && m.width == 17 && m.height == 9)
    assert(m.channels == 3) // TYPE_INT_RGB -> color type 2
  }

  test("BMP parser reads ImageIO-encoded files") {
    val img = new java.awt.image.BufferedImage(33, 21,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val m = Media.decode("x", bos.toByteArray)
    assert(m.kind == "bmp" && m.width == 33 && m.height == 21)
    assert(m.channels == 3)
  }

  test("WAV parser reads AudioSystem-encoded files") {
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val frames = 16
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(new Array[Byte](frames * fmt.getFrameSize)),
      fmt, frames.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val m = Media.decode("x", bos.toByteArray)
    assert(m.kind == "wav" && m.channels == 2 && m.sample_rate == 16000)
  }

  test("JPEG parser reads ImageIO-encoded files (marker scan past APPn)") {
    for ((typ, ch) <- Seq(
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR -> 3,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY -> 1)) {
      val img = new java.awt.image.BufferedImage(41, 23, typ)
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      val m = Media.decode("x", bos.toByteArray)
      assert(m.kind == "jpeg" && m.width == 41 && m.height == 23 &&
        m.channels == ch, m)
    }
  }

  test("TIFF parser reads ImageIO-encoded files (both byte orders ours+JDK)") {
    val img = new java.awt.image.BufferedImage(29, 13,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val bos = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val m = Media.decode("x", bos.toByteArray)
    assert(m.kind == "tiff" && m.width == 29 && m.height == 13 &&
      m.channels == 3, m)
  }

  test("WebP parser: VP8X builder round-trip plus spec-layout VP8/VP8L") {
    val body = "payload".getBytes("UTF-8")
    val x = Media.decode("x", Media.webpBytes(320, 240, alpha = true, body))
    assert(x.kind == "webp" && x.width == 320 && x.height == 240 &&
      x.channels == 4 && x.n_bytes == 30L + body.length, x)
    val x3 = Media.decode("x", Media.webpBytes(16, 16, alpha = false, body))
    assert(x3.channels == 3)
    // VP8 lossy: frame tag + sync 9D 01 2A + 14-bit dims (RFC-described
    // public layout), hand-laid bytes
    def rw(tag: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WEBP".getBytes ++
        tag.getBytes ++ Array[Byte]((payload.length & 0xFF).toByte, 0, 0, 0) ++
        payload
    val vp8 = rw("VP8 ", Array[Byte](0, 0, 0, 0x9D.toByte, 0x01, 0x2A,
      (500 & 0xFF).toByte, (500 >> 8).toByte,
      (300 & 0xFF).toByte, (300 >> 8).toByte))
    val v = Media.decode("v", vp8)
    assert(v.kind == "webp" && v.width == 500 && v.height == 300 &&
      v.channels == 3, v)
    // VP8L lossless: sig 0x2F, then LE32 of (w-1) | (h-1)<<14 | alpha<<28
    val bits = (100 - 1) | ((70 - 1) << 14) | (1 << 28)
    val vp8l = rw("VP8L", Array[Byte](0x2F,
      (bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
      ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte))
    val l = Media.decode("l", vp8l)
    assert(l.kind == "webp" && l.width == 100 && l.height == 70 &&
      l.channels == 4, l)
  }

  test("JPEG parser skips T.81 fill bytes before markers") {
    val base = Media.jpegBytes(50, 40, 3, "b".getBytes)
    // inject two 0xFF fill bytes between SOI and the APP0 marker
    val padded = base.take(2) ++ Array[Byte](0xFF.toByte, 0xFF.toByte) ++
      base.drop(2)
    val m = Media.decode("p", padded)
    assert(m.kind == "jpeg" && m.width == 50 && m.height == 40, m)
  }

  test("builders round-trip through the parsers") {
    val body = "hello media".getBytes("UTF-8")
    val p = Media.decode("p", Media.pngBytes(640, 480, 6, body))
    assert(p.kind == "png" && p.width == 640 && p.height == 480 &&
      p.channels == 4 && p.n_bytes == 33L + body.length)
    val b = Media.decode("b", Media.bmpBytes(12, 7, body))
    assert(b.kind == "bmp" && b.width == 12 && b.height == 7 &&
      b.channels == 3 && b.n_bytes == 54L + body.length)
    val w = Media.decode("w", Media.wavBytes(1, 24000, body))
    assert(w.kind == "wav" && w.channels == 1 && w.sample_rate == 24000 &&
      w.n_bytes == 44L + body.length)
    val j = Media.decode("j", Media.jpegBytes(200, 100, 3, body))
    assert(j.kind == "jpeg" && j.width == 200 && j.height == 100 &&
      j.channels == 3 && j.n_bytes == 39L + body.length)
    val j1 = Media.decode("j", Media.jpegBytes(8, 8, 1, body))
    assert(j1.channels == 1 && j1.n_bytes == 33L + body.length)
    val t = Media.decode("t", Media.tiffBytes(77, 55, 4, body))
    assert(t.kind == "tiff" && t.width == 77 && t.height == 55 &&
      t.channels == 4 && t.n_bytes == 50L + body.length)
  }

  test("junk and truncated payloads degrade to kind=bin, never throw") {
    assert(Media.decode("e", Array.empty).kind == "bin")
    assert(Media.decode("n", null).kind == "bin")
    assert(Media.decode("j", "not a container".getBytes).kind == "bin")
    // a PNG signature with a truncated header must not crash
    val trunc = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0)
    assert(Media.decode("t", trunc).kind == "bin")
  }

  test("decode is total: random bytes and truncated real headers never throw") {
    // one bad blob must not kill a 10^12-doc job — fuzz every parser's
    // dispatch path with (a) fully random bytes, (b) every real header
    // truncated at every length (exercises the IndexOutOfBounds guard
    // in each parser, including the new jpeg/tiff/webp ones)
    val rnd = new java.util.Random(7)
    (0 until 2000).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(b)
      Media.decode(s"r$i", b) // must not throw
    }
    val body = "x".getBytes
    val full = Seq(
      Media.pngBytes(10, 10, 2, body), Media.bmpBytes(10, 10, body),
      Media.wavBytes(1, 8000, body), Media.jpegBytes(10, 10, 3, body),
      Media.tiffBytes(10, 10, 3, body),
      Media.webpBytes(10, 10, alpha = false, body))
    for (f <- full; n <- 0 to f.length)
      Media.decode("t", f.take(n)) // every truncation must not throw
    // and corrupted marker/IFD fields inside valid signatures
    for (f <- full; _ <- 0 until 50) {
      val c = f.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Media.decode("c", c)
    }
  }

  test("fitDims: exact integer aspect-fit") {
    assert(Media.fitDims(32, 20, 64, 64) == (32, 20)) // already fits
    assert(Media.fitDims(320, 200, 64, 64) == (64, 40)) // width limits
    assert(Media.fitDims(200, 320, 64, 64) == (40, 64)) // height limits
    assert(Media.fitDims(64, 64, 64, 64) == (64, 64)) // boundary
    assert(Media.fitDims(1000, 10, 64, 64) == (64, 1)) // clamp to 1
    assert(Media.fitDims(100, 100, 64, 32) == (32, 32)) // uneven box
  }

  test("resize rebuilds a container the parsers re-read at the new dims") {
    val body = Array.tabulate(4000)(_.toByte)
    for ((bytes, kind, ch) <- Seq(
        (Media.pngBytes(320, 200, 2, body), "png", 3),
        (Media.bmpBytes(320, 200, body), "bmp", 3),
        (Media.jpegBytes(320, 200, 3, body), "jpeg", 3),
        (Media.tiffBytes(320, 200, 3, body), "tiff", 3),
        (Media.webpBytes(320, 200, alpha = true, body), "webp", 4))) {
      val r = Media.resizeOne(bytes, 64, 64)
      val m = Media.decode("r", r)
      assert((m.kind, m.width, m.height) == (kind, 64, 40), kind)
      assert(m.channels == ch, s"$kind channels survive the rebuild")
      assert(r.length < bytes.length, s"$kind decimated body shrinks")
    }
    // pass-throughs are BYTE-identical: fitting image, audio, junk
    val fits = Media.pngBytes(32, 20, 2, body)
    assert(Media.resizeOne(fits, 64, 64) eq fits)
    val wav = Media.wavBytes(1, 8000, body)
    assert(Media.resizeOne(wav, 64, 64) eq wav)
    val junk = Array[Byte](1, 2, 3)
    assert(Media.resizeOne(junk, 64, 64) eq junk)
  }

  test("imageio resize preserves pixel content on a known gradient") {
    import java.awt.image.BufferedImage
    val (w, h) = (128, 64)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        ((x * 255 / (w - 1)) << 16) | ((y * 255 / (h - 1)) << 8) | 128)
    for ((fmt, tol) <- Seq(("png", 8), ("bmp", 8), ("jpeg", 24))) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      val resized = Media.resizeOne(bos.toByteArray, 32, 32)
      val m = Media.decode("g", resized)
      assert((m.kind, m.width, m.height) == (fmt, 32, 16), fmt)
      val out = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(resized))
      assert(out.getWidth == 32 && out.getHeight == 16, fmt)
      // interior pixels must track the linear gradients: red follows x,
      // green follows y, blue is constant — a decimation stub (or any
      // body-shuffling fake) cannot satisfy this
      for (y <- 1 until 15; x <- 1 until 31) {
        val rgb = out.getRGB(x, y)
        val (r, g, b) = ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF)
        assert(math.abs(r - x * 4 * 255.0 / (w - 1)) <= tol,
          s"$fmt red at ($x,$y)=$r")
        assert(math.abs(g - y * 4 * 255.0 / (h - 1)) <= tol,
          s"$fmt green at ($x,$y)=$g")
        assert(math.abs(b - 128) <= tol, s"$fmt blue at ($x,$y)=$b")
      }
    }
  }

  test("tiff strip reader: real resample preserves a known gradient") {
    val (w, h, ch) = (128, 64, 3)
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * ch
      px(o) = (x * 255 / (w - 1)).toByte     // red follows x
      px(o + 1) = (y * 255 / (h - 1)).toByte // green follows y
      px(o + 2) = 128.toByte                 // blue constant
    }
    val tiff = Media.tiffRasterBytes(w, h, ch, px)
    // the builder emits a decodable image: our own reader inverts it
    assert(Media.tiffDecodeRaster(tiff).map(t => (t._1, t._2, t._3))
      .contains((w, h, ch)))
    // and the header parsers still read it (kind/dims/channels)
    val meta = Media.decode("t", tiff)
    assert((meta.kind, meta.width, meta.height, meta.channels) ==
      ("tiff", w, h, ch))
    val resized = Media.resizeOne(tiff, 32, 32)
    val m = Media.decode("t", resized)
    assert((m.kind, m.width, m.height) == ("tiff", 32, 16))
    val Some((rw, rh, rch, out)) = Media.tiffDecodeRaster(resized)
    assert((rw, rh, rch) == (32, 16, 3))
    // box-filter output must track the linear gradients — a decimation
    // stub (or any byte-shuffling fake) cannot satisfy this
    for (y <- 0 until 16; x <- 0 until 32) {
      val o = (y * 32 + x) * 3
      val (r, g, b) = (out(o) & 0xFF, out(o + 1) & 0xFF, out(o + 2) & 0xFF)
      assert(math.abs(r - x * 4 * 255.0 / (w - 1)) <= 8, s"red at ($x,$y)=$r")
      assert(math.abs(g - y * 4 * 255.0 / (h - 1)) <= 8, s"green at ($x,$y)=$g")
      assert(b == 128, s"blue at ($x,$y)=$b")
    }
    // greyscale single-strip round trip (inline BitsPerSample branch)
    val grey = Array.tabulate(16 * 8)(i => (i % 251).toByte)
    val gTiff = Media.tiffRasterBytes(16, 8, 1, grey)
    assert(Media.tiffDecodeRaster(gTiff).map(_._4.toSeq)
      .contains(grey.toSeq))
    // the m1/m2 FIXTURE tiff (header + opaque body, no strip tags) must
    // keep taking the rebuild stub — m2's hash depends on it
    val fixture = Media.tiffBytes(100, 80, 3, Array.fill(999)(7.toByte))
    assert(Media.tiffDecodeRaster(fixture).isEmpty)
    val stub = Media.resizeOne(fixture, 64, 64)
    assert(Media.decode("s", stub).width == 64)
  }

  test("vp8l codec: lossless round-trip, real resample, subset bails") {
    // rgb gradient: the builder emits a real VP8L stream, our decoder
    // inverts it EXACTLY (lossless), and the header parsers read it
    val (w, h, ch) = (128, 64, 3)
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * ch
      px(o) = (x * 255 / (w - 1)).toByte     // red follows x
      px(o + 1) = (y * 255 / (h - 1)).toByte // green follows y
      px(o + 2) = 128.toByte                 // blue constant
    }
    val webp = Media.webpRasterBytes(w, h, ch, px)
    val meta = Media.decode("w", webp)
    assert((meta.kind, meta.width, meta.height, meta.channels) ==
      ("webp", w, h, 3))
    assert(Media.webpDecodeRaster(webp).map(t =>
      (t._1, t._2, t._3, t._4.toSeq)).contains((w, h, ch, px.toSeq)))
    // resize takes the real raster path: box-filter output must track
    // the gradients — a decimation stub cannot satisfy this
    val resized = Media.resizeOne(webp, 32, 32)
    val m = Media.decode("w", resized)
    assert((m.kind, m.width, m.height) == ("webp", 32, 16))
    val Some((rw, rh, rch, out)) = Media.webpDecodeRaster(resized)
    assert((rw, rh, rch) == (32, 16, 3))
    for (y <- 0 until 16; x <- 0 until 32) {
      val o = (y * 32 + x) * 3
      val (r, g, b) = (out(o) & 0xFF, out(o + 1) & 0xFF, out(o + 2) & 0xFF)
      assert(math.abs(r - x * 4 * 255.0 / (w - 1)) <= 8, s"red at ($x,$y)=$r")
      assert(math.abs(g - y * 4 * 255.0 / (h - 1)) <= 8, s"green at ($x,$y)=$g")
      assert(b == 128, s"blue at ($x,$y)=$b")
    }
    // rgba: varying alpha rides the fourth normal code, exact round-trip
    val rgba = Array.tabulate(16 * 8 * 4)(i => ((i * 37 + 11) % 256).toByte)
    val webp4 = Media.webpRasterBytes(16, 8, 4, rgba)
    assert(Media.decode("a", webp4).channels == 4)
    assert(Media.webpDecodeRaster(webp4).map(_._4.toSeq)
      .contains(rgba.toSeq))
    // grey input: encoded r=g=b, decodes as an rgb raster (the format
    // is argb — real resizes normalize pixel format)
    val grey = Array.tabulate(16 * 8)(i => (i % 251).toByte)
    val webpG = Media.webpRasterBytes(16, 8, 1, grey)
    val Some((_, _, gch, gpx)) = Media.webpDecodeRaster(webpG)
    assert(gch == 3)
    assert((0 until 16 * 8).forall(i =>
      gpx(i * 3) == grey(i) && gpx(i * 3 + 1) == grey(i) &&
        gpx(i * 3 + 2) == grey(i)))
    // the m1/m2 FIXTURE webp (VP8X header + opaque body, no VP8L chunk)
    // must keep taking the rebuild stub — m2's hash depends on it
    val fixture = Media.webpBytes(100, 80, alpha = false,
      Array.fill(999)(7.toByte))
    assert(Media.webpDecodeRaster(fixture).isEmpty)
    val stub = Media.resizeOne(fixture, 64, 64)
    assert(Media.decode("s", stub).width == 64)
    // a forged VP8L header claiming the 16384x16384 maximum (268M px)
    // must bail on the pixel budget BEFORE allocating the raster
    val forged = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](14, 0, 0, 0) ++
      "WEBP".getBytes("US-ASCII") ++ "VP8L".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++
      Array[Byte](0x2F, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x0F, 0x00)
    assert(Media.webpDecodeRaster(forged).isEmpty)
  }

  test("raster budget gate keeps forged huge headers out of imageio") {
    // ImageIO allocates the FULL claimed raster before scaling, and an
    // OutOfMemoryError bypasses the Exception soft-fail — so the gate
    // must reject on the header dims alone, before any decode
    assert(Media.rasterEligible("png", 4000, 4000))
    assert(!Media.rasterEligible("png", 30000, 30000))
    assert(!Media.rasterEligible("jpeg", Int.MaxValue, Int.MaxValue))
    assert(!Media.rasterEligible("tiff", 10, 10)) // no JDK codec
    // a decodable-kind payload whose header claims 9e8 pixels must take
    // the rebuild stub: completes, resized dims parse back
    val forged = Media.pngBytes(30000, 30000, 2, Array.fill(96)(7.toByte))
    val out = Media.resizeOne(forged, 64, 64)
    assert(Media.decode("f", out).width == 64)
  }

  test("resize/frameSample/byteFeatures honor the soft-fail contract") {
    // corrupt header claiming a ~2^24 square canvas: the area ratio is
    // ~2^48/2^12, whose unclamped Long->Int narrowing wraps to 0 and
    // divides by zero — must degrade gracefully instead
    val huge = Media.webpBytes(16777215, 16777215, alpha = false,
      Array.fill(64)(1.toByte))
    val r = Media.resizeOne(huge, 64, 64)
    assert(Media.decode("h", r).width == 64)
    assert(Media.resizeOne(null, 64, 64) == null)
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // string ids and a null payload are both supported shapes
    val df = Seq(("doc-a", null: Array[Byte]), ("doc-b", Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    assert(Media.frameSample(df, "doc_id", "payload").count() == 1)
    val f = Media.byteFeatures(df, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(f(0).getSeq[Float](1).forall(_ == 0f)) // null → zero vector
    assert(Media.resize(df, "doc_id", "payload", 64, 64).count() == 2)
  }

  test("frameSample grid: bounded frames, correct slices, everyK stride") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val bytes = Array.tabulate(2500)(_.toByte) // 3 frames of 1024
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val rows = Media.frameSample(df, "doc_id", "payload",
        frameBytes = 1024, everyK = 2)
      .orderBy("frame_idx")
      .collect()
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2)) // frames 0 and 2 of 3
    assert(rows(0).getAs[Array[Byte]]("frame").length == 1024)
    assert(rows(1).getAs[Array[Byte]]("frame").length == 2500 - 2048)
    assert(rows(1).getAs[Array[Byte]]("frame")(0) == bytes(2048))
  }

  test("byteFeatures: normalized histogram that feeds the similarity ops") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq(
        (1L, Array.tabulate(256)(_.toByte)), // uniform high nibbles
        (2L, Array.fill(100)(0x10.toByte))   // all mass in bin 1
      ).toDF("doc_id", "payload")
    val feats = Media.byteFeatures(df, "doc_id", "payload")
    val rows = feats.orderBy("doc_id").collect()
    val f1 = rows(0).getSeq[Float](1)
    assert(f1.length == 16 && f1.forall(v => math.abs(v - 1f / 16) < 1e-6))
    val f2 = rows(1).getSeq[Float](1)
    assert(math.abs(f2(1) - 1f) < 1e-6 && math.abs(f2.sum - 1f) < 1e-5)
    // composes with the ANN operators directly
    val top = Similarity.bruteForceTopK(
      feats.withColumnRenamed("feature", "embedding")
        .withColumnRenamed("doc_id", "vec_id"),
      feats.limit(1).withColumnRenamed("feature", "embedding")
        .withColumnRenamed("doc_id", "vec_id"),
      "embedding", "vec_id", k = 1)
    assert(top.count() == 1)
  }

  test("decode-exactly guards: odd TIFF tag types, VP8X-vs-VP8L fit dims") {
    // a strip tag retyped to RATIONAL(5) has 8-byte elements; guessing
    // 4 would read offsets/counts at the wrong stride into a byte-valid
    // but scrambled raster — any non-SHORT/LONG type must reject the
    // entry and take the rebuild stub
    val tiff = Media.tiffRasterBytes(16, 8, 3,
      Array.tabulate(16 * 8 * 3)(_.toByte))
    assert(Media.tiffDecodeRaster(tiff).nonEmpty)
    val n = (tiff(8) & 0xFF) | ((tiff(9) & 0xFF) << 8)
    val patched = tiff.clone()
    val hit = (0 until n).exists { k =>
      val e = 10 + k * 12
      val tag = (patched(e) & 0xFF) | ((patched(e + 1) & 0xFF) << 8)
      if (tag == 279) { // StripByteCounts
        patched(e + 2) = 5; patched(e + 3) = 0
        true
      } else false
    }
    assert(hit)
    assert(Media.tiffDecodeRaster(patched).isEmpty)
    assert(Media.decode("s", Media.resizeOne(patched, 8, 8)).kind == "tiff")

    // a VP8X canvas of 10^6 x 16 (INSIDE the pixel budget) wrapping a
    // small real VP8L stream: the fit target (20000 wide) exceeds the
    // 2^14 VP8L dim cap, so re-encoding the decoded raster would throw
    // out of webpRasterBytes' require — the resize must take the
    // rebuild stub instead of killing the task
    val inner = Media.webpRasterBytes(16, 8, 3,
      Array.fill(16 * 8 * 3)(9.toByte))
    val wide = Media.webpBytes(1000000, 16, alpha = false, inner.drop(12))
    assert(Media.decode("w", wide).width == 1000000)
    assert(Media.webpDecodeRaster(wide).nonEmpty) // the stream decodes fine
    val out = Media.resizeOne(wide, 20000, 20000) // must not throw
    assert(Media.decode("w", out).width == 20000)
  }
}
