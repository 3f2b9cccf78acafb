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
}
