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
  }

  test("junk and truncated payloads degrade to kind=bin, never throw") {
    assert(Media.decode("e", Array.empty).kind == "bin")
    assert(Media.decode("n", null).kind == "bin")
    assert(Media.decode("j", "not a container".getBytes).kind == "bin")
    // a PNG signature with a truncated header must not crash
    val trunc = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A, 0, 0)
    assert(Media.decode("t", trunc).kind == "bin")
  }
}
