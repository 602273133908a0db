package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level contract of the real header codec: round-trips across
  * formats and dimension boundaries, and strict enough validation that
  * opaque text can't false-positive into the decode path (m2's stub
  * fallback depends on that). */
class MediaHeadersSpec extends AnyFunSuite {

  test("make → parse round-trips every format across boundary dimensions") {
    for {
      fmt <- Seq("png", "bmp", "gif", "jpeg")
      (w, h) <- Seq((1, 1), (800, 600), (1024, 1), (65535, 65535))
    } assert(MediaHeaders.parse(MediaHeaders.make(fmt, w, h)) == Some((fmt, w, h)),
      s"$fmt ${w}x$h")
  }

  test("JPEG parse walks markers and reads height-before-width in SOF") {
    val b = MediaHeaders.make("jpeg", 640, 480)
    assert(MediaHeaders.parse(b) == Some(("jpeg", 640, 480)))
    // Truncated right after the APP0 segment: no SOF → None, not garbage.
    assert(MediaHeaders.parse(b.take(20)).isEmpty)
  }

  test("PNG parse requires a correct IHDR CRC") {
    val b = MediaHeaders.make("png", 10, 20)
    b(16) = (b(16) ^ 1).toByte // corrupt the width without fixing the CRC
    assert(MediaHeaders.parse(b).isEmpty)
  }

  test("text payloads never false-positive") {
    val texts = Seq(
      "BM prefix but the size field is text",   // BMP magic, wrong size
      "GIF punchline that is not an image",     // not the 6-byte magic
      "GIF89a mentioned in prose, no trailer",  // magic but no 0x3B end
      "plain document text with nothing special",
      "")
    texts.foreach { t =>
      assert(MediaHeaders.parse(t.getBytes("UTF-8")).isEmpty, t)
    }
  }

  test("GIF87a parses too") {
    val b = MediaHeaders.make("gif", 320, 200)
    "GIF87a".getBytes("US-ASCII").copyToArray(b)
    assert(MediaHeaders.parse(b) == Some(("gif", 320, 200)))
  }
}
