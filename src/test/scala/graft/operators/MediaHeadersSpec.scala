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

  test("WAV make → parse round-trips across rates/channels/frame counts") {
    for {
      rate <- Seq(8000, 22050, 44100, 48000)
      ch <- Seq(1, 2)
      n <- Seq(0, 1, 199, 4096)
    } assert(MediaHeaders.parseWav(MediaHeaders.makeWav(rate, ch, 16, n))
      == Some((rate, ch, 16, n)), s"$rate Hz ${ch}ch n=$n")
  }

  test("WAV parse walks chunks: an extra LIST chunk before fmt/data still parses") {
    val base = MediaHeaders.makeWav(16000, 2, 16, 8)
    // Splice an 8-byte-payload LIST chunk between WAVE and fmt, fixing
    // the RIFF size field — real encoders emit metadata chunks there.
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ "INFOjunk".getBytes("US-ASCII")
    val spliced = base.take(12) ++ list ++ base.drop(12)
    val size = spliced.length - 8
    spliced(4) = size.toByte; spliced(5) = (size >>> 8).toByte
    spliced(6) = (size >>> 16).toByte; spliced(7) = (size >>> 24).toByte
    assert(MediaHeaders.parseWav(spliced) == Some((16000, 2, 16, 8)))
  }

  test("WAV parse rejects inconsistent payloads") {
    val good = MediaHeaders.makeWav(44100, 1, 16, 10)
    assert(MediaHeaders.parseWav(good.dropRight(1)).isEmpty, "truncated data")
    val nonPcm = good.clone
    nonPcm(20) = 3 // format tag = IEEE float
    assert(MediaHeaders.parseWav(nonPcm).isEmpty, "non-PCM accepted")
    assert(MediaHeaders.parseWav("RIFF text that is not audio".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parseWav(Array.emptyByteArray).isEmpty)
  }

  test("MP4 make → parse round-trips across dimension/timescale boundaries") {
    for {
      (w, h) <- Seq((1, 1), (1920, 1080), (7680, 4320), (1, 65535))
      ts <- Seq(600, 90000)
      d <- Seq(0, 1, 123456789)
    } assert(MediaHeaders.parseMp4(MediaHeaders.makeMp4(w, h, ts, d))
      == Some((w, h, ts, d)), s"${w}x$h ts=$ts d=$d")
  }

  test("MP4 box walk is strict: sizes must tile, versions must be v0, no garbage reads") {
    val good = MediaHeaders.makeMp4(640, 480, 1000, 5000)
    assert(MediaHeaders.parseMp4(good.dropRight(1)).isEmpty, "truncated moov")
    assert(MediaHeaders.parseMp4(good.take(20)).isEmpty, "ftyp only — no moov")
    // Corrupt the moov size so boxes stop tiling the file exactly.
    val badSize = good.clone
    badSize(20 + 3) = (badSize(20 + 3) + 1).toByte // moov is the box after the 20-byte ftyp
    assert(MediaHeaders.parseMp4(badSize).isEmpty, "non-tiling box sizes accepted")
    // A v1 tkhd (64-bit times, different offsets) must be rejected, not
    // misread as v0 garbage dimensions.
    val v1 = good.clone
    val tkhdOff = {
      // ftyp(20) + moov hdr(8) + mvhd(108) + trak hdr(8) → tkhd box
      20 + 8 + 108 + 8
    }
    assert(new String(v1, tkhdOff + 4, 4, "US-ASCII") == "tkhd", "fixture drifted")
    v1(tkhdOff + 8) = 1 // version byte
    assert(MediaHeaders.parseMp4(v1).isEmpty, "v1 tkhd misread as v0")
    assert(MediaHeaders.parseMp4("ftypisomtext that is not a movie".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parseMp4(Array.emptyByteArray).isEmpty)
    // A hostile size near 2^31 must fail CLEANLY: an addition-form
    // bounds check (`off + size > length`) overflows negative, slips
    // past, and crashes the walk out of bounds — this seam parses real
    // (untrusted) containers, so the contract is None, not a throw.
    val huge = good.take(20) ++
      Array(0x7f, 0xff, 0xff, 0xf8).map(_.toByte) ++ "moov".getBytes("US-ASCII")
    assert(MediaHeaders.parseMp4(huge).isEmpty, "overflowing box size accepted")
    // Exact tiling must hold INSIDE moov too, not just at top level:
    // grow moov's size by 4 and append 4 junk bytes — the file still
    // tiles at top level, but moov's children no longer tile moov.
    val padded = good.clone ++ Array[Byte](0, 0, 0, 0)
    val msz = 216 + 4 // moov box size in the fixture, plus the pad
    padded(20) = (msz >>> 24).toByte; padded(21) = (msz >>> 16).toByte
    padded(22) = (msz >>> 8).toByte; padded(23) = msz.toByte
    assert(MediaHeaders.parseMp4(padded).isEmpty,
      "trailing junk inside moov accepted — children must tile exactly")
  }
}
