package graft.operators

import graft.SparkSpecBase

/** Behavioral pins for m7 (perceptual-hash media near-dup pairs).
  *
  * The property under test is LOCALITY — the one thing a perceptual
  * hash must have and a cryptographic hash must not: a small payload
  * perturbation moves one grid cell's average and flips at most that
  * cell's adjacent comparison bits, while an unrelated payload shares
  * no band at all. Geometry is forged so every cell average is exact:
  * texts of 128 chars over an 8×8 grid put exactly two characters in
  * each cell, so cell k's value is hand-derivable and each dHash bit
  * is a known comparison.
  */
class PhashSpec extends SparkSpecBase {

  test("m7: one-cell perturbation → Hamming 1 pair; unrelated payload shares no band") {
    import spark.implicits._
    // Cell k of doc 0 averages 40+k (two chars of code 40+k): every
    // right-neighbor comparison is GREATER → all 56 bits set. Doc 3
    // lowers ONLY cell 1 to 40 (chars 3-4: ')' → '('): bit 0's
    // comparison (cell1 > cell0) flips to equal-false, bit 1 still
    // compares 42 > 40 — exactly one bit differs. Doc 6 descends
    // (cell k = 103−k): every comparison false, hash 0 — 56 bits from
    // doc 0, no shared nibble band (15s vs 0s), so it must not even
    // surface as a candidate. Doc 9 is shorter than one pixel per cell
    // and must be excluded outright. All ids ≡ 0 (mod 3) → same
    // media_type, so the type block isn't what separates them.
    def gridText(cell: Int => Int): String =
      (0 until 64).flatMap(k => Seq(cell(k).toChar, cell(k).toChar)).mkString
    val docs = Seq(
      0L -> gridText(k => 40 + k),
      3L -> gridText(k => if (k == 1) 40 else 40 + k),
      6L -> gridText(k => 103 - k),
      9L -> "too-short")
    val dir = java.nio.file.Files.createTempDirectory("graft-m7").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq((0L, 3L, "image", 1)), got.mkString(","))
  }

  test("m7: non-ASCII payloads hash under code-point semantics (oracle equivalence)") {
    import spark.implicits._
    // The DuckDB oracle reads the stream as CODE POINTS (ord/length);
    // the Spark body reads it as split('') + ascii. These agree only if
    // Spark's pair is code-point based for multi-byte characters too —
    // asserted here by predicting the exact hash geometry from
    // code-point arithmetic on 2-byte (U+0100 Latin Extended) and
    // 3-byte (U+4E00 CJK) payloads: same one-cell-perturbation forge as
    // the ASCII case, so a code-unit or byte-level divergence anywhere
    // (length gate, slice boundaries, per-char value) breaks the
    // predicted single-bit pair. Supplementary characters (outside the
    // BMP) are out of contract — the corpus generator emits BMP text.
    def gridText(baseCp: Int)(cell: Int => Int): String =
      (0 until 64).flatMap(k =>
        Character.toChars(baseCp + cell(k)).toSeq ++
          Character.toChars(baseCp + cell(k)).toSeq).mkString
    for (base <- Seq(0x100, 0x4E00)) {
      val docs = Seq(
        0L -> gridText(base)(k => 40 + k),
        3L -> gridText(base)(k => if (k == 1) 40 else 40 + k))
      val dir = java.nio.file.Files.createTempDirectory("graft-m7nb").toString
      docs.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = Multimodal.phashPairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
      assert(got.toSeq == Seq((0L, 3L, "image", 1)),
        s"base U+${base.toHexString}: ${got.mkString(",")}")
    }
  }

  test("phash56 pins code-point semantics on supplementary-plane payloads") {
    // Out of the ORACLE contract (the corpus generator emits BMP text,
    // where code points == UTF-16 units == the oracle's ord() stream) —
    // this pins the ENGINE's intended semantics beyond it: the pixel
    // stream is String.codePoints, so a U+10400-block character is ONE
    // pixel. A reimplementation via split("")/per-char ascii (the
    // pre-r14 chain) would tear each surrogate pair into two broken
    // pixels and fail both asserts.
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.graft.GraftHash
    def suppGrid(cell: Int => Int): String =
      (0 until 64).flatMap(k =>
        Character.toChars(0x10400 + cell(k)).toSeq ++
          Character.toChars(0x10400 + cell(k)).toSeq).mkString
    val base = suppGrid(k => 40 + k) // ascending cells → all 56 bits set
    assert(base.length == 256 && base.codePointCount(0, base.length) == 128)
    val h = GraftHash.phash56(UTF8String.fromString(base), 8)
    assert(h == GraftHash.dHash56(base.codePoints().toArray, 8))
    assert(h == (1L << 56) - 1)
    // one-cell perturbation keeps dHash locality in code-point space
    val pert = GraftHash.phash56(
      UTF8String.fromString(suppGrid(k => if (k == 1) 40 else 40 + k)), 8)
    assert(java.lang.Long.bitCount(h ^ pert) == 1)
  }

  test("m7: saturated band buckets are skipped; unsaturated pairs survive") {
    import spark.implicits._
    // 1100 byte-identical payloads share every band — each bucket holds
    // 1100 > PhashBandCap members, pure key-space saturation (byte
    // clones are exact-dedup's job, d1/m1, not a perceptual hash's) —
    // so NO pair among them may surface; the small locality pair from
    // the first test (buckets of size ≤ 2) must still pair at
    // Hamming 1. Pins the cap fires on saturation only, on both
    // engines' mirrored arithmetic (the d14 df-cap rule).
    assert(Multimodal.PhashBandCap < 1100)
    def gridText(cell: Int => Int): String =
      (0 until 64).flatMap(k => Seq(cell(k).toChar, cell(k).toChar)).mkString
    val clones = (0 until 1100).map(i => (100L + 3 * i) -> gridText(k => 103 - k))
    val docs = Seq(
      0L -> gridText(k => 40 + k),
      3L -> gridText(k => if (k == 1) 40 else 40 + k)) ++ clones
    val dir = java.nio.file.Files.createTempDirectory("graft-m7cap").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq((0L, 3L, "image", 1)),
      s"expected only the unsaturated pair: ${got.take(5).mkString(",")} (${got.length} rows)")
  }

  test("m7 seam: the JVM hash path is bit-identical to the op's codegen'd form") {
    import spark.implicits._
    // The production decode path (phashPartition) must reproduce the
    // registered op's hashes EXACTLY on stub (text) payloads — that
    // equality is what makes a real pixel decoder a drop-in: it changes
    // WHAT is hashed, never HOW. Forged payloads cover ASCII, 2-byte
    // and 3-byte code points, ragged lengths (cells of unequal width —
    // the floor-boundary arithmetic), and the length gate.
    def gridText(baseCp: Int)(cell: Int => Int): String =
      (0 until 64).flatMap(k =>
        Character.toChars(baseCp + cell(k)).toSeq ++
          Character.toChars(baseCp + cell(k)).toSeq).mkString
    val docs = Seq(
      0L -> gridText(0x28)(k => 40 + k),
      3L -> gridText(0x100)(k => if (k == 1) 40 else 40 + k),
      6L -> gridText(0x4E00)(k => 103 - k),
      9L -> (0 until 157).map(i => ('a' + i % 26).toChar).mkString, // ragged: 157 % 64 != 0
      12L -> "short-gated",
      15L -> (null: String)) // null payload: dropped on BOTH paths
    val dir = java.nio.file.Files.createTempDirectory("graft-m7jvm").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val sql = Multimodal.phashTable(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val jvm = Multimodal.mediaTable(spark, dir)
      .as[Multimodal.MediaRaw].mapPartitions(Multimodal.phashPartition)
      .collect().toSet
    assert(sql.nonEmpty && sql == jvm, s"sql=$sql\njvm=$jvm")
    assert(!jvm.exists(_._1 == 12L), "length gate diverged")
    assert(!jvm.exists(_._1 == 15L), "null-payload gate diverged")
  }

  test("m7 seam: real BMP/PNG pixels decode exactly and hash with locality") {
    // The same hand-derivable 64-cell geometry as the text forges, now
    // as REAL image payloads: a 16×8 grayscale image whose row-major
    // stream puts two pixels in each dHash cell. The decoders must
    // recover the pixel grid exactly (BMP through the stride-padded
    // bottom-up layout; PNG through inflate + each of the five scanline
    // filters), both containers must hash to the SAME ph
    // (container-independence), and a one-cell perturbation must land
    // at Hamming exactly 1 — the locality property over real pixels.
    val w = 16; val h = 8
    val grid = (0 until 64).flatMap(k => Seq(40 + k, 40 + k)).toArray
    val bmp = MediaHeaders.makeBmp24(w, h, grid)
    assert(MediaHeaders.decodeGray(bmp).exists {
      case (dw, dh, pix) => dw == w && dh == h && pix.sameElements(grid) },
      "BMP pixel round-trip failed")
    for (f <- 0 to 4) {
      val png = MediaHeaders.makeGrayPng(w, h, grid, filter = f)
      assert(MediaHeaders.decodeGray(png).exists {
        case (dw, dh, pix) => dw == w && dh == h && pix.sameElements(grid) },
        s"PNG filter $f pixel round-trip failed")
    }
    def ph(payload: Array[Byte]): Long =
      Multimodal.phashPartition(Iterator(
        Multimodal.MediaRaw(0L, "image", payload))).next()._3
    val phBmp = ph(bmp)
    assert(phBmp == ph(MediaHeaders.makeGrayPng(w, h, grid, filter = 4)),
      "containers of the same pixels hashed differently")
    // All-ascending cells → all 56 comparison bits set; the perturbed
    // image (cell 1 lowered to 40) flips exactly bit 0.
    assert(phBmp == (1L << 56) - 1, s"expected all-ones hash, got $phBmp")
    val pert = grid.clone(); pert(2) = 40; pert(3) = 40 // cell 1 = stream 2..3
    assert(java.lang.Long.bitCount(phBmp ^ ph(MediaHeaders.makeBmp24(w, h, pert))) == 1,
      "one-cell pixel perturbation did not land at Hamming 1")
    // A paletted/odd payload falls back to the stub stream, not a
    // misread: 16-bpp BMPs and non-gray PNGs are refused by decodeGray.
    assert(MediaHeaders.decodeGray(MediaHeaders.make("bmp", 4, 4)).isEmpty,
      "a header-only BMP (no pixel data) must not decode")
    assert(MediaHeaders.decodeGray(MediaHeaders.make("png", 4, 4)).isEmpty,
      "an RGB header-only PNG must not decode as gray8")
  }
}
