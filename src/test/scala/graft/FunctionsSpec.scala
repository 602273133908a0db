package graft

import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.functions._

/** Unit tests for the shared Column helpers (table-driven, literal data —
  * the reference-style decode/cleanup testing of SURVEY.md §5.1). */
class FunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokens drops empties, keeps duplicates") {
    val out = Seq("a  b a", " x ", "", "solo")
      .toDF("t").select(TextFns.tokens(col("t")).as("w"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("a", "b", "a"), List("x"), Nil, List("solo")))
  }

  test("wordShingles builds n-grams in order") {
    val out = Seq("a b c d").toDF("t")
      .select(TextFns.wordShingles(TextFns.tokens(col("t")), 3).as("s"))
      .head().getSeq[String](0).toList
    assert(out == List("a b c", "b c d"))
  }

  test("charShingles covers the text and short docs yield one gram") {
    val out = Seq("abcdef", "ab").toDF("t")
      .select(TextFns.charShingles(col("t"), 5).as("s"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(List("abcde", "bcdef"), List("ab")))
  }

  test("union/inter sizes follow the distinct-concat identity") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val r = df.select(
      TextFns.unionSize(col("x"), col("y")),
      TextFns.interSize(col("x"), col("y"))).head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 2)
  }

  test("hex4ToInt decodes md5 prefixes") {
    // md5("abc") = 900150983cd24fb0... → 0x9001 = 36865
    val r = Seq("abc").toDF("t")
      .select(TextFns.hex4ToInt(substring(md5(col("t")), 1, 4)))
      .head().getInt(0)
    assert(r == 0x9001)
  }

  test("quantize/dot/norm2/cosine: exact integer arithmetic") {
    val df = Seq((Seq(1.0f, 0.0f, -0.5f), Seq(0.5f, 0.0f, 0.5f))).toDF("a", "b")
    val r = df.select(
      VectorFns.dot(
        VectorFns.quantize(col("a")), VectorFns.quantize(col("b"))).as("dot"),
      VectorFns.norm2(VectorFns.quantize(col("a"))).as("na"),
      VectorFns.norm2(VectorFns.quantize(col("b"))).as("nb")).head()
    assert(r.getLong(0) == 1000000L * 500000 - 500000L * 500000)
    assert(r.getLong(1) == 1000000L * 1000000 + 500000L * 500000)
    assert(r.getLong(2) == 2L * 500000 * 500000)
    val cos = r.getLong(0).toDouble / (math.sqrt(r.getLong(1).toDouble) * math.sqrt(r.getLong(2).toDouble))
    assert(math.abs(cos - 0.25 / (math.sqrt(1.25) * math.sqrt(0.5))) < 1e-12)
  }

  test("lshBucket8 is a deterministic 8-char bitstring") {
    val df = Seq(Seq(0.1f, -0.2f, 0.3f), Seq(0.1f, -0.2f, 0.3f)).toDF("v")
      .select(VectorFns.quantize(col("v")).as("qv"))
      .select(VectorFns.lshBucket8("qv").as("b"))
    val bs = df.collect().map(_.getString(0)).toList
    assert(bs.head.length == 8 && bs.head.forall(c => c == '0' || c == '1'))
    assert(bs.distinct.size == 1)
  }

  test("dot_product_long is callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT dot_product_long(array(1L, 2L, 3L), array(4L, 5L, 6L))").head().getLong(0)
    assert(r == 4 + 10 + 18)
  }

  test("subtract_arrays_long equals zip_with subtraction and is SQL-callable") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT subtract_arrays_long(array(10L, 20L, 30L), array(1L, 2L, 3L))")
      .head().getSeq[Long](0)
    assert(r == Seq(9L, 18L, 27L))
    import spark.implicits._
    val df = Seq((Array(5L, -7L, 2L), Array(3L, 3L, 3L))).toDF("a", "b")
    val native = df.select(graft.functions.VectorFns.subtract(col("a"), col("b")))
      .head().getSeq[Long](0)
    val hof = df.select(expr("zip_with(a, b, (x, y) -> x - y)"))
      .head().getSeq[Long](0)
    assert(native == hof && native == Seq(2L, -10L, -1L))
  }

  test("quantize_float_long equals the HOF round(x*1e6) form incl. negative halves") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    // ±x.5 quantization boundaries hit the half-away-from-zero rule;
    // tiny and large magnitudes exercise the double path.
    val df = Seq(Array(0.0000005f, -0.0000005f, 1.25f, -3.75f, 0f, 123.456f, -0.999999f))
      .toDF("v")
    val native = df.select(graft.functions.VectorFns.quantize(col("v")))
      .head().getSeq[Long](0)
    val hof = df.select(expr("transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"))
      .head().getSeq[Long](0)
    assert(native == hof, s"native $native != hof $hof")
    val sql = spark.sql("SELECT quantize_float_long(array(CAST(1.5E-6 AS FLOAT)))")
      .head().getSeq[Long](0)
    assert(sql == Seq(2L))
  }

  test("quantize fails fast on null elements; null vectors propagate null buckets") {
    import spark.implicits._
    val withNullElem = Seq(Tuple1(Seq(Some(1.0f), None, Some(2.0f))))
      .toDF("v")
    val ex = intercept[Exception] {
      withNullElem.select(graft.functions.VectorFns.quantize(col("v"))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(String.valueOf(_)).toSeq
    assert(chain(ex).exists(_.contains("null element")), chain(ex).mkString("\n"))
    // A wholly-null embedding must keep the pre-guard behavior (null
    // lshBit → all-zero bucket string), not crash in raise_error with a
    // null message.
    val nullVec = Seq(Tuple1(Option.empty[Array[Long]])).toDF("qv")
    val bucket = nullVec.select(graft.functions.VectorFns.lshBucket(col("qv"), 2))
      .head().getString(0)
    assert(bucket == "00", s"got $bucket")
  }

  test("multimodal stub decode is deterministic byte arithmetic") {
    import graft.operators.Multimodal
    val out = Multimodal.decodePartition(Iterator(
      Multimodal.MediaRaw(7L, "video", "hello".getBytes("UTF-8")),
      Multimodal.MediaRaw(8L, "image", Array.emptyByteArray))).toList
    assert(out.head ==
      Multimodal.MediaMeta(7L, "video", 5, 5, 'h'.toInt, 1 + 5 % 16, 'h'.toInt, "raw"))
    assert(out(1) == Multimodal.MediaMeta(8L, "image", 0, 0, 0, 1, 0, "raw"))
  }

  test("Profiler handles any schema: numeric min/max, string nulls, full-table default") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), "a"), (2L, None, "b"), (3L, Some(7.0), null.asInstanceOf[String]))
      .toDF("id", "score", "tag")
    val p = graft.operators.Profiler.profile(df)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(p.keySet == Set("id", "score", "tag"))
    assert(p("id") == ((3L, 0L, 3L, Some(1.0), Some(3.0))))
    assert(p("score") == ((3L, 1L, 2L, Some(2.5), Some(7.0))))
    assert(p("tag") == ((3L, 1L, 2L, None, None)))
  }

  // ---- r14 fused hash expressions: pinned against the built-in chains
  // they replaced (the oracle mirrors the chains; the expressions must
  // produce the exact same numbers on any input, including multi-byte
  // UTF-8 and null-bearing edge shapes) ----

  test("md5PrefixLong equals conv(substring(md5,1,n),16,10) for n=13,15") {
    val df = Seq("", "a", "hello world", "caf\u00e9 \u4e2d\u6587", "x" * 100).toDF("t")
    Seq(13, 15).foreach { n =>
      val rows = df.select(
        TextFns.md5PrefixLong(col("t"), n).as("fused"),
        conv(substring(md5(col("t")), 1, n), 16, 10).cast("long").as("chain"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"n=$n"))
    }
  }

  test("wordShingleHashLong equals per-gram md5 chain, with and without mask") {
    val df = Seq("one two three four five", "a b c", "p q r s").toDF("t")
      .select(TextFns.tokens(col("t")).as("w"))
      .filter(size(col("w")) >= 3) // operators guard size >= n before hashing
    val rows = df.select(
      TextFns.wordShingleHashLong(col("w"), 3).as("fused"),
      transform(TextFns.wordShingles(col("w"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("chain"),
      TextFns.wordShingleHashLong(col("w"), 3, mask = 2147483647L).as("fusedM"),
      transform(TextFns.wordShingles(col("w"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")
          .bitwiseAND(lit(2147483647L))).as("chainM"))
      .collect()
    rows.foreach { r =>
      // caller guarantees size >= n in operators; for shorter arrays the
      // fused form returns empty where wordShingles yields garbage-free
      // empty too (sequence(1, size-2) is empty for size < 3)
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](2) == r.getSeq[Long](3))
    }
  }

  test("blockWordShingleHashLong equals md5(concat_ws(sep, block, gram)) chain") {
    // The (null, null, …) row pins the all-null-block identity: the
    // oracle's flat concat_ws skips nulls with NO separator, so the
    // hashed key is the bare gram — blockPrefix emits the empty prefix
    // there (the r15 separator fix).
    val df = Seq(("en", "web", "a b c d"), (null, "web", "p q r s"),
        (null, null, "m n o p q"))
      .toDF("lang", "source", "t")
      .select(col("lang"), col("source"), TextFns.tokens(col("t")).as("w"))
      .filter(size(col("w")) >= 3)
    val rows = df.select(
      TextFns.blockWordShingleHashLong(
        col("w"), TextFns.blockPrefix(col("lang"), col("source")), 3).as("fused"),
      transform(TextFns.wordShingles(col("w"), 3), g =>
        conv(substring(md5(concat_ws("\u0001", col("lang"), col("source"), g)),
          1, 15), 16, 10).cast("long")).as("chain"))
      .collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("charGramHashLong equals positional md5(concat_ws(sep, block, substr)) chain") {
    // The all-None row pins the all-null-block identity (the r15
    // separator fix): oracle key = the bare gram, no leading chr(1).
    val df = Seq(("en", "web", Option(2L), "abcdefgh"), ("de", "pdf", Option(0L), "xy"),
        (null, null, Option.empty[Long], "qrstuvw"))
      .toDF("lang", "source", "lenb", "text")
    val rows = df.select(
      TextFns.charGramHashLong(col("text"),
        TextFns.blockPrefix(col("lang"), col("source"), col("lenb")), 5).as("fused"))
      .collect()
    // the positional md5 chain rebuilt in plain Scala for the comparison
    val duck = df.collect().map { r =>
      val (lang, source, lenb, text) =
        (Option(r.getString(0)), Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3))
      val npos = math.max(text.length - 4, 1)
      (1 to npos).map { i =>
        val gram = text.substring(i - 1, math.min(i - 1 + 5, text.length))
        val parts = Seq(lang.getOrElse(null), source.getOrElse(null),
            lenb.map(_.toString).getOrElse(null), gram)
          .filter(_ != null)
        val joined = parts.mkString("\u0001")
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(joined.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      }.toSeq
    }
    rows.map(_.getSeq[Long](0)).zip(duck).foreach { case (f, d) => assert(f == d) }
  }

  test("lshBit (LshSignDotLong) equals the dot against the literal ±1 sign row") {
    def signParity(b: Int, i: Int): Long =
      if (java.lang.Long.bitCount(b.toLong * 1000003L + i) % 2 == 0) 1L else -1L
    val df = Seq(
      Seq(3L, -7L, 11L, 0L, 5L),
      Seq.tabulate(64)(i => (i * 31 - 700).toLong)).toDF("qv")
    (0 until 8).foreach { b =>
      val rows = df.select(
        VectorFns.lshBit(b, col("qv")).as("fused"),
        VectorFns.dot(col("qv"),
          typedLit((1 to 4096).map(signParity(b, _)).toArray)).as("lit"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"b=$b"))
    }
  }
}
