package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused md5-prefix hashing for the dedup/text hot paths.
  *
  * The repo's standard cross-engine hash key is
  * `conv(substring(md5(s), 1, nHex), 16, 10)::long` — the integer value
  * of the first nHex hex chars of the md5 digest, mirrored in DuckDB as
  * `CAST(('0x' || substring(md5(s), 1, nHex)) AS BIGINT)`. The built-in
  * expression chain materializes, PER VALUE: a 32-char hex string (md5),
  * a substring copy, a decimal-digit string (conv), and a string→long
  * cast parse — plus, for n-gram callers, a per-gram space-joined string
  * built by an interpreted `transform`/`concat_ws` lambda. Profiling the
  * sf0.1 sweep showed these stages dominating the heavy dedup queries
  * with executorRunTime ≫ cpuTime (allocation/GC stalls from the string
  * churn).
  *
  * These expressions compute the SAME number — the digest is taken over
  * byte-identical input, and the first-15-hex-chars value equals the
  * big-endian value of the digest's first 8 bytes >>> 4 — with one
  * MessageDigest call and zero intermediate strings, inside whole-stage
  * codegen (static helper calls, the [[DotProductLong]] pattern). Every
  * consumer's DuckDB oracle is untouched: only HOW Spark computes the
  * value changes, never the value.
  *
  * Collision bound of the convention (r15): 15 hex chars = 60 bits —
  * the widest prefix the oracle's signed-BIGINT `'0x…'` cast admits
  * (16 would overflow DuckDB's parse). Birthday bound: ~1% collision
  * odds at ~1.5×10⁸ distinct keys, even odds near 1.3×10⁹. Both
  * engines collide IDENTICALLY (same digest, same prefix), so
  * cross-engine gates hold at any cardinality; consumers treating the
  * hash as an equality surrogate (shingle sets, df counts) absorb a
  * rare same-key merge, and a deployment needing exactness past 10⁹
  * distinct keys widens to two longs (digest hi/lo) on both engines.
  */
object GraftHash {

  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Integer value of the first nHex (≤ 15) hex chars of the digest:
    * big-endian value of the first 8 bytes, shifted down past the
    * 16 − nHex nibbles that substring(…, 1, nHex) drops. */
  private def prefixOf(digest: Array[Byte], nHex: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> (4 * (16 - nHex))
  }

  /** md5-prefix of one UTF8String's bytes. */
  def md5Prefix(s: UTF8String, nHex: Int): Long = {
    val d = mdLocal.get()
    d.reset()
    prefixOf(d.digest(s.getBytes), nHex)
  }

  /** Per-position word-n-gram md5-prefix hashes: element i (0-based) is
    * md5Prefix of `concat_ws(' ', words[i], …, words[i+n−1])`. Null
    * elements are skipped exactly as concat_ws skips them (no value, no
    * separator). Empty result for arrays shorter than n. */
  def wordShingleHash(words: ArrayData, n: Int, nHex: Int, mask: Long): ArrayData = {
    val len = words.numElements()
    val m = math.max(len - n + 1, 0)
    val out = new Array[Long](m)
    val d = mdLocal.get()
    var i = 0
    while (i < m) {
      d.reset()
      var first = true
      var k = 0
      while (k < n) {
        val w = words.getUTF8String(i + k)
        if (w != null) {
          if (!first) d.update(' '.toByte)
          d.update(w.getBytes)
          first = false
        }
        k += 1
      }
      out(i) = prefixOf(d.digest(), nHex) & mask
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[wordShingleHash]] with a per-row block prefix baked into every
    * gram key: element i is md5Prefix of `prefix ++ gram_i` with
    * gram_i = `concat_ws(' ', words[i..i+n−1])`. The prefix must
    * already CARRY its trailing chr(1) separator — callers build it
    * with [[graft.functions.TextFns.blockPrefix]], which emits the
    * EMPTY prefix when every block column is null, matching the
    * oracle's flat `concat_ws(chr(1), blockCols…, gram)` exactly
    * (concat_ws writes no separator for skipped nulls; the pre-r15
    * unconditional separator here hashed chr(1)+gram on all-null-block
    * rows where the oracle hashes just the gram). */
  def blockWordShingleHash(words: ArrayData, prefix: UTF8String,
      n: Int, nHex: Int): ArrayData = {
    val len = words.numElements()
    val m = math.max(len - n + 1, 0)
    val out = new Array[Long](m)
    val d = mdLocal.get()
    val pb = prefix.getBytes
    var i = 0
    while (i < m) {
      d.reset()
      d.update(pb)
      var first = true
      var k = 0
      while (k < n) {
        val w = words.getUTF8String(i + k)
        if (w != null) {
          if (!first) d.update(' '.toByte)
          d.update(w.getBytes)
          first = false
        }
        k += 1
      }
      out(i) = prefixOf(d.digest(), nHex)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-position char-n-gram md5-prefix hashes with a per-row block
    * prefix: element i (0-based) is md5Prefix of
    * `prefix ++ substring(text, i+1, n)` — the prefix carries its own
    * trailing separator (see [[blockWordShingleHash]]'s contract;
    * callers build it with TextFns.blockPrefix).
    * Positions run 1..greatest(numChars − n + 1, 1), so a text shorter
    * than n still yields one (truncated) gram — the d4/d13 shape. */
  def charGramHash(text: UTF8String, prefix: UTF8String, n: Int, nHex: Int): ArrayData = {
    val npos = math.max(text.numChars() - n + 1, 1)
    val out = new Array[Long](npos)
    val d = mdLocal.get()
    val pb = prefix.getBytes
    var i = 1
    while (i <= npos) {
      d.reset()
      d.update(pb)
      d.update(text.substringSQL(i, n).getBytes)
      out(i - 1) = prefixOf(d.digest(), nHex)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** m7's 56-bit dHash over a code-point stream — THE definition of the
    * hash ([[graft.operators.Multimodal.dHash56]] delegates here; the
    * registered op and the mapPartitions decode seam both call through
    * it, so the two paths cannot drift). Grid geometry: PG×PG
    * proportional cells with floor boundaries, exact integer cell means,
    * right-neighbor comparisons per grid row. */
  def dHash56(codes: Array[Int], pg: Int): Long = {
    val n = codes.length.toLong
    val g2 = pg * pg
    val cells = new Array[Long](g2)
    var k = 0
    while (k < g2) {
      val from = k * n / g2
      val to = (k + 1) * n / g2
      if (to > from) {
        var s = 0L
        var i = from
        while (i < to) { s += codes(i.toInt); i += 1 }
        cells(k) = s / (to - from)
      }
      k += 1
    }
    var h = 0L
    var r = 0
    while (r < pg) {
      var c = 0
      while (c < pg - 1) {
        val p = r * pg + c
        if (cells(p + 1) > cells(p)) h |= 1L << (r * (pg - 1) + c)
        c += 1
      }
      r += 1
    }
    h
  }

  /** Sign-projection dot: Σ v(i)·sign with sign = parity of
    * popcount(b·1000003 + (i+1)) — the [[LshSignDotLong]] kernel. */
  def lshSignDot(v: ArrayData, b: Int): Long = {
    val n = v.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val sign = if ((java.lang.Long.bitCount(b.toLong * 1000003L + (i + 1)) & 1) == 0) 1L else -1L
      s += v.getLong(i) * sign
      i += 1
    }
    s
  }

  /** dHash56 over a string's Unicode code points (the stub pixel
    * stream). Bit-identical to the former expression-chain form
    * (split('') + ascii + 64 aggregate/slice lambdas) on BMP text, and
    * to [[dHash56]] over String.codePoints by construction. */
  def phash56(t: UTF8String, pg: Int): Long =
    dHash56(t.toString.codePoints().toArray, pg)
}

/** `conv(substring(md5(child), 1, nHex), 16, 10)::long` as one codegen'd
  * call — same value, no intermediate strings. */
case class Md5PrefixLong(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15, s"nHex must be 1..15, got $nHex")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long needs a string child, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override def nullSafeEval(s: Any): Any =
    GraftHash.md5Prefix(s.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.md5Prefix($s, $nHex);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-position word-n-gram md5-prefix hashes over an array<string> —
  * the fused form of
  * `transform(wordShingles(words, n), s -> md5PrefixLong(s))`. */
case class WordShingleHashLong(child: Expression, n: Int, nHex: Int,
    mask: Long = -1L) extends UnaryExpression {
  require(n >= 1 && nHex >= 1 && nHex <= 15)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hash_long"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingle_hash_long needs array<string>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    GraftHash.wordShingleHash(a.asInstanceOf[ArrayData], n, nHex, mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.wordShingleHash($a, $n, $nHex, ${mask}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-position word-n-gram md5-prefix hashes with a block prefix — the
  * fused form of d13's blocked gram key
  * `md5PrefixLong(concat_ws('', block…, gram))` over every
  * n-gram of `left` (array<string>), with `right` the pre-joined block
  * prefix. */
case class BlockWordShingleHashLong(left: Expression, right: Expression,
    n: Int, nHex: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(n >= 1 && nHex >= 1 && nHex <= 15)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "block_word_shingle_hash_long"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"block_word_shingle_hash_long needs (array<string>, string), got $other")
    }

  override def nullSafeEval(w: Any, p: Any): Any =
    GraftHash.blockWordShingleHash(
      w.asInstanceOf[ArrayData], p.asInstanceOf[UTF8String], n, nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, p) =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.blockWordShingleHash($w, $p, $n, $nHex);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-position char-n-gram md5-prefix hashes with a block prefix — the
  * fused form of the d4/d13 gram key
  * `md5PrefixLong(concat_ws('', block…, substring(text, i, n)))`
  * over every i in 1..greatest(len−n+1, 1). */
case class CharGramHashLong(left: Expression, right: Expression, n: Int, nHex: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(n >= 1 && nHex >= 1 && nHex <= 15)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hash_long"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"char_gram_hash_long needs (string text, string prefix), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(t: Any, p: Any): Any =
    GraftHash.charGramHash(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String], n, nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.charGramHash($t, $p, $n, $nHex);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** m7's 56-bit perceptual hash of a decoded payload string as ONE
  * codegen'd call — replaces the split('')+ascii+64-slice-aggregate
  * expression chain (interpreted lambdas, one array element per
  * character) with [[GraftHash.dHash56]] over the code-point stream. */
case class PHash56(child: Expression, pg: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "phash56"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"phash56 needs a string child, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    GraftHash.phash56(s.asInstanceOf[UTF8String], pg)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.phash56($s, $pg);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-random-projection dot for the embedding-LSH bucket bit b:
  * Σ qv(i) · sign(b, i+1) with sign(b, i) = +1 when
  * popcount(b·1000003 + i) is even, −1 otherwise — exactly the value of
  * `dot_product_long(qv, typedLit(signs))` against the former
  * 4096-element ±1 literal row, for ANY vector length (the literal
  * form silently capped projection at its own width; this computes the
  * sign inline, so no cap and no 32 KB literal per bit serialized into
  * every plan and task binary — 8 bucket bits cost ~256 KB per stage).
  * Oracle mirror unchanged (duckLshBucket* uses the same popcount
  * formula). */
case class LshSignDotLong(child: Expression, b: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_sign_dot_long"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_sign_dot_long needs array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    GraftHash.lshSignDot(a.asInstanceOf[ArrayData], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftHash.lshSignDot($a, $b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
