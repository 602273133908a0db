package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers shared by the text-analysis and dedup
  * operators. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` higher-order functions — no UDFs —
  * and every construct has an exact DuckDB mirror (list_filter /
  * list_transform / md5 / ascii) so operators stay oracle-checkable.
  *
  * Determinism across engines: hashing is md5-hex (identical bytes on any
  * engine); "minimum hash" is lexicographic MIN over fixed-width hex
  * strings, which equals numeric min; set sizes use the distinct-concat
  * union identity so no engine-specific intersection semantics are
  * involved.
  */
object TextFns {

  /** Whitespace tokens, empties dropped (reference A1/A2 split+filter,
    * spark_script_sim.py:112-114). */
  def tokens(text: Column): Column =
    filter(split(text, " "), x => x =!= "")

  /** Word n-grams as space-joined strings; caller guarantees size >= n. */
  def wordShingles(words: Column, n: Int): Column =
    transform(
      sequence(lit(1), size(words) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + lit(k))): _*))

  /** Character n-grams over the raw text (for fingerprinting / char
    * Jaccard). Produces max(len - n + 1, 1) grams so short docs still
    * yield one (possibly truncated) gram. */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** |A ∪ B| and |A ∩ B| via the distinct-concat identity:
    * union = |distinct(A ++ B)|, inter = |A| + |B| − union. A and B must
    * already be distinct arrays. */
  def unionSize(a: Column, b: Column): Column =
    size(array_distinct(concat(a, b)))
  def interSize(a: Column, b: Column): Column =
    size(a) + size(b) - unionSize(a, b)

  /** `conv(substring(md5(c), 1, nHex), 16, 10)::long` as one codegen'd
    * call ([[org.apache.spark.sql.graft.Md5PrefixLong]]) — the repo's
    * standard cross-engine int64 hash key without the hex-string /
    * substring / conv-parse intermediates. Same value, same oracle. */
  def md5PrefixLong(c: Column, nHex: Int = 15): Column =
    column(org.apache.spark.sql.graft.Md5PrefixLong(expression(c), nHex))

  /** Fused `transform(wordShingles(words, n), s -> md5PrefixLong(s))` —
    * per-position word-n-gram hashes in one tight codegen'd loop
    * ([[org.apache.spark.sql.graft.WordShingleHashLong]]): no per-gram
    * string materialization, no interpreted lambda. */
  def wordShingleHashLong(words: Column, n: Int, nHex: Int = 15,
      mask: Long = -1L): Column =
    column(org.apache.spark.sql.graft.WordShingleHashLong(
      expression(words), n, nHex, mask))

  /** The block-prefix byte stream of the oracle's flat
    * `concat_ws(chr(1), blockCols…, gram)`: the joined non-null block
    * columns plus ONE trailing chr(1), or the EMPTY string when every
    * block column is null — concat_ws skips nulls with no separator,
    * so an all-null block contributes zero bytes to the hashed key
    * (r15: the fused hashes previously wrote the separator
    * unconditionally, diverging from the oracle on all-null-block
    * rows; FunctionsSpec pins the identity including that row). */
  def blockPrefix(cols: Column*): Column =
    when(coalesce(cols.map(_.cast("string")): _*).isNull, lit(""))
      .otherwise(concat(concat_ws("\u0001", cols: _*), lit("\u0001")))

  /** [[wordShingleHashLong]] with a block prefix baked into each key:
    * element i is `md5PrefixLong(prefix ++ gram_i)` with `prefix`
    * pre-joined by the caller via [[blockPrefix]] — it carries its own
    * trailing separator
    * ([[org.apache.spark.sql.graft.BlockWordShingleHashLong]]). */
  def blockWordShingleHashLong(words: Column, prefix: Column, n: Int,
      nHex: Int = 15): Column =
    column(org.apache.spark.sql.graft.BlockWordShingleHashLong(
      expression(words), expression(prefix), n, nHex))

  /** Fused per-position char-n-gram hash with a block prefix: element i
    * is `md5PrefixLong(prefix ++ substring(text, i, n))` for i in
    * 1..greatest(len−n+1, 1) — the d4/d13 blocked gram key; the prefix
    * comes from [[blockPrefix]] and carries its own trailing separator
    * ([[org.apache.spark.sql.graft.CharGramHashLong]]). */
  def charGramHashLong(text: Column, prefix: Column, n: Int, nHex: Int = 15): Column =
    column(org.apache.spark.sql.graft.CharGramHashLong(
      expression(text), expression(prefix), n, nHex))

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)
  private def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Value of one lowercase-hex digit: '0'-'9' → 0-9, 'a'-'f' → 10-15. */
  def hexDigit(c: Column): Column =
    when(ascii(c) <= 57, ascii(c) - 48).otherwise(ascii(c) - 87)

  /** First 4 hex chars of an md5 string → integer 0..65535. */
  def hex4ToInt(h: Column): Column =
    (1 to 4).map(i => hexDigit(h.substr(i, 1)) * lit(1 << (4 * (4 - i))))
      .reduce(_ + _)

  /** DuckDB mirror of [[hexDigit]]/[[hex4ToInt]] as a SQL fragment. */
  def hex4ToIntSql(col: String): String =
    (1 to 4).map { i =>
      val c = s"substring($col, $i, 1)"
      s"(CASE WHEN ascii($c) <= 57 THEN ascii($c) - 48 ELSE ascii($c) - 87 END) * ${1 << (4 * (4 - i))}"
    }.mkString(" + ")
}
