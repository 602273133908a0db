package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector helpers with exact cross-engine arithmetic.
  *
  * Cosine over IEEE floats is order-dependent when summed in parallel, so
  * raw float dot-products can differ in the last ulp between engines. We
  * instead quantize each component to a 64-bit integer (×1e6, round) and
  * compute dot products / norms in exact integer arithmetic — associative,
  * order-independent, identical everywhere. The final
  * `dot / (√na · √nb)` runs in double on identical integer inputs, so it
  * is bit-identical too. Quantization error (~1e-6 relative) is far below
  * any meaningful similarity-threshold resolution.
  *
  * All helpers are codegen'd higher-order functions — no UDFs — and keep
  * the embedding as an array column (no explode), so a 100 TB scan stays
  * one narrow projection per row.
  */
object VectorFns {

  /** array<float> → array<long>, component ×1e6 rounded (half away from
    * zero on both engines; round() makes the value integral so the long
    * cast is exact). Native codegen'd ([[QuantizeFloatLong]]) — it roots
    * every vector scan, so the per-element lambda cost of the HOF form
    * `transform(v, x -> round(x * 1e6)::long)` would tax the whole
    * dedup/ANN family. */
  def quantize(v: Column): Column =
    column(org.apache.spark.sql.graft.QuantizeFloatLong(expression(v)))

  /** Exact integer dot product of two quantized vectors — a native
    * codegen'd Catalyst expression ([[DotProductLong]]); semantics equal
    * the HOF form `aggregate(zip_with(a,b,(x,y)->x*y), 0L, +)` but the
    * inner loop compiles into whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    column(org.apache.spark.sql.graft.DotProductLong(expression(a), expression(b)))

  /** Exact integer squared norm (dot of the vector with itself). */
  def norm2(v: Column): Column = dot(v, v)

  /** Elementwise difference of two quantized vectors (residual x − c) —
    * native codegen'd ([[SubtractArraysLong]]); semantics equal
    * `zip_with(a, b, (x, y) -> x - y)` for null-free arrays. */
  def subtract(a: Column, b: Column): Column =
    column(org.apache.spark.sql.graft.SubtractArraysLong(expression(a), expression(b)))

  private def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)
  private def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Cosine from integer dot + squared norms, in double. */
  def cosine(dotC: Column, na: Column, nb: Column): Column =
    dotC.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))

  /** One sign-projection bit as a native codegen'd dot with the
    * deterministic ±1 sign (parity of popcount(b·1000003 + i), 1-based
    * component i — reproducible in any engine with bit_count) computed
    * INLINE per component ([[org.apache.spark.sql.graft.LshSignDotLong]]).
    * Value identical to the former dot against a precomputed ±1 literal
    * row for any vector up to that row's 4096 width, and now exact at
    * ANY width (the literal form silently capped projection and needed
    * a per-row width guard). The literal rows were the plan's heaviest
    * constants: 8 bucket bits × 4096 longs ≈ 256 KB serialized into
    * every stage's task binary in the embedding-LSH family (the
    * "broadcasting large task binary" warnings). */
  def lshBit(b: Int, qv: Column): Column =
    column(org.apache.spark.sql.graft.LshSignDotLong(expression(qv), b))

  /** Sign-projection LSH bucket id as a '0'/'1' string, e.g. "01101001".
    *
    * Sizing rule for real corpora: bits ≈ log2(n / target_bucket_size)
    * — e.g. 10⁹ vectors at ~10⁴ per bucket wants ~17 bits (plus
    * multi-probe on the query side for recall). The testdata pins 8 so
    * the DuckDB oracle ([[duckLshBucket8]]) stays byte-identical. */
  def lshBucket(qv: Column, bits: Int): Column =
    concat((0 until bits).map(b =>
      when(lshBit(b, qv) >= 0, lit("1")).otherwise(lit("0"))): _*)

  def lshBucket8(qv: String): Column = lshBucket(col(qv), 8)

  /** Same bucket as an INTEGER (bit b → 1<<b): XOR-able, so multi-probe
    * neighbors (Hamming-1 buckets) are `bucket ^ (1 << j)`. */
  def lshBucketInt(qv: Column, bits: Int): Column =
    (0 until bits).map(b =>
      when(lshBit(b, qv) >= 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)

  /** DuckDB mirror of [[lshBucketInt]]. */
  def duckLshBucketInt(qv: String, bits: Int): String =
    (0 until bits).map(b =>
      s"(CASE WHEN (${duckLshBit(b, qv)}) >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString("(", " + ", ")")

  /** DuckDB mirror of [[lshBit]]. */
  def duckLshBit(b: Int, qv: String): String =
    s"""list_reduce([(CASE WHEN bit_count(CAST($b * 1000003 + i AS BIGINT)) % 2 = 0 THEN 1 ELSE -1 END)
       | * $qv[i] FOR i IN generate_series(1, len($qv))], (x, y) -> x + y)""".stripMargin

  /** DuckDB mirror of [[lshBucket8]]. */
  def duckLshBucket8(qv: String): String =
    (0 until 8).map(b => s"(CASE WHEN (${duckLshBit(b, qv)}) >= 0 THEN '1' ELSE '0' END)")
      .mkString("concat(", ", ", ")")

  val duckQuantize: String => String =
    v => s"list_transform($v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  val duckDot: (String, String) => String =
    (a, b) => s"list_reduce([$a[i] * $b[i] FOR i IN generate_series(1, len($a))], (x, y) -> x + y)"
  val duckNorm2: String => String =
    v => s"list_reduce(list_transform($v, x -> x * x), (x, y) -> x + y)"
}
