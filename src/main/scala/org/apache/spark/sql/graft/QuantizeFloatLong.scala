package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Native codegen'd embedding quantization: array<float> →
  * array<bigint>, component ↦ round(x · 10⁶) half-away-from-zero —
  * semantically `transform(v, x -> CAST(round(CAST(x AS DOUBLE) * 1e6)
  * AS BIGINT))`, but the higher-order form allocates a lambda closure
  * and interprets it per element, and it sits at the ROOT of every
  * vector pipeline (each dedup/ANN scan quantizes before any dot), so
  * the interpreted per-element cost taxes the whole family. This emits
  * a primitive loop inside whole-stage codegen.
  *
  * Rounding matches Spark's `round()` exactly (BigDecimal.valueOf +
  * HALF_UP — decimal-string based, so `Math.floor(x + 0.5)`-style IEEE
  * edge cases like 0.49999999999999994 round identically to the SQL
  * form and to DuckDB's `round()`). */
case class QuantizeFloatLong(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_float_long"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // ArrayData.getFloat on a null slot silently reads 0.0f — a wrong
      // vector, not an error — so null elements fail fast instead (the
      // HOF form propagated element nulls; vector math downstream can't
      // use them either way, and silence is the worst option).
      if (x.isNullAt(i)) throw QuantizeFloatLong.nullElement(i)
      out(i) = QuantizeFloatLong.quantize(x.getFloat(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw org.apache.spark.sql.graft.QuantizeFloatLong.nullElement($i);
         |  }
         |  $out[$i] = org.apache.spark.sql.graft.QuantizeFloatLong.quantize($a.getFloat($i));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeFloatLong {
  /** round(x · 10⁶) with Spark/DuckDB `round()` semantics (HALF_UP on
    * the decimal-string value, away from zero). */
  def quantize(f: Float): Long =
    java.math.BigDecimal.valueOf(f.toDouble * 1.0e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def nullElement(i: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"quantize_float_long: null element at index $i — embedding vectors must be null-free")
}
