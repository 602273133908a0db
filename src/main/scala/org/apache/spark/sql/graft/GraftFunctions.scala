package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL exposure of the engine's native expressions, both ways Spark
  * supports:
  *
  *  - [[GraftFunctions.register]]: imperative per-session registration
  *    (temp function) — used by tests and ad-hoc sessions;
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` installer for
  *    `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`,
  *    the production wiring (survives session cloning, visible to pure
  *    SQL clients).
  */
object GraftFunctions {

  private val dotInfo = new ExpressionInfo(
    classOf[DotProductLong].getCanonicalName, "dot_product_long")
  private val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProductLong(exprs(0), exprs(1))

  private val subInfo = new ExpressionInfo(
    classOf[SubtractArraysLong].getCanonicalName, "subtract_arrays_long")
  private val subBuilder: Seq[Expression] => Expression =
    exprs => SubtractArraysLong(exprs(0), exprs(1))

  private val quantInfo = new ExpressionInfo(
    classOf[QuantizeFloatLong].getCanonicalName, "quantize_float_long")
  private val quantBuilder: Seq[Expression] => Expression =
    exprs => QuantizeFloatLong(exprs(0))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_long", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "subtract_arrays_long", subBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_float_long", quantBuilder, "built-in")
  }

  private[graft] val injectables = Seq(
    (FunctionIdentifier("dot_product_long"), dotInfo, dotBuilder),
    (FunctionIdentifier("subtract_arrays_long"), subInfo, subBuilder),
    (FunctionIdentifier("quantize_float_long"), quantInfo, quantBuilder))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.injectables.foreach(e.injectFunction)
}
