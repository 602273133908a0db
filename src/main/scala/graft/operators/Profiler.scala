package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven table profiling: null / distinct / numeric min-max per
  * column for ANY DataFrame, computed as ONE aggregate row (a single
  * full scan with map-side partials and a one-row shuffle) and then
  * unpivoted to one output row per column. The aggregate list is
  * generated from the schema, so new columns are profiled without code
  * changes; non-numeric columns report null min/max.
  *
  * At 100 TB this is the cheapest complete census a pipeline can run:
  * the scan reads only the requested columns (pruned), every aggregate
  * is algebraic (count-distinct being the one hash-heavy member —
  * swap for the KMV sketch of t28 when exactness isn't required).
  */
object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** Profile the given columns (default: all). */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ cols.flatMap { c =>
      val base = Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"nul_$c"),
        countDistinct(col(c)).as(s"dis_$c"))
      if (isNumeric(types(c)))
        base ++ Seq(
          min(col(c)).cast("double").as(s"min_$c"),
          max(col(c)).cast("double").as(s"max_$c"))
      else base
    }
    val a = df.agg(aggs.head, aggs.tail: _*)
    cols.map { c =>
      a.select(
        lit(c).as("col"), col("n_rows"),
        col(s"nul_$c").as("n_null"), col(s"dis_$c").as("n_distinct"),
        (if (isNumeric(types(c))) col(s"min_$c") else lit(null).cast("double")).as("vmin"),
        (if (isNumeric(types(c))) col(s"max_$c") else lit(null).cast("double")).as("vmax"))
    }.reduce(_.unionByName(_)).orderBy("col")
  }
}
