package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scale-safe global id assignment.
  *
  * `Window.orderBy(key)` with no partitionBy plans as a SINGLE-partition
  * sort — one task sorts (and holds) every row, the classic driver-shaped
  * bottleneck. This helper produces the identical `row_number()`-by-key
  * result in three fully parallel steps:
  *
  *  1. range-repartition on the key — partition i holds keys strictly
  *     below partition i+1's, so global order = (partition, local order);
  *  2. `row_number()` windowed BY PARTITION ID — every partition ranks
  *     its own rows concurrently;
  *  3. shift each partition's local ranks by the total row count of the
  *     partitions before it — the offset table is one row per partition
  *     (a broadcast of #partitions longs, not data rows).
  *
  * The range exchange appears in both the rank branch and the count
  * branch of the plan; ReuseExchange deduplicates it, so both branches
  * read the SAME shuffle output and the pid↔count mapping cannot drift.
  * The result is deterministic regardless of where range boundaries
  * land: ids equal the global rank of the (unique) key.
  */
object Ranks {

  /** Adds `idCol` = 1-based global row number by `key`.
    *
    * CONTRACT: `key` must be unique per row. Duplicate keys break the
    * helper twice over — the ids among ties depend on which range
    * partition each tie lands in (nondeterministic output), and range
    * partitioning sends EVERY row of a hot key to one partition (a 90%
    * duplicate key re-creates the single-task sort this helper exists
    * to avoid). When rows are only unique as a tuple, pass the full
    * tuple to the composite overload: ties then spread across range
    * boundaries by the tiebreaker columns and the order is total
    * again. Dedupe first if dense_rank semantics are wanted. */
  def globalRowNumber(df: DataFrame, key: Column, idCol: String,
      partitions: Int = 0): DataFrame =
    globalRowNumber(df, Seq(key), idCol, partitions)

  /** Composite-key variant: global row number by the (totally-ordering)
    * `keys` tuple. Range partitioning uses the whole tuple, so heavy
    * duplication in a prefix column is spread by the tiebreakers
    * instead of hotspotting one range (RanksSpec pins the balance). */
  def globalRowNumber(df: DataFrame, keys: Seq[Column], idCol: String,
      partitions: Int): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, keys: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__rk",
      row_number().over(Window.partitionBy("__pid").orderBy(keys: _*)))
    // Cumulative offsets over #partitions rows — the only non-parallel
    // window here runs over n rows, not the data.
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol, col("__rk") + col("__off"))
      .drop("__pid", "__rk")
  }

  // NOTE on grouped top-k with few groups (the ANN per-query pattern):
  // no helper is needed. Spark's InferWindowGroupLimit turns a
  // `row_number() ≤ k` filter into WindowGroupLimit(Partial) BELOW the
  // window's exchange, so each input partition forwards at most k rows
  // per group — the lossless two-level funnel, built into physical
  // planning (PlanAuditSpec pins it on the ANN plans).
}
