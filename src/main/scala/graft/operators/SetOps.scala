package graft.operators

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Distinct / semi / anti / set-operation coverage (SURVEY.md §2.2 P5,
  * §2.4 "absent join kinds" — semi/anti are part of our extended surface,
  * expressed as EXISTS / NOT EXISTS in the oracle), plus
  * UNION/INTERSECT/EXCEPT (§2.7 U1/U2).
  *
  * Semi/anti joins ship only the join key of the probe side and
  * short-circuit on first match — at 100 TB they beat the equivalent
  * inner-join + distinct by an order of magnitude in shuffle bytes.
  */
object SetOps extends OpModule {

  /** Distinct aggregation: per-segment distinct customers and priorities. */
  val q12Distinct: Op = Op(
    "q12_count_distinct",
    Some("""
      SELECT c_mktsegment,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """))((spark, dir) => {
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  })

  /** Left-semi join: customers that have at least one finished order. */
  val q13Semi: Op = Op(
    "q13_semi_join",
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY c_custkey
    """))((spark, dir) => {
    val f = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    Tables.customer(spark, dir)
      .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  })

  /** Left-anti join: parts that never appear in any lineitem. */
  val q14Anti: Op = Op(
    "q14_anti_join",
    Some("""
      SELECT p_partkey, p_name, p_brand
      FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey
    """))((spark, dir) => {
    Tables.part(spark, dir)
      .join(Tables.lineitem(spark, dir), col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")
  })

  /** UNION ALL / INTERSECT / EXCEPT in one result: customer activity in
    * 1995 vs 1996 tagged by set membership (reference U1 age-band
    * UNION ALL assembly, init.sql:495-505, generalized). */
  val q15SetOps: Op = Op(
    "q15_set_ops",
    Some("""
      WITH c95 AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE YEAR(o_orderdate) = 1995),
           c96 AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE YEAR(o_orderdate) = 1996)
      SELECT tag, k FROM (
        SELECT 'both' AS tag, k FROM (SELECT k FROM c95 INTERSECT SELECT k FROM c96)
        UNION ALL
        SELECT 'only_1995' AS tag, k FROM (SELECT k FROM c95 EXCEPT SELECT k FROM c96)
        UNION ALL
        SELECT 'only_1996' AS tag, k FROM (SELECT k FROM c96 EXCEPT SELECT k FROM c95)
      )
      ORDER BY tag, k
    """))((spark, dir) => {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    def keys(y: Int) =
      o.filter(year(col("o_orderdate")) === y).select(col("o_custkey").as("k")).distinct()
    val c95 = keys(1995)
    val c96 = keys(1996)
    c95.intersect(c96).withColumn("tag", lit("both"))
      .union(c95.except(c96).withColumn("tag", lit("only_1995")))
      .union(c96.except(c95).withColumn("tag", lit("only_1996")))
      .select($"tag", $"k")
      .orderBy("tag", "k")
  })

  override def ops: Seq[Op] = Seq(q12Distinct, q13Semi, q14Anti, q15SetOps)
}
