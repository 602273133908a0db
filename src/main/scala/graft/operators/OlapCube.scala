package graft.operators

import graft.{Exact, Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** The reference's five OLAP query shapes (SURVEY.md §2.8) plus grouped
  * top-k, re-homed on the testdata star schema:
  *
  * roll-up / drill-down = the same aggregate at coarser/finer grain
  * (queries-scripts.py:9-20,29-40); slice-and-dice = dimension-filtered
  * per-month aggregate (app.py:84-109); pivot = CROSSTAB year × category
  * matrix (app.py:112-141); drill-across = join of two independently
  * aggregated fact queries on conformed dims (queries-scripts.py:113-147);
  * grouped top-k = ROW_NUMBER ... <= k (app.py:44-68).
  *
  * All are single-shuffle hash aggregates (map-side partials) over
  * broadcast-dim star joins — the shape that scales linearly with fact
  * bytes at 1000 executors.
  */
object OlapCube extends OpModule {

  /** Roll-up: order counts + revenue at the coarse (segment × priority)
    * grain. */
  val q5Rollup: Op = Op(
    "q5_rollup",
    Some("""
      SELECT c_mktsegment, o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority
      ORDER BY c_mktsegment, o_orderpriority
    """))((spark, dir) => {
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment", "o_orderpriority")
  })

  /** Drill-down: same measure one level finer (adds order year). */
  val q6Drilldown: Op = Op(
    "q6_drilldown",
    Some("""
      SELECT c_mktsegment, o_orderpriority, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority, o_year
      ORDER BY c_mktsegment, o_orderpriority, o_year
    """))((spark, dir) => {
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"), year(col("o_orderdate")).as("o_year"))
      .agg(
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment", "o_orderpriority", "o_year")
  })

  /** Slice & dice: one nation sliced out, diced by year × month over a
    * year range (reference app.py:84-109 city/year-range shape). */
  val q7SliceDice: Op = Op(
    "q7_slice_dice",
    Some("""
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             CAST(MONTH(o_orderdate) AS INTEGER) AS o_month,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE n_name = 'NATION_3' AND YEAR(o_orderdate) BETWEEN 1996 AND 1998
      GROUP BY o_year, o_month
      ORDER BY o_year, o_month
    """))((spark, dir) => {
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === "NATION_3" && year(col("o_orderdate")).between(1996, 1998))
      .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
      .agg(
        Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year", "o_month")
  })

  private val regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  /** Pivot: year × region revenue matrix — the reference's Postgres
    * CROSSTAB (app.py:112-141) as `groupBy.pivot` with an explicit value
    * list (no extra pass to discover categories, and a fixed output
    * schema like the reference's 27-column crosstab). */
  val q8Pivot: Op = Op(
    "q8_pivot",
    Some {
      val cells = regions.map(r =>
        s"""CAST(SUM(CASE WHEN r_name = '$r' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)) END) AS DOUBLE) AS "$r"""")
        .mkString(",\n             ")
      s"""
      SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             $cells
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY o_year
      ORDER BY o_year
    """
    })((spark, dir) => {
    // Aggregate revenue per order BEFORE the orders join (decimal sums
    // are associative, so per-order partials re-sum exactly): the
    // orderkey shuffle carries one (key, sum) pair per order instead of
    // every line — the q10/q9 aggregate-before-join shape.
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(27,6)")).as("rev"))
    perOrder
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("r_name", regions)
      .agg(sum(col("rev")).cast("double"))
      .orderBy("o_year")
  })

  /** Drill-across: two facts (orders, lineitem-returns) aggregated
    * independently to the conformed (nation, year) grain, then joined —
    * the reference's births ⋈ deaths query (queries-scripts.py:113-147). */
  val q9DrillAcross: Op = Op(
    "q9_drill_across",
    Some("""
      WITH ord AS (
        SELECT c_nationkey AS nk, CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_value
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY nk, yr
      ), ret AS (
        SELECT c_nationkey AS nk, CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
               CAST(COUNT(*) AS BIGINT) AS n_returned
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY nk, yr
      )
      SELECT n_name, yr, n_orders, order_value, n_returned
      FROM ord JOIN ret USING (nk, yr) JOIN nation ON nk = n_nationkey
      ORDER BY n_name, yr
    """))((spark, dir) => {
    val o = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
    val ord = o
      .groupBy(col("c_nationkey").as("nk"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"), Exact.dsum(col("o_totalprice")).as("order_value"))
    // Aggregate lineitem per order BEFORE the orders join: the returned
    // count is additive, so the join input shrinks from every returned
    // line to one row per order and the orderkey shuffle carries a
    // (key, count) pair instead of full fact rows.
    val ret = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("ret_cnt"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), year(col("o_orderdate")).as("yr"))
      .agg(sum(col("ret_cnt")).as("n_returned"))
    ord.join(ret, Seq("nk", "yr"))
      .join(broadcast(Tables.nation(spark, dir)), col("nk") === col("n_nationkey"))
      .select("n_name", "yr", "n_orders", "order_value", "n_returned")
      .orderBy("n_name", "yr")
  })

  /** Grouped top-k: top-5 parts by revenue within each brand via
    * ROW_NUMBER ≤ k (reference app.py:44-68 top-10 causes per occupation
    * family). Revenue is an exact decimal-derived double, so the rank
    * order is identical across engines; ties broken by partkey. */
  val q10TopK: Op = Op(
    "q10_topk_per_group",
    Some("""
      WITH rev AS (
        SELECT p_brand, p_partkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      )
      SELECT p_brand, p_partkey, revenue, CAST(rnk AS INTEGER) AS rnk
      FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS rnk
        FROM rev
      )
      WHERE rnk <= 5
      ORDER BY p_brand, rnk
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    // Aggregate BEFORE the dimension join: p_brand is functionally
    // dependent on p_partkey, so summing per l_partkey first shrinks the
    // join input from every lineitem row to one row per part and keeps
    // the shuffle key a bare int.
    // NOT spread (r15, measured): the sf parquet is ONE row group, so
    // the scan+partial-agg stage runs single-threaded (628 ms CPU in one
    // task — guide §2.5 input skew); a spread would parallelize the
    // decimal math, but the round-robin exchange of 600 k narrow rows
    // measured +40% same-JVM interleaved (1.16→1.62 s): the exchange's
    // own single-task write plus the extra stage barrier cost more than
    // the parallelism saves at this row weight. At 100 TB the scan
    // splits by row group and the skew never exists.
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")), "p_partkey")
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("p_brand", "p_partkey", "revenue", "rnk")
      .orderBy("p_brand", "rnk")
  })

  /** ROLLUP grouping-sets: subtotals at every prefix grain in ONE pass
    * (the reference runs separate GROUP BYs per grain, SURVEY §2.5 G5 —
    * this is the engine's sugar for the same lattice). Group-marker
    * NULLs are COALESCE'd to 'ALL' so cross-engine null ordering never
    * matters. */
  val q25RollupSets: Op = Op(
    "q25_rollup_sets",
    Some("""
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
      ORDER BY segment, priority
    """))((spark, dir) => {
    // Spark SQL ROLLUP over direct parquet relations (the DataFrame
    // rollup-after-join path trips Spark's ambiguous-self-join detector
    // on the re-selected grouping columns).
    spark.sql(s"""
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM parquet.`$dir/orders.parquet`
      JOIN parquet.`$dir/customer.parquet` ON o_custkey = c_custkey
      GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
      ORDER BY segment, priority
    """)
  })

  /** CUBE grouping-sets: all 2^k grains in one pass. */
  val q26CubeSets: Op = Op(
    "q26_cube_sets",
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
             COALESCE(l_linestatus, 'ALL') AS lstatus,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rflag, lstatus
    """))((spark, dir) => {
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_items"), Exact.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("n_items"), col("sum_qty"))
      .orderBy("rflag", "lstatus")
  })

  override def ops: Seq[Op] =
    Seq(q5Rollup, q6Drilldown, q7SliceDice, q8Pivot, q9DrillAcross, q10TopK,
      q25RollupSets, q26CubeSets)
}
