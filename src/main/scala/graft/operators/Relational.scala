package graft.operators

import graft.{Exact, Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2 scans/filters, §2.4
  * joins J1-J4/J10, §2.5 aggregations G1/G4).
  *
  * Scale notes: q1 is a pure map-side-combinable hash aggregate (partial
  * agg before the single shuffle). q3 is a star join — the dimension side
  * (orders→customer→nation→region chain collapses to small tables at any
  * SF except `orders`) relies on AQE/broadcast for the sub-8MB dims and a
  * shuffled hash join for lineitem⋈orders on the shared key, which is the
  * correct shape at 100 TB (both sides partition on orderkey; no
  * all-to-one hotspot).
  */
object Relational extends OpModule {

  /** Pricing-summary hash aggregate over lineitem — the reference's
    * `groupBy(keys).count()` fact-grain collapse (spark_script_sim.py:398,
    * spark_script_sinasc.py:270) generalized with additive measures. */
  val q1Agg: Op = Op(
    "q1_agg",
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
             CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """))((spark, dir) => {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum6(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  })

  /** Filter + projection + scalar expressions: predicate reaches the
    * parquet scan (PushedFilters), only 5 columns read (ReadSchema).
    * Covers SURVEY §2.2 P1/P3/P4/P10. */
  val q2Filter: Op = Op(
    "q2_filter_project",
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(27,6)) AS DOUBLE) AS charged,
             CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
             COALESCE(NULLIF(l_returnflag, 'N'), 'NONE') AS flag_norm
      FROM lineitem
      WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      ORDER BY l_orderkey, l_linenumber, charged, qty_decile, flag_norm
    """))((spark, dir) => {
    Tables.lineitem(spark, dir)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .cast("decimal(27,6)").cast("double").as("charged"),
        floor(col("l_quantity") / 10).as("qty_decile"),
        coalesce(nullif(col("l_returnflag"), lit("N")), lit("NONE")).as("flag_norm"))
      .orderBy("l_orderkey", "l_linenumber", "charged", "qty_decile", "flag_norm")
  })

  /** Full star join lineitem⋈orders⋈customer⋈nation⋈region → revenue per
    * (region, nation, year). The reference's J1-J4 broadcast dim joins +
    * G4 SUM/GROUP BY serving shape (queries-scripts.py:15-18,35-38).
    * nation/region/customer broadcast; lineitem⋈orders shuffles on the
    * join key only. */
  val q3Star: Op = Op(
    "q3_star_join",
    Some("""
      SELECT r_name, n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name, o_year
      ORDER BY r_name, n_name, o_year
    """))((spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    // Aggregate per order BEFORE the orders join (revenue and the line
    // count are both additive; decimal partials re-sum exactly): the
    // orderkey shuffle carries one row per order, not per line — the
    // q10/q9/q8 aggregate-before-join shape.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(27,6)")).as("rev"),
        count(lit(1)).as("n_li"))
    perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(col("rev")).cast("double").as("revenue"),
        sum(col("n_li")).as("n_items"))
      .orderBy("r_name", "n_name", "o_year")
  })

  /** Band (theta/range) join — the reference's J5/J6 `dimDemografia` /
    * `dimInfoNascimento` age- and weight-band joins
    * (spark_script_sim.py:361-373, spark_script_sinasc.py:218-250):
    * left join against a small band dimension on
    * `v >= lo AND (hi IS NULL OR v < hi)`. The band table is tiny so the
    * plan is a BroadcastNestedLoopJoin — constant work per probe row,
    * embarrassingly parallel, safe at 100 TB (the non-equi side never
    * shuffles the big table). */
  val q4Band: Op = Op(
    "q4_band_join",
    Some("""
      WITH bands(band, lo, hi) AS (
        VALUES ('1_negative', -100000.0, 0.0),
               ('2_low',      0.0,       1000.0),
               ('3_mid',      1000.0,    5000.0),
               ('4_high',     5000.0,    CAST(NULL AS DOUBLE))
      )
      SELECT band,
             CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer
      LEFT JOIN bands ON c_acctbal >= lo AND (hi IS NULL OR c_acctbal < hi)
      GROUP BY band
      ORDER BY band NULLS FIRST
    """))((spark, dir) => {
    import spark.implicits._
    val bands = Seq(
      ("1_negative", Some(-100000.0), Some(0.0)),
      ("2_low", Some(0.0), Some(1000.0)),
      ("3_mid", Some(1000.0), Some(5000.0)),
      ("4_high", Some(5000.0), Option.empty[Double]))
      .toDF("band", "lo", "hi")
    Tables.customer(spark, dir)
      .join(
        broadcast(bands),
        col("c_acctbal") >= col("lo") && (col("hi").isNull || col("c_acctbal") < col("hi")),
        "left")
      .groupBy("band")
      .agg(
        count(lit(1)).as("n_cust"),
        Exact.dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("band")
  })

  override def ops: Seq[Op] = Seq(q1Agg, q2Filter, q3Star, q4Band)
}
