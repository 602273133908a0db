package graft.operators

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-expression coverage: the reference's decode chains, string
  * cleanup, date-part derivation, and math helpers (SURVEY.md §2.2
  * P2/P3/P6/P8/P10/P12) exercised in one projection. Everything stays
  * inside whole-stage codegen — no UDFs.
  */
object Scalars extends OpModule {

  /** CASE decode + string/date scalar functions over orders. Mirrors the
    * reference's `F.when` decode chains (spark_script_sim.py:54-88) and
    * date-attribute derivation (init.sql:63-95). Spark `weekday()` is
    * 0=Monday; DuckDB `isodow` is 1=Monday — aligned via +1. */
  val q16Scalars: Op = Op(
    "q16_scalar_funcs",
    Some("""
      SELECT o_orderkey,
             CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                                WHEN 'P' THEN 'Pending' ELSE 'Ignorado' END AS status_label,
             CAST(CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER) AS INTEGER) AS priority_num,
             UPPER(REGEXP_REPLACE(o_orderpriority, '[^A-Za-z]', '', 'g')) AS priority_word,
             LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_padded,
             CONCAT_WS('|', o_orderstatus, o_orderpriority) AS status_sig,
             STRFTIME(o_orderdate, '%Y-%m-%d') AS order_day,
             CAST(YEAR(o_orderdate) AS INTEGER) AS yr,
             CAST(MONTH(o_orderdate) AS INTEGER) AS mo,
             CAST(DAYOFMONTH(o_orderdate) AS INTEGER) AS dom,
             CAST(DAYOFYEAR(o_orderdate) AS INTEGER) AS doy,
             CAST(ISODOW(o_orderdate) AS INTEGER) AS iso_dow,
             CAST(CEIL(MONTH(o_orderdate) / 3.0) AS INTEGER) AS trimester,
             CAST(ROUND(o_totalprice / 1000, 1) AS DOUBLE) AS price_k
      FROM orders
      WHERE o_orderkey % 7 = 0
      ORDER BY o_orderkey
    """))((spark, dir) => {
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "O", "Open")
          .when(col("o_orderstatus") === "F", "Finished")
          .when(col("o_orderstatus") === "P", "Pending")
          .otherwise("Ignorado").as("status_label"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("priority_num"),
        upper(regexp_replace(col("o_orderpriority"), "[^A-Za-z]", "")).as("priority_word"),
        lpad(col("o_orderkey").cast("string"), 12, "0").as("key_padded"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("status_sig"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofyear(col("o_orderdate")).as("doy"),
        (weekday(col("o_orderdate")) + 1).as("iso_dow"),
        ceil(month(col("o_orderdate")) / 3.0).cast("int").as("trimester"),
        round(col("o_totalprice") / 1000, 1).as("price_k"))
      .orderBy("o_orderkey")
  })

  override def ops: Seq[Op] = Seq(q16Scalars)
}
