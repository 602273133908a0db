package graft.operators

import graft.{Exact, Op, OpModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining reference-operator shapes re-homed on the testdata, closing
  * out SURVEY.md §2 coverage:
  *
  *  - q19: JSON field extraction (events.props is a JSON string — the
  *    schemaless column case).
  *  - q20: the time-of-day spine join (J2 + P7): a generated in-query
  *    minute dim with period buckets, joined on a formatted time string
  *    exactly like dimHorario (spark_script_sim.py:340-344,
  *    init.sql:116-130).
  *  - q21: the bridge-table id-assignment shape (A6/A7/W1): per-entity
  *    canonical signature from a sorted collected list, then dense group
  *    ids by signature order (spark_script_sim.py:181-227).
  */
object Extras extends OpModule {

  /** JSON extraction + aggregation over the extracted key. */
  val q19Json: Op = Op(
    "q19_json_extract",
    Some("""
      SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER) AS k_bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY k_bucket
      ORDER BY k_bucket
    """))((spark, dir) => {
    Tables.events(spark, dir)
      .select(
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_bucket"),
        col("value"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("total_value"))
      .orderBy("k_bucket")
  })

  /** Generated minute-of-day spine (1440 rows, period buckets as in
    * dimHorario) joined on a formatted HH:mm string. */
  val q20TimeSpine: Op = Op(
    "q20_time_spine_join",
    Some("""
      WITH spine AS (
        SELECT m, m // 60 AS hora,
               printf('%02d:%02d', m // 60, m % 60) AS mm_str,
               CASE WHEN m // 60 BETWEEN 0 AND 5 THEN 'madrugada'
                    WHEN m // 60 BETWEEN 6 AND 11 THEN 'manhã'
                    WHEN m // 60 BETWEEN 12 AND 17 THEN 'tarde'
                    ELSE 'noite' END AS periodo
        FROM (SELECT UNNEST(generate_series(0, 1439)) AS m)
      )
      SELECT periodo,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM (SELECT strftime(CAST(ts AS TIMESTAMP), '%H:%M') AS mm_str, value FROM events) e
      JOIN spine USING (mm_str)
      GROUP BY periodo
      ORDER BY periodo
    """))((spark, dir) => {
    val spine = spark.range(0, 1440)
      .select(
        format_string("%02d:%02d", (col("id") / 60).cast("int"), (col("id") % 60).cast("int")).as("mm_str"),
        when((col("id") / 60).cast("int").between(0, 5), "madrugada")
          .when((col("id") / 60).cast("int").between(6, 11), "manhã")
          .when((col("id") / 60).cast("int").between(12, 17), "tarde")
          .otherwise("noite").as("periodo"))
    Tables.events(spark, dir)
      .select(date_format(col("ts"), "HH:mm").as("mm_str"), col("value"))
      .join(broadcast(spine), Seq("mm_str"))
      .groupBy("periodo")
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .orderBy("periodo")
  })

  /** Canonical signature per customer (sorted collected order-shapes)
    * plus dense group ids assigned by signature order — the cause-bridge
    * machinery as a relational query. */
  val q21GroupIds: Op = Op(
    "q21_group_signature_ids",
    Some("""
      WITH sigs AS (
        SELECT o_custkey,
               md5(array_to_string(list_sort(list(o_orderstatus || ':' || o_orderpriority)), '|')) AS sig,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY o_custkey
      )
      SELECT o_custkey, sig, n_orders,
             CAST(DENSE_RANK() OVER (ORDER BY sig) AS INTEGER) AS group_id
      FROM sigs
      ORDER BY o_custkey
    """))((spark, dir) => {
    val sigs = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        concat(col("o_orderstatus"), lit(":"), col("o_orderpriority")).as("item"))
      .groupBy("o_custkey")
      .agg(
        md5(concat_ws("|", array_sort(collect_list(col("item"))))).as("sig"),
        count(lit(1)).as("n_orders"))
    sigs
      .withColumn("group_id", dense_rank().over(Window.orderBy("sig")))
      .orderBy("o_custkey")
  })

  override def ops: Seq[Op] = Seq(q19Json, q20TimeSpine, q21GroupIds)
}
