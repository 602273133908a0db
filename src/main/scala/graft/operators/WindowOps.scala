package graft.operators

import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function coverage beyond the reference's W1/W2 (SURVEY.md §2.6):
  * running totals, lag/lead deltas, and gap-based sessionization. The
  * reference has no frame specs or LEAD/LAG (W4 "absent") — these are part
  * of the engine's extended surface.
  *
  * Scale: every window here partitions by a key (supplier / user), so the
  * sort is per-partition after a hash shuffle — no global sort, no
  * single-partition bottleneck.
  */
object WindowOps extends OpModule {

  /** Running sum + lag delta per supplier over ship date. Explicit ROWS
    * frame (both engines default to RANGE, which is equivalent here since
    * the order key is unique, but ROWS keeps intent obvious). */
  val q11Running: Op = Op(
    "q11_window_running",
    Some("""
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_qty,
             CAST(LAG(CAST(l_quantity AS DECIMAL(18,2))) OVER
                  (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
                  AS DOUBLE) AS prev_qty,
             CAST(ROW_NUMBER() OVER
                  (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
                  AS INTEGER) AS rn
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY l_suppkey, rn
    """))((spark, dir) => {
    // l_quantity as the last tiebreak: (orderkey, linenumber) is NOT
    // unique in the testdata at sf0.1; rows still tied after quantity are
    // indistinguishable in every output column, so the result is a
    // deterministic multiset either way.
    val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val w = Window.partitionBy("l_suppkey").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wo = Window.partitionBy("l_suppkey").orderBy(order: _*)
    Tables.lineitem(spark, dir)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").as("running_qty"),
        lag(col("l_quantity").cast("decimal(18,2)"), 1).over(wo).cast("double").as("prev_qty"),
        row_number().over(wo).as("rn"))
      .orderBy("l_suppkey", "rn")
  })

  /** Gap-based sessionization of the events table: a new session starts
    * when a user is idle > 30 minutes. lag → gap flag → running sum =
    * session id; then one row per session. Classic two-window pipeline,
    * shuffles once on user_id. */
  val q18Sessionize: Op = Op(
    "q18_sessionize",
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
        FROM events
      ), flagged AS (
        SELECT *,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM ev
      ), sessions AS (
        SELECT *,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS session_id
        FROM flagged
      )
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value,
             STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
      FROM sessions
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id
    """))((spark, dir) => {
    val wo = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn(
        "new_session",
        when(
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wo) > 30L * 60 * 1000000,
          lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("new_session")).over(wr).cast("long"))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        graft.Exact.dsum(col("value")).as("session_value"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"))
      .orderBy("user_id", "session_id")
  })

  override def ops: Seq[Op] = Seq(q11Running, q18Sessionize)
}
