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
    * dimHorario) joined on the minute-of-day INT — not a formatted
    * "HH:mm" string: the int key skips a per-row date_format string
    * build and hashes/compares as a primitive inside codegen, which at
    * 100 TB of events is the difference between a long-key and an
    * int-key shuffle-free broadcast probe. */
  private val minuteSpineRows: Seq[(Int, String)] = (0 until 1440).map { m =>
    val periodo = m / 60 match {
      case h if h <= 5 => "madrugada"
      case h if h <= 11 => "manhã"
      case h if h <= 17 => "tarde"
      case _ => "noite"
    }
    (m, periodo)
  }

  val q20TimeSpine: Op = Op(
    "q20_time_spine_join",
    Some("""
      WITH spine AS (
        SELECT m AS mod,
               CASE WHEN m // 60 BETWEEN 0 AND 5 THEN 'madrugada'
                    WHEN m // 60 BETWEEN 6 AND 11 THEN 'manhã'
                    WHEN m // 60 BETWEEN 12 AND 17 THEN 'tarde'
                    ELSE 'noite' END AS periodo
        FROM (SELECT UNNEST(generate_series(0, 1439)) AS m)
      )
      SELECT periodo,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM (SELECT CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) * 60
                        + EXTRACT(minute FROM CAST(ts AS TIMESTAMP)) AS INT) AS mod,
                   value FROM events) e
      JOIN spine USING (mod)
      GROUP BY periodo
      ORDER BY periodo
    """))((spark, dir) => {
    import spark.implicits._
    // Driver-built LocalRelation, not spark.range: the spine is 1440
    // rows BY DEFINITION (minutes in a day), so materializing it on the
    // driver lets the broadcast build skip a whole Spark job per
    // execution — the generated-spine-as-job shape only pays off when
    // the spine itself is data-sized.
    val spine = minuteSpineRows.toDF("mod", "periodo")
    Tables.events(spark, dir)
      // Pure long arithmetic on the epoch value (session tz is UTC, so
      // minute-of-day IS floor-mod micros-of-day / 60e6): hour()/minute()
      // go through a per-row ZoneId conversion that both JITs slowly and
      // codegens wider — on a 100 TB events scan the epoch-div form is
      // the one you want in the hot loop. pmod (not %) so pre-1970
      // timestamps land in [0, 1440) exactly like the oracle's EXTRACT;
      // truncating div is then safe because the operand is non-negative.
      .select(expr("CAST(pmod(unix_micros(ts), 86400000000) div 60000000 AS INT)").as("mod"), col("value"))
      .join(broadcast(spine), Seq("mod"))
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
    // dense_rank by sig without a single-partition window: globally rank
    // the DISTINCT signatures (two-phase, Ranks.globalRowNumber) and map
    // them back — rank-of-distinct == dense_rank, and every step is
    // partition-parallel.
    val ranked = Ranks.globalRowNumber(
      sigs.select("sig").distinct(), col("sig"), "group_id")
    sigs
      .join(ranked, Seq("sig"))
      .withColumn("group_id", col("group_id").cast("int"))
      .select("o_custkey", "sig", "n_orders", "group_id")
      .orderBy("o_custkey")
  })

  /** Grouped continuous percentiles — ordered-set aggregation. Spark's
    * `percentile` and DuckDB's `quantile_cont` share the same
    * (n−1)·p interpolation over the sorted values, and the inputs are
    * integers, so the interpolated doubles are bit-identical. (The
    * approximate variant — percentile_approx / t-digest — is the
    * at-scale swap-in; it is NOT cross-engine deterministic, which is
    * why the oracle-checked entry uses the exact form.) */
  val q28Percentiles: Op = Op(
    "q28_percentiles",
    Some("""
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             quantile_cont(n_chars, 0.5) AS p50_chars,
             quantile_cont(n_chars, 0.9) AS p90_chars,
             CAST(MAX(n_chars) AS BIGINT) AS max_chars
      FROM documents
      GROUP BY lang
      ORDER BY lang
    """))((spark, dir) => {
    Tables.documents(spark, dir)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")
  })

  /** As-of join (absent from the reference, SURVEY §2.4; essential for
    * event timelines): each purchase is matched to the user's most
    * recent signup at-or-before it. Composed from built-ins — union the
    * tagged streams, per-user ordered window, last(ignoreNulls) — which
    * shuffles each side ONCE on user_id; no custom SparkPlan needed for
    * these semantics. Build side sorts before probe at equal timestamps
    * (≤ as-of). */
  val q22AsOf: Op = Op(
    "q22_asof_join",
    Some("""
      WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        FROM events WHERE event_type IN ('signup', 'purchase')
      ), u AS (
        SELECT *,
               CASE WHEN event_type = 'signup' THEN event_id END AS sid,
               CASE WHEN event_type = 'signup' THEN epoch_us(ts) END AS sus
        FROM ev
      ), w AS (
        SELECT *,
               LAST_VALUE(sid IGNORE NULLS) OVER win AS signup_id,
               LAST_VALUE(sus IGNORE NULLS) OVER win AS signup_us
        FROM u
        WINDOW win AS (PARTITION BY user_id
                       ORDER BY ts, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      )
      SELECT event_id AS purchase_id, user_id,
             CAST(signup_id AS BIGINT) AS signup_id,
             CAST(epoch_us(ts) - signup_us AS BIGINT) AS wait_us
      FROM w WHERE event_type = 'purchase'
      ORDER BY purchase_id
    """))((spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("sid", when(col("event_type") === "signup", col("event_id")))
      .withColumn("sus", when(col("event_type") === "signup", unix_micros(col("ts"))))
    val win = Window.partitionBy("user_id")
      .orderBy(col("ts"), when(col("event_type") === "signup", 0).otherwise(1), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("signup_id", last(col("sid"), ignoreNulls = true).over(win))
      .withColumn("signup_us", last(col("sus"), ignoreNulls = true).over(win))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("signup_id"),
        (unix_micros(col("ts")) - col("signup_us")).as("wait_us"))
      .orderBy("purchase_id")
  })

  /** Explicit two-phase salted aggregation — the skew-mitigation pattern
    * (SURVEY §2.10 / the 100 TB heavy-hitter case): partial counts per
    * (key, salt) spread a hot key over 8 reducers, then a cheap final
    * re-aggregation. Result ≡ plain GROUP BY, which is the oracle. */
  val q23Salted: Op = Op(
    "q23_salted_word_freq",
    Some("""
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM (SELECT UNNEST(list_filter(string_split(text, ' '), x -> x != '')) AS word
            FROM documents)
      GROUP BY word
      ORDER BY word
    """))((spark, dir) => {
    val words = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("text"))).as("word"))
    words
      .withColumn("salt", pmod(col("doc_id"), lit(8)))
      .groupBy("word", "salt")
      .agg(count(lit(1)).as("partial"))
      .groupBy("word")
      .agg(sum(col("partial")).as("n_occurrences"))
      .orderBy("word")
  })

  /** Per-column table profiling — the data-quality census a pipeline
    * runs before training; delegates to the schema-driven
    * [[Profiler.profile]] (one aggregate row generated from the schema,
    * unpivoted to a row per column), pinned here to three lineitem
    * columns so the DuckDB oracle stays hand-writable. */
  val q29Profile: Op = Op(
    "q29_column_profile",
    Some("""
      WITH a AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS nul_orderkey,
               COUNT(DISTINCT l_orderkey) AS dis_orderkey,
               CAST(MIN(l_orderkey) AS DOUBLE) AS min_orderkey,
               CAST(MAX(l_orderkey) AS DOUBLE) AS max_orderkey,
               SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS nul_quantity,
               COUNT(DISTINCT l_quantity) AS dis_quantity,
               CAST(MIN(l_quantity) AS DOUBLE) AS min_quantity,
               CAST(MAX(l_quantity) AS DOUBLE) AS max_quantity,
               SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS nul_returnflag,
               COUNT(DISTINCT l_returnflag) AS dis_returnflag
        FROM lineitem
      )
      SELECT col, CAST(n_rows AS BIGINT) AS n_rows, CAST(n_null AS BIGINT) AS n_null,
             CAST(n_distinct AS BIGINT) AS n_distinct, vmin, vmax
      FROM (
        SELECT 'l_orderkey' AS col, n_rows, nul_orderkey AS n_null,
               dis_orderkey AS n_distinct, min_orderkey AS vmin, max_orderkey AS vmax FROM a
        UNION ALL
        SELECT 'l_quantity', n_rows, nul_quantity, dis_quantity, min_quantity, max_quantity FROM a
        UNION ALL
        SELECT 'l_returnflag', n_rows, nul_returnflag, dis_returnflag, NULL, NULL FROM a
      )
      ORDER BY col
    """))((spark, dir) => {
    Profiler.profile(
      Tables.lineitem(spark, dir),
      Seq("l_orderkey", "l_quantity", "l_returnflag"))
  })

  /** Referential-integrity audit across the star schema: for each
    * fact→dim relationship, total fact rows, rows with a NULL foreign
    * key, and rows whose key resolves to no dim row (dangling) — the
    * cross-table conformance census q29's single-table profile can't
    * see, and the check every warehouse load gates on before exposing a
    * partition. ONE pass per fact: the dim-side relationships
    * (part/supplier/customer) resolve as broadcast key-set left joins
    * riding the same scan that counts rows and null keys; the fact→fact
    * relationship (lineitem.l_orderkey→orders) pays a shuffled ANTI
    * join — orders is not broadcastable at 100 TB — reading the cached
    * 3-column projection rather than re-scanning parquet, so lineitem
    * is scanned once across all of its audits. No row ever carries
    * more than its key columns. */
  val q34FkAudit: Op = Op(
    "q34_fk_audit",
    Some("""
      WITH rel AS (
        SELECT 'lineitem.l_orderkey->orders' AS relationship,
               (SELECT COUNT(*) FROM lineitem) AS n_rows,
               (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS n_null_key,
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_orderkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_dangling
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_partkey IS NULL),
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_partkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               (SELECT COUNT(*) FROM lineitem),
               (SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NULL),
               (SELECT COUNT(*) FROM lineitem l
                WHERE l.l_suppkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey IS NOT NULL
                  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      )
      SELECT relationship, CAST(n_rows AS BIGINT) AS n_rows,
             CAST(n_null_key AS BIGINT) AS n_null_key,
             CAST(n_dangling AS BIGINT) AS n_dangling
      FROM rel
      ORDER BY relationship
    """))((spark, dir) => {
    // coalesce everywhere a SUM could see an empty table: the oracle's
    // subquery COUNT is 0 there — keep both engines at 0.
    def nulls(key: String) =
      coalesce(sum(when(col(key).isNull, 1L).otherwise(0L)), lit(0L))
    def dangling(key: String, hitKey: String) =
      coalesce(sum(when(col(key).isNotNull && col(hitKey).isNull, 1L)
        .otherwise(0L)), lit(0L))
    // distinct() matters: a duplicated dim key (exactly the integrity
    // defect an FK audit exists to surface) must not fan out fact rows
    // through the left join and inflate the counts — EXISTS semantics,
    // like the oracle.
    def keySet(dim: org.apache.spark.sql.DataFrame, dimKey: String, as: String) =
      broadcast(dim.select(col(dimKey).as(as)).distinct())
    // Projected once, cached: the stats pass and the orders anti join
    // are the fact's only two consumers — the second reads the 3-column
    // cache instead of re-scanning parquet.
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
      .cache()
    val liStats = li
      .join(keySet(Tables.part(spark, dir), "p_partkey", "pk"),
        col("l_partkey") === col("pk"), "left")
      .join(keySet(Tables.supplier(spark, dir), "s_suppkey", "sk"),
        col("l_suppkey") === col("sk"), "left")
      .agg(
        count(lit(1)).as("li_rows"),
        nulls("l_orderkey").as("nul_ord"),
        nulls("l_partkey").as("nul_part"),
        nulls("l_suppkey").as("nul_supp"),
        dangling("l_partkey", "pk").as("dang_part"),
        dangling("l_suppkey", "sk").as("dang_supp"))
    val dangOrd = li.select("l_orderkey").filter(col("l_orderkey").isNotNull)
      .join(Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "anti")
      .agg(count(lit(1)).as("dang_ord"))
    val oStats = Tables.orders(spark, dir).select("o_custkey")
      .join(keySet(Tables.customer(spark, dir), "c_custkey", "ck"),
        col("o_custkey") === col("ck"), "left")
      .agg(
        count(lit(1)).as("o_rows"),
        nulls("o_custkey").as("nul_cust"),
        dangling("o_custkey", "ck").as("dang_cust"))
    // Three 1-row aggregates → one cross-joined row → exploded into the
    // four relationship rows IN THE PLAN (array of structs), so the op
    // stays lazy like every other Op (no driver collect inside the query
    // function) and each fact is still scanned once — unioning four
    // projections of the joined row would re-run the scans per branch.
    def rel(name: String, rows: String, nul: String, dang: String) =
      struct(lit(name).as("relationship"), col(rows).as("n_rows"),
        col(nul).as("n_null_key"), col(dang).as("n_dangling"))
    liStats.crossJoin(broadcast(dangOrd)).crossJoin(broadcast(oStats))
      .select(explode(array(
        rel("lineitem.l_orderkey->orders", "li_rows", "nul_ord", "dang_ord"),
        rel("lineitem.l_partkey->part", "li_rows", "nul_part", "dang_part"),
        rel("lineitem.l_suppkey->supplier", "li_rows", "nul_supp", "dang_supp"),
        rel("orders.o_custkey->customer", "o_rows", "nul_cust", "dang_cust")))
        .as("r"))
      .select(col("r.relationship").as("relationship"), col("r.n_rows").as("n_rows"),
        col("r.n_null_key").as("n_null_key"), col("r.n_dangling").as("n_dangling"))
      .orderBy("relationship")
  })

  override def ops: Seq[Op] =
    Seq(q19Json, q20TimeSpine, q21GroupIds, q22AsOf, q23Salted, q28Percentiles,
      q29Profile, q34FkAudit)
}
