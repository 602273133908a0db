package graft.operators

import graft.functions.TextFns
import graft.{Op, OpModule, Tables}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the capstone composition showing the
  * dedup/quality/split primitives assemble into the actual
  * training-data pipeline a user would run:
  *
  *   1. quality gate: ≥ 20 whitespace tokens (t23's signal family);
  *   2. exact dedup: keep the smallest doc_id per md5(text) (d1);
  *   3. near-dup drop: any document appearing as the LARGER id of a
  *      MinHash-LSH near-dup pair (d2's pair generation, reused
  *      verbatim) is dropped — the deterministic keep-smaller rule;
  *   4. split: md5-bucket 80/10/10 train/valid/test (t27);
  *   5. census: surviving docs + token volume per (lang, split).
  *
  * Every stage is the oracle-checked operator itself (not a re-
  * implementation), and each is partition-parallel: two hash
  * aggregates, one banded self-join, one broadcast-able anti-join.
  */
object Curation extends OpModule {

  val c1Curation: Op = Op(
    "c1_corpus_curation", {
      // Near-dup pairs: the same CTE chain as d2's oracle.
      val d2Oracle = Dedup.d2MinHashLsh.oracle.get
      val pairCtes = d2Oracle.substring(
        d2Oracle.indexOf("WITH ") + 5, d2Oracle.lastIndexOf("SELECT doc_a"))
        .trim.stripSuffix(",")
      Some(s"""
      WITH $pairCtes,
      base AS (
        SELECT doc_id, lang, text,
               len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens
        FROM documents
        WHERE len(list_filter(string_split(text, ' '), x -> x != '')) >= 20
      ), exact AS (
        SELECT * FROM base
        WHERE doc_id IN (SELECT MIN(doc_id) FROM base GROUP BY md5(text))
      ), neardrop AS (
        SELECT * FROM exact
        WHERE doc_id NOT IN (SELECT doc_b FROM scored WHERE jac >= 0.5)
      ), split AS (
        SELECT lang, n_tokens,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        FROM (SELECT *,
                CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
              FROM neardrop)
      )
      SELECT lang, split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM split
      GROUP BY lang, split
      ORDER BY lang, split
    """)
    })((spark, dir) =>
    // d2's pair SET (unsorted): the anti-join needs membership, not order.
    curate(spark, dir,
      Dedup.d2Pairs(spark, dir).select(col("doc_b").as("doc_id")).distinct()))

  /** The curation DAG with the near-dup drop set injected — shared by
    * the inline oracle query (c1) and the persisted-pair-table path. */
  private def curate(spark: org.apache.spark.sql.SparkSession, dir: String,
      nearDupDocs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("text"),
        size(TextFns.tokens(col("text"))).as("n_tokens"))
      .filter(col("n_tokens") >= 20)
    val keepers = base.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = base.join(keepers, Seq("doc_id"), "semi")
    val nearDrop = exact.join(nearDupDocs, Seq("doc_id"), "anti")
    val bucket =
      conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long") % 100
    nearDrop
      .select(col("lang"), col("n_tokens"),
        when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .orderBy("lang", "split")
  }

  /** Build the near-dup pair table ONCE and persist it. c1 recomputes
    * d2's banded self-join inside its own DAG — correct, but at 100 TB
    * the pair table is the expensive nightly artifact: build it here,
    * write it to the warehouse, and let every curation run (and any
    * incremental re-curation) anti-join against the stored table via
    * [[curateAgainstPairs]] instead of re-deriving it per query. */
  def persistNearDupPairs(spark: org.apache.spark.sql.SparkSession, dir: String,
      tablePath: String): Long = {
    // Unsorted pair SET: parquet has no meaningful row order and every
    // reader treats the table as a set — d2's ORDER BY would be a
    // table-wide sort paid for nothing.
    Dedup.d2Pairs(spark, dir)
      .write.mode("overwrite").parquet(tablePath)
    spark.read.parquet(tablePath).count()
  }

  /** c1's curation census computed against a persisted pair table —
    * byte-identical output to the inline pipeline (CurationSpec pins
    * the equivalence). */
  def curateAgainstPairs(spark: org.apache.spark.sql.SparkSession, dir: String,
      tablePath: String): org.apache.spark.sql.DataFrame =
    curate(spark, dir,
      spark.read.parquet(tablePath).select(col("doc_b").as("doc_id")).distinct())

  override def ops: Seq[Op] = Seq(c1Curation)
}
