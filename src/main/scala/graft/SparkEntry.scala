package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) registers here via an [[OpModule]]; the driver runs each
  * `queries` entry at sf0.01 and hash-compares against `oracleSql` run in
  * DuckDB over the same parquet tables.
  */
object SparkEntry {

  private val modules: Seq[OpModule] = Seq(
    graft.operators.Relational,
    graft.operators.OlapCube,
    graft.operators.WindowOps,
    graft.operators.SetOps,
    graft.operators.Scalars,
    graft.operators.EventOps,
    graft.operators.TextOps,
    graft.operators.Dedup,
    graft.operators.Similarity,
    graft.operators.AnnIndex,
    graft.operators.Multimodal,
    graft.operators.Curation,
    graft.operators.Maintenance,
    graft.operators.Extras)

  private lazy val allOps: Seq[Op] = modules.flatMap(_.ops)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Relational.q3Star.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _.trim)).toMap
}
