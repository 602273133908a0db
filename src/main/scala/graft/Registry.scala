package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operation: a Spark implementation plus (usually) an
  * equivalent DuckDB SQL oracle over the same parquet tables. Operations
  * without a SQL-expressible oracle (e.g. opaque binary decode plumbing)
  * set `oracle = None` and get the driver's weaker rows-only check.
  */
final case class Op(
    name: String,
    oracle: Option[String])(
    val run: (SparkSession, String) => DataFrame)

trait OpModule {
  def ops: Seq[Op]
}
