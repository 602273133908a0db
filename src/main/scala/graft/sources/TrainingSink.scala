package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: the handoff from the curation engine to a
  * training job — JSONL shards with DETERMINISTIC shard assignment.
  *
  * Sharding is a pure function of a caller-named key column (15-hex
  * md5 prefix → int64 → mod nShards, the repo's standard cross-engine
  * hash), NOT of Spark's physical partitioning: re-running the export
  * over the same rows lands every row in the same shard file no matter
  * the parallelism, join order, or cluster size that produced the
  * DataFrame. That is what makes downstream jobs resumable per shard
  * and diffs meaningful across runs.
  *
  * Layout: `path/shard=K/part-*.json.gz` — one file per shard because
  * rows are first repartitioned BY the shard column (each shard's rows
  * land in exactly one task) and then `partitionBy` writes each shard
  * to its own directory. At 100 TB, nShards scales to thousands and
  * each task streams one shard; gzip keeps files splittable-enough at
  * the shard granularity (the unit of parallelism downstream).
  */
object TrainingSink {

  /** Deterministic shard id for a key column. */
  def shardOf(key: org.apache.spark.sql.Column, nShards: Int): org.apache.spark.sql.Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(nShards.toLong)).cast("int")

  /** Write `df` as gzip JSONL under `path/shard=K/`, sharded by
    * md5(keyCol) % nShards. Returns the number of rows written.
    *
    * The row count is observed on the write pass itself (no second scan,
    * and no schema-inference failure when the input is empty), and a
    * caller-supplied `shard` column is rejected rather than silently
    * overwritten and dropped from the export. */
  def writeJsonlShards(df: DataFrame, path: String, keyCol: String,
      nShards: Int): Long = {
    require(nShards > 0, "nShards must be positive")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column; rename it — the sink owns that name")
    val obs = org.apache.spark.sql.Observation()
    df.withColumn("shard", shardOf(col(keyCol), nShards))
      .observe(obs, count(lit(1)).as("n"))
      .repartition(nShards, col("shard"))
      .write
      .mode("overwrite")
      .partitionBy("shard")
      .option("compression", "gzip")
      .json(path)
    obs.get("n").asInstanceOf[Long]
  }

  /** Read an exported shard tree back (shard recovered as a partition
    * column). */
  def readJsonlShards(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
