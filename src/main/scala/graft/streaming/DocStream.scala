package graft.streaming

import graft.operators.NearDupIndex
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance of the near-duplicate index: the document
  * landing directory is a file stream, and every micro-batch runs
  * [[NearDupIndex.addDocuments]] — new docs are probed against the
  * whole indexed corpus via their LSH buckets only, so per-batch cost
  * is O(batch × bucket size) regardless of corpus size.
  * `Trigger.AvailableNow` + checkpointing gives exactly-once per file
  * across restarts (the same shape as the warehouse's streaming
  * ingest), and the index's own doc_id anti-join makes replayed
  * batches no-ops even without the checkpoint. */
object DocStream {

  def indexDocuments(spark: SparkSession, landingDir: String, indexRoot: String,
      schema: StructType, maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexRoot/.checkpoint")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          NearDupIndex.addDocuments(batch.sparkSession, batch, indexRoot)
          ()
        }
      }
      .start()

  /** Streaming maintenance of the persisted ANN index: new embedding
    * files stream in and every micro-batch runs
    * [[graft.operators.AnnIndex.append]] — encode under the FROZEN
    * codebooks, per-family anti-join dedup, so replays (checkpointed or
    * not) converge exactly like the batch path. Retraining stays an
    * explicit offline rebuild, matching the FAISS train-then-add
    * contract. */
  def indexEmbeddings(spark: SparkSession, landingDir: String, indexRoot: String,
      schema: StructType, maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexRoot/.vec_checkpoint")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.AnnIndex.append(
            batch.sparkSession, indexRoot, batch.select("vec_id", "label", "embedding"))
        }
      }
      .start()
}
