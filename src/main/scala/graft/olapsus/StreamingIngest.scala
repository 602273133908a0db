package graft.olapsus

import org.apache.spark.sql.functions.monotonically_increasing_id
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Streaming re-expression of the reference's daily ingest loop
  * (SURVEY.md §1.1 optional stretch): instead of Airflow re-running a
  * batch job per `dt=` partition (dags/spark_dag.py:48-78), the landing
  * directory IS a file stream — `Trigger.AvailableNow` drains whatever
  * has arrived and checkpoints progress, so each file is ingested
  * exactly once across restarts. Each micro-batch goes through the SAME
  * batch transforms/resolvers (`foreachBatch`), so semantics are
  * byte-identical to `Pipeline.ingest*`.
  */
object StreamingIngest {

  private def schemaOf(header: String): StructType =
    StructType(header.split(";").map(c => StructField(c, StringType)))

  val sinascSchema: StructType = schemaOf(Fixtures.sinasc.head)
  val simSchema: StructType = schemaOf(Fixtures.sim.head)

  private def csvStream(wh: Warehouse, dir: String, schema: StructType): DataFrame =
    wh.spark.readStream
      .option("header", "true").option("sep", ";")
      .schema(schema)
      .csv(dir)

  /** Drain all available SINASC CSVs from `landingDir` into
    * factNascimentos; one fact append per micro-batch. */
  def sinasc(wh: Warehouse, landingDir: String): StreamingQuery =
    csvStream(wh, landingDir, sinascSchema).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${wh.root}/.checkpoints/sinasc")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val fact = Pipeline.resolveSinasc(Transforms.sinasc(batch), wh)
          wh.append("factNascimentos", fact, s"stream-$id")
        }
      }
      .start()

  /** Drain all available SIM CSVs: bridge merge + factObitos append per
    * micro-batch (single-writer, as in the batch path). */
  def sim(wh: Warehouse, landingDir: String): StreamingQuery =
    csvStream(wh, landingDir, simSchema).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${wh.root}/.checkpoints/sim")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val clean = Transforms.sim(batch.withColumn("row_id", monotonically_increasing_id()))
          if (!wh.exists(Warehouse.Signatures))
            wh.write(Warehouse.Signatures, CauseBridge.signatures(wh.table(Warehouse.Bridge)))
          val bridge = CauseBridge.resolve(clean, wh.table("dimCausa"),
            wh.table(Warehouse.Bridge), Some(wh.table(Warehouse.Signatures)))
          // Append only the new groups' rows (files of pre-existing
          // groups are never rewritten) — O(new groups) per micro-batch.
          val newRows = bridge.newBridgeRows.cache()
          if (newRows.count() > 0) {
            wh.appendRows(Warehouse.Bridge, newRows)
            wh.appendRows(Warehouse.Signatures, bridge.newSignatureRows)
          }
          wh.append("factObitos", Pipeline.resolveSim(bridge.resolved, wh), s"stream-$id")
          newRows.unpersist()
          ()
        }
      }
      .start()
}
