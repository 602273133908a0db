package graft.olapsus

import org.apache.spark.sql.functions.{col, monotonically_increasing_id}
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

  /** One SINASC micro-batch through the batch resolvers; `label` is the
    * fact `dt=` partition value. */
  private[olapsus] def ingestSinascBatch(wh: Warehouse, batch: DataFrame,
      label: String): Unit =
    // Per-micro-batch lease: a batch driver run concurrently against the
    // same warehouse fails fast instead of interleaving appends.
    graft.WriterLease.withLease(wh.spark, wh.root,
      graft.WriterLease.processOwner("stream-sinasc"), scope = "sinasc") {
      ingestSinascBatchLeased(wh, batch, label)
    }

  private def ingestSinascBatchLeased(wh: Warehouse, batch: DataFrame,
      label: String): Unit = {
    val fact = Pipeline.resolveSinasc(Transforms.sinasc(batch), wh)
    wh.append("factNascimentos", fact, label)
  }

  /** One SIM micro-batch: bridge merge + factObitos append
    * (single-writer, as in the batch path). */
  private[olapsus] def ingestSimBatch(wh: Warehouse, batch: DataFrame,
      label: String): Unit =
    graft.WriterLease.withLease(wh.spark, wh.root,
      graft.WriterLease.processOwner("stream-sim"), scope = "sim") {
      ingestSimBatchLeased(wh, batch, label)
    }

  private def ingestSimBatchLeased(wh: Warehouse, batch: DataFrame,
      label: String): Unit = {
    val clean = Transforms.sim(batch.withColumn("row_id", monotonically_increasing_id()))
    if (!wh.exists(Warehouse.Signatures))
      wh.write(Warehouse.Signatures, CauseBridge.signatures(wh.table(Warehouse.Bridge)))
    val bridge = CauseBridge.resolve(clean, wh.table("dimCausa"),
      wh.table(Warehouse.Bridge), Some(wh.table(Warehouse.Signatures)))
    // Append only the new groups' rows (files of pre-existing groups are
    // never rewritten) — O(new groups) per micro-batch.
    val newRows = bridge.newBridgeRows.cache()
    if (newRows.count() > 0) {
      wh.appendRows(Warehouse.Bridge, newRows)
      wh.appendRows(Warehouse.Signatures, bridge.newSignatureRows)
    }
    wh.append("factObitos", Pipeline.resolveSim(bridge.resolved, wh), label)
    newRows.unpersist()
    ()
  }

  /** Drain all available SINASC CSVs from `landingDir` into
    * factNascimentos; one fact append per micro-batch. */
  def sinasc(wh: Warehouse, landingDir: String): StreamingQuery =
    csvStream(wh, landingDir, sinascSchema).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${wh.root}/.checkpoints/sinasc")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) ingestSinascBatch(wh, batch, s"stream-$id")
      }
      .start()

  /** Drain all available SIM CSVs: bridge merge + factObitos append per
    * micro-batch (single-writer, as in the batch path). */
  def sim(wh: Warehouse, landingDir: String): StreamingQuery =
    csvStream(wh, landingDir, simSchema).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${wh.root}/.checkpoints/sim")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) ingestSimBatch(wh, batch, s"stream-$id")
      }
      .start()

  /** Has the STREAM backfill itself ever written to day `d`? (Its
    * per-(day, micro-batch) manifest keys are `d#sb<id>` — never a
    * calendar date, so the batch driver's equality lookups ignore
    * them.) */
  private def streamTouched(wh: Warehouse, dataset: String, d: String): Boolean = {
    import org.apache.spark.sql.functions.{col, lit}
    wh.exists(Warehouse.IngestLog) &&
      !wh.table(Warehouse.IngestLog)
        .where(col("dataset") === lit(dataset) && col("dt").startsWith(s"$d#sb"))
        .isEmpty
  }

  /** Streaming twin of [[Pipeline.backfill]]: the whole dt-partitioned
    * landing tree (`prefix/dataset/dt=…/…`) is ONE file stream. `dt` is
    * recovered as a hive partition column, and each micro-batch splits
    * by day so facts land in the same per-day `dt=` partitions the
    * batch driver writes.
    *
    * Crash safety: the checkpoint guarantees a replayed micro-batch id
    * carries exactly the same files, and every applied (day, batch) is
    * logged to the manifest as `d#sb<id>` BEFORE the day itself — so a
    * replay after a crash skips the day-batches that committed and
    * re-applies only the ones that didn't. The remaining window is a
    * crash between a day's fact append and its `d#sb` log row — the
    * same append-then-log exposure, at the same single-writer contract,
    * as the batch driver's `ingest → logIngest` pair, but narrowed to
    * one day of one micro-batch instead of the whole run.
    *
    * Composition with the batch driver, both directions: completed days
    * are also logged under their plain date, so the BATCH driver skips
    * days the stream ingested; and a day the manifest knows but this
    * stream has never touched was the BATCH driver's work, so the
    * stream skips its files rather than double-appending them (late
    * files for such a day are dropped — identical to the batch
    * driver's own day-granular idempotency). Don't run both drivers
    * concurrently. */
  def backfill(wh: Warehouse, prefix: String, dataset: String): StreamingQuery = {
    // UNLEASED per-day bodies: the foreachBatch below holds the dataset
    // lease across the manifest checks AND the appends AND the log rows —
    // leasing only the append (and checking/logging outside it) would
    // re-open the read-before-write window the batch path closes by
    // checking the manifest inside its lease.
    val (schema, perDay) = dataset match {
      case "sinasc" =>
        (sinascSchema, (b: DataFrame, d: String) => ingestSinascBatchLeased(wh, b, d))
      case "sim" =>
        (simSchema, (b: DataFrame, d: String) => ingestSimBatchLeased(wh, b, d))
      case other => sys.error(s"unknown dataset $other (sim|sinasc)")
    }
    val withDt = StructType(schema.fields :+ StructField("dt", StringType))
    csvStream(wh, s"$prefix/$dataset", withDt).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"${wh.root}/.checkpoints/backfill-$dataset")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        // A micro-batch may span days; the day count is bounded by the
        // backfill window, so the driver-side loop is tiny.
        val days = batch.select("dt").distinct()
          .collect().map(_.getString(0)).sorted
        graft.WriterLease.withLease(wh.spark, wh.root,
          graft.WriterLease.processOwner(s"stream-backfill-$dataset"),
          scope = dataset) {
          days.foreach { d =>
            val dayBatchKey = s"$d#sb$id"
            val replayed = wh.ingestLogged(dataset, dayBatchKey)
            val batchDriverOwns =
              !replayed && wh.ingestLogged(dataset, d) && !streamTouched(wh, dataset, d)
            if (!replayed && !batchDriverOwns) {
              perDay(batch.filter(col("dt") === d).drop("dt"), d)
              wh.logIngest(dataset, dayBatchKey)
              if (!wh.ingestLogged(dataset, d)) wh.logIngest(dataset, d)
            }
          }
        }
      }
      .start()
  }
}
