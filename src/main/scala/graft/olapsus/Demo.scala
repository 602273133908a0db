package graft.olapsus

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the parity pipeline: seed dims → ingest
  * SIM + SINASC fixture batches → answer all six serving queries.
  *
  *   sbt "runMain graft.olapsus.Demo [workDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .map(java.nio.file.Paths.get(_))
      .getOrElse(Files.createTempDirectory("olapsus-demo"))
    Files.createDirectories(dir)
    val spark = graft.GraftSession.builder("olapsus-demo",
      graft.GraftSession.envCpus("4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val municipioCsv = Fixtures.write(dir, "municipio.csv", Fixtures.municipio)
    val cboCsv = Fixtures.write(dir, "cbo.csv", Fixtures.cbo)
    val cidCsv = Fixtures.write(dir, "cid.csv", Fixtures.cid)
    val simCsv = Fixtures.write(dir, "sim.csv", Fixtures.sim)
    val sinascCsv = Fixtures.write(dir, "sinasc.csv", Fixtures.sinasc)

    val wh = new Warehouse(spark, dir.resolve("warehouse").toString)
    println("== seeding dimensions ==")
    Dims.seedAll(wh, municipioCsv, cboCsv, cidCsv)
    Warehouse.Dims.foreach(t => println(f"$t%-20s ${wh.table(t).count()}%,d rows"))

    println("== ingesting SINASC batch ==")
    println(s"factNascimentos rows appended: ${Pipeline.ingestSinasc(wh, sinascCsv, "2020-02-01")}")
    println("== ingesting SIM batch ==")
    println(s"factObitos rows appended: ${Pipeline.ingestSim(wh, simCsv, "2020-01-15")}")
    wh.registerViews()

    println("\n== 1. roll-up: deaths by occupation family x schooling ==")
    ServingQueries.firstRollUp(wh).show(false)
    println("== 2. roll-up/drill-down: births by state x mother age band ==")
    ServingQueries.secondRollUp(wh).show(false)
    println("== 3. slice & dice: São Carlos 2020 per month ==")
    ServingQueries.sliceAndDice(wh, "São Carlos", 2020, 2020).show(false)
    println("== 4. pivot: deaths year x UF ==")
    ServingQueries.pivotYearUf(wh).show(false)
    println("== 5. drill-across: births x deaths per city/year ==")
    ServingQueries.drillAcross(wh).show(false)
    println("== 6. top-10 causes for family 'Engenheiros' ==")
    ServingQueries.top10CausesByOccupation(wh, "Engenheiros").show(false)
    spark.stop()
  }
}
