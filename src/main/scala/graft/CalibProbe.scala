package graft

import org.apache.spark.sql.functions.expr

/** Measurement-only window probe (r15): prints Bench's three ambient
  * calibrations (CPU / page-cached scan / shuffle) without running the
  * sweep, so a session can tell a degraded box window (the r10-r15
  * phenomenon: identical code 1.4-3x slower, steal 0) from a code
  * effect before committing a gate number.
  *
  *   sbt "runMain graft.CalibProbe [sfDir]"
  */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = GraftSession.envCpus()
    val spark = GraftSession.builder("graft-calibprobe", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(f: => Unit): Double = { time(f); med((1 to 3).map(_ => time(f))) }
    val cpu = probe {
      spark.range(0L, 500000000L, 1L, cpus.toInt)
        .selectExpr("bit_xor(xxhash64(id)) as s").collect(); ()
    }
    val io = probe {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .selectExpr("bit_xor(xxhash64(l_orderkey, l_shipdate, l_returnflag)) as s")
        .collect(); ()
    }
    val sh = probe {
      spark.range(0L, 20000000L, 1L, cpus.toInt)
        .selectExpr("id % 1000000 as k", "xxhash64(id) as v")
        .groupBy("k").agg(expr("bit_xor(v) as x"))
        .selectExpr("bit_xor(x) as s").collect(); ()
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"""CALIB cpu=${fmt(cpu)} io=${fmt(io)} sh=${fmt(sh)}""")
    spark.stop()
  }
}
