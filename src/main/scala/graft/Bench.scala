package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main (driver contract): runs every declared query
  * against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Session tuning mirrors what a production deployment would set:
  * shuffle partitions = cores (local mode has no reason for 200), AQE on
  * with partition coalescing (the reference enables the same,
  * dags/spark_dag.py:37-38). A short warmup run absorbs JVM/codegen
  * first-compile cost so per-query numbers measure the engine, not
  * class-loading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup (not timed): exercises scan + join + agg codegen paths once.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    // Median of RUNS runs per query so round-over-round deltas measure
    // the engine, not JIT/GC noise. Cached plans are cleared between
    // runs so every run pays its own compute (several operators cache
    // intermediates internally).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
