package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew probe for d14's document-frequency stage: forges a corpus where
  * ONE boilerplate span appears in `m` documents (each padded with
  * unique filler so nothing else matches), making every gram of that
  * span an `m`-occurrence hot key — the shape the [[graft.operators.Dedup.SpanMaxDf]]
  * cap exists for, scaled far past the cap so the PRE-cap df stage is
  * what gets stressed. Times the full d14 pipeline under both df
  * strategies:
  *
  *   - `window`: the historical `count().over(Window.partitionBy("gh"))`
  *     — all m occurrences of a hot gram sort/buffer in ONE task;
  *   - `agg`: the shipped partial-agg count + semi-join — hot keys
  *     collapse map-side, and the join exchange is AQE-skew-splittable.
  *
  * Both variants must return IDENTICAL span sets (the forged cohort's
  * grams have df = m >> cap, so the cap prunes them and the output
  * equals the base corpus's spans — checked here by count + xor hash).
  *
  *   runMain graft.SpanSkewProbe [sfDir] [m]
  */
object SpanSkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val m = args.lift(1).map(_.toInt).getOrElse(200000)
    val nReps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-spanskew", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = Files.createTempDirectory("graft-spanskew").toString
    try {
      // Base corpus + m forged docs sharing one 24-token span. Filler
      // tokens embed the doc id, so forged docs share ONLY the span —
      // whose grams then carry df ≈ m, far past SpanMaxDf.
      val base = Tables.documents(spark, sfDir)
      val idOffset = base.agg(max("doc_id")).head().getLong(0) + 1L
      val span = (1 to 24).map(i => s"boilerplate$i").mkString(" ")
      val forged = spark.range(0L, m.toLong)
        .select(
          (col("id") + lit(idOffset)).as("doc_id"),
          lit("en").as("lang"),
          lit("forge").as("source"),
          concat(
            format_string("u%da u%db u%dc ", col("id"), col("id"), col("id")),
            lit(span),
            format_string(" u%dd u%de u%df u%dg u%dh u%di u%dj u%dk u%dl",
              col("id"), col("id"), col("id"), col("id"), col("id"),
              col("id"), col("id"), col("id"), col("id"))).as("text"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      val cols = base.columns
      val defaults = base.schema.fields.map(f => f.name -> f.dataType).toMap
      val forgedFull = cols.foldLeft(forged) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(defaults(c)))
      }.select(cols.map(col): _*)
      base.unionByName(forgedFull)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")

      def run(strategy: String): (Double, Long, Long) = {
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val df = graft.operators.Dedup.spanTableWith(spark, out, strategy)
        val chk = df.select(xxhash64(col("doc_a"), col("doc_b"),
            col("start_a"), col("start_b"), col("span_tokens")).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).head()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, chk.getLong(0), if (chk.isNullAt(1)) 0L else chk.getLong(1))
      }
      def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
      val strategies = Seq("window", "agg", "aggshj")
      strategies.foreach(run) // warm each path once (codegen/JIT)
      val reps = strategies.map(s => s -> (1 to nReps).map(_ => run(s))).toMap
      val ok = reps.values.flatten.map(r => (r._2, r._3)).toSeq.distinct.size == 1
      val fields = strategies.map(s =>
        s""""${s}_s":[${reps(s).map(r => fmt(r._1)).mkString(",")}]""").mkString(",")
      println(s"""{"probe":"d14_df_skew","m":$m,$fields,""" +
        s""""spans":${reps("window").head._2},"outputs_identical":$ok}""")
    } finally {
      val sp = new org.apache.hadoop.fs.Path(out)
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
      spark.stop()
    }
  }
}
