package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-nonlinearity probe: every 100 TB claim in this repo
  * rests on plan shape; this main checks the claim cheaply by running
  * the heaviest operators on the base corpus and on a K×-replicated
  * copy, and reporting wall-clock growth vs the data ratio.
  *
  * Replication keeps the workload's DUPLICATE STRUCTURE linear — each
  * replica is made lexically/geometrically distinct (per-token replica
  * prefix for text; a disjoint label space for vectors), so within-
  * replica near-dup structure mirrors the original while replicas don't
  * cross-match. Without that, replicating a doc K times would fabricate
  * K²/2 new near-dup pairs per doc and the probe would measure the
  * forged data's quadratic pair growth, not the engine.
  *
  * Usage: runMain graft.ScaleCheck [sfDir] [factor]
  * Output: one JSON line per op {op, base_s, scaled_s, ratio, data_ratio,
  * linear} plus a summary; also written to SCALECHECK.json.
  */
object ScaleCheck {

  /** K distinct replicas of documents: ids offset into disjoint ranges,
    * every token prefixed with the replica tag (all shingle/gram spaces
    * become replica-local, so cross-replica Jaccard is ~0). */
  private def scaleDocuments(spark: SparkSession, dir: String, out: String,
      k: Int): Unit = {
    val base = Tables.documents(spark, dir)
    val idOffset = 100000000L
    val reps = (0 until k).map { r =>
      base
        .withColumn("doc_id", col("doc_id") + lit(r * idOffset))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            w => concat(lit(s"r$r"), w)), " "))
    }
    reps.reduce(_ unionByName _).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
  }

  /** K replicas of embeddings: ids offset, labels suffixed per replica
    * (d8 blocks on label equality, so replicas never pair). */
  private def scaleEmbeddings(spark: SparkSession, dir: String, out: String,
      k: Int): Unit = {
    val base = Tables.embeddings(spark, dir)
    val idOffset = 100000000L
    val reps = (0 until k).map { r =>
      base
        .withColumn("vec_id", col("vec_id") + lit(r * idOffset))
        .withColumn("label", concat(col("label"), lit(s"_r$r")))
    }
    reps.reduce(_ unionByName _).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val factor = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalecheck")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scaled = Files.createTempDirectory("graft-scalecheck").toString
    try {
    scaleDocuments(spark, sfDir, scaled, factor)
    scaleEmbeddings(spark, sfDir, scaled, factor)

    // The heaviest ops by BENCH_DETAIL: full near-dup pipelines (pairs,
    // clustering, canonical, curation), gram joins, and the vector twin.
    val heavy = Seq(
      "c4_group_split", "c1_corpus_curation", "d9_canonical_docs",
      "d10_dup_gram_fraction", "d4_dedup_ngram_jaccard",
      "d2_dedup_minhash_lsh", "d8_dedup_embedding_multiprobe")
    def time(fn: (SparkSession, String) => DataFrame, dir: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val lines = heavy.map { name =>
      val fn = SparkEntry.queries(name)
      time(fn, sfDir) // warm (codegen/JIT)
      val base = (1 to 2).map(_ => time(fn, sfDir)).min
      time(fn, scaled) // warm scaled file listing
      val big = (1 to 2).map(_ => time(fn, scaled)).min
      val ratio = big / math.max(base, 1e-9)
      val line = s"""{"op":"$name","base_s":${fmt(base)},"scaled_s":${fmt(big)},""" +
        s""""ratio":${fmt(ratio)},"data_ratio":$factor,""" +
        s""""linear":${ratio <= 1.5 * factor}}"""
      println(line)
      line
    }
    val json = lines.mkString("[", ",\n", "]")
    Files.write(Paths.get("SCALECHECK.json"), json.getBytes(StandardCharsets.UTF_8))
    } finally {
      // The scaled corpus is factor× the input — don't leak it in tmp,
      // ESPECIALLY when a heavy op crashed the probe (the case where the
      // leak matters most).
      val sp = new org.apache.hadoop.fs.Path(scaled)
      sp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(sp, true)
      spark.stop()
    }
  }
}
