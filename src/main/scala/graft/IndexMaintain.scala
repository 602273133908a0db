package graft

import org.apache.spark.sql.SparkSession

/** `runMain graft.IndexMaintain --corpus DIR
  *   [--neardup-root R] [--ann-root R]
  *   [--index-docs] [--remove-ids PARQUET] [--purge] [--compact]
  *   [--rebuild] [--apply-plan]` —
  * the operational front door for the persisted-index lifecycle, the
  * index twin of [[graft.olapsus.Maintain]]:
  *
  *   - `--apply-plan`: EXECUTE the dedup action plan against the
  *     near-dup index at `--neardup-root` (and apply the drops to
  *     `--ann-root` when given): stage d17's decisions, tombstone,
  *     purge, re-index the trimmed docs under their d19-rebuilt text.
  *     Prints the apply census. Crash-safe: a killed run re-invoked
  *     with the same flags resumes from the staged plan.
  *   - `--remove-ids F`: logically delete the ids in parquet file/dir F
  *     (first column) from every given root — O(batch), visible
  *     immediately.
  *   - `--purge`: apply tombstones physically (touched partitions
  *     only); the compaction-cadence companion of remove.
  *   - `--rebuild`: retrain the ANN index on the corpus as it stands
  *     now and cut over atomically (frozen-codebook drift answer).
  *   - `--compact`: merge per-batch append files in both indexes.
  *
  * Every sub-operation is lease-guarded and replay-idempotent by the
  * underlying library calls; the CLI adds nothing but argument parsing,
  * so there is no behavior here a spec doesn't already pin. */
object IndexMaintain {
  def main(args: Array[String]): Unit = {
    // Mixed valued + boolean flags: a token after `--k` that is itself a
    // flag (or absent) makes `--k` boolean — Cli.parseArgs's pairwise
    // sliding would mis-pair everything after the first boolean.
    val a = scala.collection.mutable.Map[String, String]()
    val flags = scala.collection.mutable.Set[String]()
    var i = 0
    while (i < args.length) {
      val k = args(i)
      require(k.startsWith("--"), s"unexpected argument $k")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        a(k.stripPrefix("--")) = args(i + 1); i += 2
      } else { flags += k.stripPrefix("--"); i += 1 }
    }
    val spark: SparkSession =
      GraftSession.builder("graft-index-maintain", GraftSession.envCpus("4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nd = a.get("neardup-root")
    val ann = a.get("ann-root")
    require(nd.isDefined || ann.isDefined,
      "pass --neardup-root and/or --ann-root")

    if (flags.contains("index-docs")) {
      val root = nd.getOrElse(sys.error("--index-docs needs --neardup-root"))
      val n = operators.NearDupIndex.addDocuments(
        spark, Tables.documents(spark, a("corpus")), root)
      println(s"indexed corpus documents into $root: $n new pair(s)")
    }
    a.get("remove-ids").foreach { path =>
      val ids = spark.read.parquet(path)
      nd.foreach { r =>
        println(s"neardup remove: ${operators.NearDupIndex.remove(spark, r, ids)} tombstoned")
      }
      ann.foreach { r =>
        println(s"ann remove: ${operators.AnnIndex.remove(spark, r, ids)} tombstoned")
      }
    }
    if (flags.contains("purge")) {
      nd.foreach { r =>
        println(s"neardup purge: ${operators.NearDupIndex.purgeTombstones(spark, r)}")
      }
      ann.foreach { r =>
        println(s"ann purge: ${operators.AnnIndex.purgeTombstones(spark, r)}")
      }
    }
    if (flags.contains("apply-plan")) {
      val root = nd.getOrElse(sys.error("--apply-plan needs --neardup-root"))
      val census = operators.Maintenance.applyPlan(
        spark, a("corpus"), root, ann)
      census.toSeq.sortBy(_._1).foreach { case (k, v) => println(f"  $k%-18s $v%,d") }
    }
    if (flags.contains("rebuild")) {
      val root = ann.getOrElse(sys.error("--rebuild needs --ann-root"))
      operators.AnnIndex.rebuild(spark, a("corpus"), root)
      println(s"ann index rebuilt at $root (retrained on ${a("corpus")})")
    }
    if (flags.contains("compact")) {
      nd.foreach { r => operators.NearDupIndex.compact(spark, r); println(s"compacted $r") }
      ann.foreach { r => operators.AnnIndex.compact(spark, r); println(s"compacted $r") }
    }
    spark.stop()
  }
}
