package graft

import graft.operators.{Curation, NearDupIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Runnable end-to-end training-data pipeline over the `documents`
  * corpus — the LLM-data counterpart of [[graft.olapsus.Demo]]:
  *
  *   1. incremental near-dup indexing (two batches through
  *      [[NearDupIndex]], as a nightly ingest would);
  *   2. curation census against the stored pair table (quality gate →
  *      exact dedup → near-dup drop → train/valid/test split);
  *   3. the stage-attrition funnel (c2) and the split-leakage audit
  *      (c3) with its group-aware remedy (c4);
  *   4. canonical-doc selection for the near-dup clusters (d9);
  *   5. PII census + scrub accounting (t36);
  *   6. sequence packing into fixed-token-budget bins (t30);
  *   7. source-mixture census with realized sampling rates (t31);
  *   8. ANN recall census of the similarity index family (s13) and
  *      embedding-side canonical selection (d12);
  *   9. sharded JSONL export of the curated survivors (TrainingSink) —
  *      the handoff artifact a training job consumes.
  *
  *   sbt "runMain graft.PipelineDemo [sfDir] [workDir]"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val spark =
      GraftSession.builder("graft-pipeline-demo", GraftSession.envCpus("4")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    println(s"== corpus: ${docs.count()} documents from $sfDir ==")

    val indexRoot = s"$work/neardup_index"
    val b1 = NearDupIndex.addDocuments(spark, docs.filter(col("doc_id") % 2 === 0), indexRoot)
    val b2 = NearDupIndex.addDocuments(spark, docs.filter(col("doc_id") % 2 === 1), indexRoot)
    val embPairs = Curation.persistEmbeddingPairs(spark, sfDir, s"$work/emb_pairs")
    println(s"\n== 1. near-dup index: batch1 +$b1 pairs, batch2 +$b2 pairs " +
      s"(replay adds ${NearDupIndex.addDocuments(spark, docs, indexRoot)}); " +
      s"$embPairs embedding pairs persisted ==")

    // Every pair-consuming stage below is served from the two persisted
    // pair tables the index stage just built — at corpus scale the pairs
    // are the expensive nightly artifact, and no later stage re-derives
    // them (CurationSpec pins each output equal to the inline operator).
    val curation = Curation.fromPersisted(spark, sfDir,
      s"$indexRoot/pairs", Some(s"$work/emb_pairs"))

    println("\n== 2. curation census (quality -> exact dedup -> near-dup drop -> split) ==")
    curation.census.show(20, truncate = false)

    println("== 3. funnel attrition per stage (c2), split leakage (c3) and its remedy (c4) ==")
    curation.funnel.show(8, truncate = false)
    curation.leakage.show(5, truncate = false)
    curation.groupSplit.show(5, truncate = false)

    println("== 4. canonical docs per near-dup cluster (d9; first 10) ==")
    curation.canonicalDocs.show(10, truncate = false)

    println("== 5. PII census per language (t36) ==")
    SparkEntry.queries("t36_pii_scrub")(spark, sfDir).show(10, truncate = false)

    println("== 6. sequence packing (1024-token bins per lang x shard; first 10) ==")
    SparkEntry.queries("t30_sequence_packing")(spark, sfDir).show(10, truncate = false)

    println("== 7. source mixture (per-source hash-acceptance rates; first 10) ==")
    SparkEntry.queries("t31_source_mixture")(spark, sfDir).show(10, truncate = false)

    println("== 8. ANN recall census (s13) + embedding canonical selection (d12; first 10) ==")
    SparkEntry.queries("s13_ann_recall")(spark, sfDir).show(20, truncate = false)
    curation.canonicalVectors.show(10, truncate = false)

    // The pipeline's terminal artifact: the SAME survivor set the step-2
    // census counted (one shared definition in Curation — quality gate ->
    // exact dedup -> near-dup drop), PII-scrubbed and exported as
    // deterministic JSONL shards a training job consumes. n_tokens is
    // recomputed AFTER the scrub: redactions like <EMAIL> change
    // tokenization, and the exported metadata must describe the text
    // actually shipped, not its pre-scrub ancestor.
    val survivors = curation.survivors
      .withColumn("text", graft.operators.TextOps.scrubPii(col("text")))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(graft.functions.TextFns.tokens(col("text"))))
    val exported = graft.sources.TrainingSink.writeJsonlShards(
      survivors, s"$work/export", "doc_id", 8)
    println(s"== 9. exported $exported curated, scrubbed docs as 8 JSONL shards under $work/export ==")

    spark.stop()
  }
}
