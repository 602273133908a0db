package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the round-11 dedup additions:
  *
  *  - d16 (LSH-recall audit): the flagged subset must equal d2's banded
  *    pairs restricted to the sample — banding restricted to a sample IS
  *    full-corpus banding restricted to sample pairs, so any divergence
  *    means the audit is not measuring the banding it claims to.
  *  - d17 (dedup action plan): the priority lattice (drop_exact >
  *    drop_near > trim > keep) and the token ledger, pinned on a forged
  *    corpus where every action fires — testdata has no byte-identical
  *    texts, so the exact-drop arm can only be exercised on forged data
  *    (the d10-spec precedent).
  */
class DedupAuditSpec extends SparkSpecBase {

  test("d16: flagged pairs are exactly d2's pairs with both endpoints sampled; truth is thresholded") {
    val audit = SparkEntry.queries("d16_lsh_recall_audit")(spark, sf()).cache()
    assert(audit.count() > 0, "the audit needs truth pairs at this SF to mean anything")
    assert(audit.filter(col("jaccard") < graft.operators.Dedup.jaccardThreshold).isEmpty,
      "truth rows below the d2 threshold leaked into the audit")
    val sampledIds = Tables.documents(spark, sf())
      .filter(graft.operators.Dedup.auditSampled(col("doc_id")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val d2pairs = SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sf())
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => sampledIds(a) && sampledIds(b) }.toSet
    val flagged = audit.filter(col("lsh_found"))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged == d2pairs,
      s"audit flags diverge from d2 restricted to the sample: " +
        s"only-audit=${(flagged -- d2pairs).take(5)}, only-d2=${(d2pairs -- flagged).take(5)}")
    // Every pair d2 found is ipso facto a truth pair (same estimator,
    // same threshold), so recall is well-defined: flagged / total.
    assert(flagged.subsetOf(
      audit.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet))
    audit.unpersist()
  }

  test("d17: action priority and token ledger on a corpus where every action fires") {
    import spark.implicits._
    def toks(p: String, n: Int): String = (1 to n).map(i => s"$p$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-d17").toString
    val e20 = toks("e", 20)
    val b30 = toks("b", 30)
    // b30 with one DOUBLED space: byte-different (n_chars +1) but
    // token-identical — shingle-set Jaccard 1.0, so d2 must pair them
    // and the longer text (21) wins the canonical rank.
    val b30sp = b30.replaceFirst("b15 ", "b15  ")
    val rows = Seq(
      (10L, e20),                             // exact canonical → keep
      (11L, e20),                             // byte-identical    → drop_exact (beats near/trim)
      (20L, b30),                             // near loser        → drop_near (21 is longer)
      (21L, b30sp),                           // near canonical: its only incoming span's keeper
                                              // (20) is DROPPED, so the span must NOT cut → keep
                                              // (an unconditional cut would leave the b-content
                                              // in no kept document: 20 dropped + 21 trimmed to 0)
      (30L, toks("u", 40) + " " + toks("s", 20)), // span donor     → keep (never doc_b in its pair)
      (31L, toks("v", 40) + " " + toks("s", 20)), // jac 18/98 < 0.5 → trim (20-token span only)
      (40L, toks("w", 20)))                   // untouched         → keep
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("d17_dedup_action_plan")(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, "keep", 20L, 0L, 20L),
      (11L, "drop_exact", 20L, 20L, 0L),
      (20L, "drop_near", 30L, 30L, 0L),
      (21L, "keep", 30L, 0L, 30L),
      (30L, "keep", 60L, 0L, 60L),
      (31L, "trim", 60L, 20L, 40L),
      (40L, "keep", 20L, 0L, 20L)), got.mkString(","))
    // Every token of shared content survives in at least one kept doc:
    // the b-run lives on in 21, the s-run in 30, the e-run in 10.
  }

  test("d17: every document appears exactly once and the ledger is internally consistent") {
    val plan = SparkEntry.queries("d17_dedup_action_plan")(spark, sf()).cache()
    val nDocs = Tables.documents(spark, sf()).count()
    assert(plan.count() == nDocs)
    assert(plan.select("doc_id").distinct().count() == nDocs)
    assert(plan.filter(col("kept_tokens") =!= col("n_tokens") - col("cut_tokens")).isEmpty)
    assert(plan.filter(col("cut_tokens") < 0 || col("cut_tokens") > col("n_tokens")).isEmpty)
    assert(plan.filter(!col("action").isin("keep", "trim", "drop_near", "drop_exact")).isEmpty)
    // Dropped docs cut everything; kept docs cut nothing.
    assert(plan.filter(col("action").startsWith("drop") && col("kept_tokens") =!= 0L).isEmpty)
    assert(plan.filter(col("action") === "keep" && col("cut_tokens") =!= 0L).isEmpty)
    // Testdata has no byte-identical texts, so drop_exact must not fire here.
    assert(plan.filter(col("action") === "drop_exact").isEmpty)
    // Near losers must be exactly d9's non-canonical cluster members.
    val losers = plan.filter(col("action") === "drop_near").count()
    val d9 = SparkEntry.queries("d9_canonical_docs")(spark, sf())
      .agg(sum(col("n_dropped"))).head().getLong(0)
    assert(losers == d9, s"drop_near count $losers != d9 n_dropped total $d9")
    plan.unpersist()
  }
}
