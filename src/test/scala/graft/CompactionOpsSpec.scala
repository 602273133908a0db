package graft

import graft.operators.{Dedup, EventOps, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Invariants for the round-8 additions (s13 recall census, d9 canonical
  * docs, t35 stratified sample, q30 latest snapshot) beyond the DuckDB
  * oracle gate — properties the oracle mirror shares by construction and
  * therefore can't catch if both sides drift together.
  */
class CompactionOpsSpec extends SparkSpecBase {

  test("results are invariant to the shuffle-partition count") {
    // The oracle gate pins values at ONE partitioning; this pins that a
    // different shuffle width cannot reorder or renumber anything — the
    // classic leak for rank/sample/fraction outputs on a real cluster
    // whose partition count nobody controls.
    val names = Seq("t35_stratified_sample", "q30_latest_snapshot",
      "d10_dup_gram_fraction", "q31_event_funnel")
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    def runAll() = names.map(n =>
      n -> SparkEntry.queries(n)(spark, sf()).collect().map(_.toString).toSeq).toMap
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      val at7 = runAll()
      conf.set("spark.sql.shuffle.partitions", "13")
      val at13 = runAll()
      names.foreach(n => assert(at7(n) == at13(n), s"$n varies with partitioning"))
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }

  test("s13: spine is complete, hits bounded by K, multi-probe never loses to single-bucket LSH") {
    val r = Similarity.s13RecallCensus.run(spark, sf()).cache()
    // Every (method, query) pair exists exactly once, even when a probe
    // bucket was empty (hits=0 row, not a missing row).
    assert(r.count() == 2 * 10, "spine must be methods × NQ")
    assert(r.groupBy("method", "query_id").count().filter(col("count") > 1).isEmpty)
    assert(r.filter(col("hits") < 0 || col("hits") > 5).isEmpty)
    // Multi-probe candidates are a superset of the query's own bucket,
    // and top-k over a superset can only match more of the exact top-k
    // or tie — per-query recall must be monotone in the probe set.
    val wide = r.groupBy("query_id")
      .pivot("method", Seq("lsh", "multiprobe"))
      .agg(first("hits"))
    assert(wide.filter(col("multiprobe") < col("lsh")).isEmpty,
      "multi-probe recall fell below single-bucket LSH for some query")
    r.unpersist()
  }

  test("d9: one canonical per cluster, the longest member wins, sizes reconcile with d6") {
    val d6 = Dedup.d6Clusters.run(spark, sf()).cache()
    val d9 = Dedup.d9CanonicalDocs.run(spark, sf()).cache()
    // Exactly one decision row per d6 cluster.
    assert(d9.select("cluster_id").distinct().count() == d9.count())
    assert(d9.count() == d6.select("cluster_id").distinct().count())
    // The canonical doc is a member of its cluster and no member is
    // longer (ties broken to the lowest doc_id).
    val members = d6.join(
      Tables.documents(spark, sf()).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
    val best = members
      .groupBy("cluster_id")
      .agg(max(struct(col("n_chars"), (-col("doc_id")).as("neg_doc"))).as("b"),
        count(lit(1)).as("sz"))
      .select(col("cluster_id"), col("b.n_chars").as("exp_chars"),
        (-col("b.neg_doc")).as("exp_doc"), col("sz"))
    val joined = d9.join(best, Seq("cluster_id"))
    assert(joined.filter(col("canonical_doc_id") =!= col("exp_doc")
      || col("canonical_chars") =!= col("exp_chars")
      || col("cluster_size") =!= col("sz")
      || col("n_dropped") =!= col("sz") - 1).isEmpty)
    d6.unpersist(); d9.unpersist()
  }

  test("d12: one canonical per d11 cluster, the highest-norm member wins") {
    import graft.functions.VectorFns
    val d11 = Dedup.d11EmbeddingClusters.run(spark, sf()).cache()
    val d12 = Dedup.d12CanonicalVectors.run(spark, sf()).cache()
    // Exactly one decision row per d11 cluster, sizes agree.
    assert(d12.select("cluster_id").distinct().count() == d12.count())
    assert(d12.count() == d11.select("cluster_id").distinct().count())
    // Direct recomputation: the canonical vector is the cluster member
    // with the maximum quantized norm (ties to the lowest vec_id).
    val members = d11.join(
      Tables.embeddings(spark, sf()).select(col("vec_id"),
        VectorFns.norm2(VectorFns.quantize(col("embedding"))).as("nrm")),
      Seq("vec_id"))
    val best = members
      .groupBy("cluster_id")
      .agg(max(struct(col("nrm"), (-col("vec_id")).as("neg_vec"))).as("b"),
        count(lit(1)).as("sz"))
      .select(col("cluster_id"), col("b.nrm").as("exp_nrm"),
        (-col("b.neg_vec")).as("exp_vec"), col("sz"))
    val joined = d12.join(best, Seq("cluster_id"))
    assert(joined.filter(col("canonical_vec_id") =!= col("exp_vec")
      || col("canonical_nrm") =!= col("exp_nrm")
      || col("cluster_size") =!= col("sz")
      || col("n_dropped") =!= col("sz") - 1).isEmpty)
    d11.unpersist(); d12.unpersist()
  }

  test("d11: embedding clusters cover exactly the paired vectors and join every pair") {
    val pairs = Dedup.d8EmbeddingMultiProbe.run(spark, sf()).select("vec_a", "vec_b").cache()
    val d11 = Dedup.d11EmbeddingClusters.run(spark, sf()).cache()
    val members = pairs.select(col("vec_a").as("v"))
      .unionByName(pairs.select(col("vec_b").as("v"))).distinct()
    assert(d11.count() == members.count())
    assert(d11.select("vec_id").distinct().count() == d11.count())
    assert(d11.filter(col("cluster_size") < 2).isEmpty)
    // Both endpoints of every near-dup pair land in the same cluster.
    val ca = d11.select(col("vec_id").as("vec_a"), col("cluster_id").as("cl_a"))
    val cb = d11.select(col("vec_id").as("vec_b"), col("cluster_id").as("cl_b"))
    assert(pairs.join(ca, Seq("vec_a")).join(cb, Seq("vec_b"))
      .filter(col("cl_a") =!= col("cl_b")).isEmpty)
    pairs.unpersist(); d11.unpersist()
  }

  test("t35: per-stratum quota is exactly ceil(n/5) and the draw is reproducible") {
    val docs = Tables.documents(spark, sf())
    val expected = docs.groupBy("lang")
      .agg(expr("(count(1) + 4) div 5").as("quota"))
    val got = TextOps.t35StratifiedSample.run(spark, sf())
      .groupBy("lang").agg(count(lit(1)).as("kept"))
    assert(got.join(expected, Seq("lang"), "full")
      .filter(col("kept").isNull || col("quota").isNull || col("kept") =!= col("quota"))
      .isEmpty, "kept count != ceil(n_lang/5) for some stratum")
    // Pure function of the data: two runs agree row-for-row.
    val a = TextOps.t35StratifiedSample.run(spark, sf()).collect().toSeq
    val b = TextOps.t35StratifiedSample.run(spark, sf()).collect().toSeq
    assert(a == b)
  }

  test("d10: fractions are consistent, and exact-duplicate docs score 1.0") {
    val d10 = Dedup.d10DupGramFraction.run(spark, sf()).cache()
    assert(d10.filter(col("n_dup") > col("n_grams") || col("n_grams") <= 0).isEmpty)
    assert(d10.filter(
      col("dup_fraction") =!= col("n_dup").cast("double") / col("n_grams").cast("double"))
      .isEmpty)
    d10.unpersist()
    // Testdata has no byte-identical texts, so pin the boundary cases on
    // a forged corpus: clones share EVERY gram occurrence cross-doc
    // (fraction exactly 1.0) and a gram-disjoint doc scores exactly 0.0.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-d10").toString
    val clone = (1 to 10).map(i => s"alpha$i").mkString(" ")
    val unique = (1 to 10).map(i => s"omega$i").mkString(" ")
    Seq((0L, clone), (1L, clone), (2L, unique))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val forged = Dedup.d10DupGramFraction.run(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(forged == Map(0L -> 1.0, 1L -> 1.0, 2L -> 0.0), forged.toString)
  }

  test("d14: maximal spans land at exact positions; short runs and intra-doc repeats drop") {
    // Forged corpus with token-exact expectations (1-based positions):
    //   doc 0  a1..a30 f1..f5            — 30-token run shared with 1 and (twice) 4
    //   doc 1  g1..g8 a1..a30            — same run at offset 9
    //   doc 2  c1..c8 ×3                 — internal repetition ONLY: no partner, no rows
    //   doc 3  a1..a10 h1..h10           — 10-token shared run: under the 16-token floor
    //   doc 4  a1..a20 x1..x10 a1..a20   — the 20-token run TWICE: two spans per pair,
    //                                      tie on start_a broken by start_b in the sort
    import spark.implicits._
    def toks(ps: (String, Int)*): String =
      ps.flatMap { case (p, n) => (1 to n).map(i => s"$p$i") }.mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-d14").toString
    Seq(
      (0L, toks("a" -> 30, "f" -> 5)),
      (1L, toks("g" -> 8) + " " + toks("a" -> 30)),
      (2L, (toks("c" -> 8) + " ") * 2 + toks("c" -> 8)),
      (3L, toks("a" -> 10, "h" -> 10)),
      (4L, toks("a" -> 20, "x" -> 10) + " " + toks("a" -> 20)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d14RepeatedSpans.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 1L, 1L, 9L, 30L),
      (0L, 4L, 1L, 1L, 20L), (0L, 4L, 1L, 31L, 20L),
      (1L, 4L, 9L, 1L, 20L), (1L, 4L, 9L, 31L, 20L)), got.mkString(","))
  }

  test("d15: trim census unions overlapping cuts and charges the higher doc_id") {
    // Same forged corpus as the d14 test. Expected cuts (lower doc_id
    // keeps its copy; intervals are [start_b, start_b+len-1]):
    //   doc 0: never doc_b                        → cut 0 of 35
    //   doc 1: [9,38] from (0,1)                  → cut 30 of 38
    //   doc 2: internal repetition only           → cut 0 of 24
    //   doc 3: only sub-threshold runs            → cut 0 of 20
    //   doc 4: [1,20],[31,50] from BOTH 0 and 1   → 4 spans but the
    //          union is 40 of 50 (overlaps must not double-count)
    import spark.implicits._
    def toks(ps: (String, Int)*): String =
      ps.flatMap { case (p, n) => (1 to n).map(i => s"$p$i") }.mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-d15").toString
    Seq(
      (0L, toks("a" -> 30, "f" -> 5)),
      (1L, toks("g" -> 8) + " " + toks("a" -> 30)),
      (2L, (toks("c" -> 8) + " ") * 2 + toks("c" -> 8)),
      (3L, toks("a" -> 10, "h" -> 10)),
      (4L, toks("a" -> 20, "x" -> 10) + " " + toks("a" -> 20)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d15SpanTrimCensus.run(spark, tmp)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 35L, 0L, 0L, 35L),
      (1L, 38L, 1L, 30L, 8L),
      (2L, 24L, 0L, 0L, 24L),
      (3L, 20L, 0L, 0L, 20L),
      (4L, 50L, 4L, 40L, 10L)), got.mkString(","))
  }

  test("d14: ubiquitous-gram cohorts are capped out; genuine spans survive alongside them") {
    // 130 byte-identical boilerplate docs (every gram at df=130 > the
    // 128 cap) would otherwise fan out into 130*129/2 = 8385 pairs of
    // 20-token spans; the cap must drop ALL of them while the one
    // genuine pair (docs 0 and 1 sharing a unique 20-token run at
    // df=2) still reports its span.
    import spark.implicits._
    def toks(p: String, n: Int): String = (1 to n).map(i => s"$p$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft-d14cap").toString
    val boiler = toks("boiler", 20)
    (Seq(
      (0L, toks("u", 20) + " " + toks("x", 5)),
      (1L, toks("y", 8) + " " + toks("u", 20))) ++
      (10L until 140L).map(i => (i, boiler)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.d14RepeatedSpans.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 1L, 1L, 9L, 20L)), got.mkString(","))
  }

  test("q31: funnel counts shrink monotonically and step 1 counts exactly the viewers") {
    val f = EventOps.q31Funnel.run(spark, sf()).collect().sortBy(_.getInt(0))
    assert(f.length == 3)
    val counts = f.map(_.getLong(2))
    assert(counts.sliding(2).forall(w => w(1) <= w(0)),
      s"funnel grew between steps: ${counts.mkString(",")}")
    val viewers = Tables.events(spark, sf())
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(counts(0) == viewers)
    assert(f.forall(r => r.getDouble(3) == r.getLong(2).toDouble / counts(0)))
  }

  test("q32: offset-0 equals the cohort size and no week exceeds it") {
    val r = EventOps.q32Retention.run(spark, sf()).cache()
    assert(r.filter(col("week_offset") < 0).isEmpty)
    val zero = r.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("size0"))
    // Every cohort has its offset-0 row (everyone is active in their own
    // first week) and later weeks never exceed it.
    assert(zero.count() == r.select("cohort_week").distinct().count())
    assert(r.join(zero, Seq("cohort_week"))
      .filter(col("n_users") > col("size0")).isEmpty)
    // Cohort sizes partition the user base.
    val users = Tables.events(spark, sf()).select("user_id").distinct().count()
    assert(zero.agg(sum("size0")).head().getLong(0) == users)
    r.unpersist()
  }

  test("q30: one row per user, newest change wins, lifetime counts reconcile") {
    val events = Tables.events(spark, sf()).cache()
    val snap = EventOps.q30LatestSnapshot.run(spark, sf()).cache()
    assert(snap.count() == events.select("user_id").distinct().count())
    // n_events partitions the log exactly.
    assert(snap.agg(sum("n_events")).head().getLong(0) == events.count())
    // The snapshot row really is the (ts, event_id)-max change per key.
    val latest = events
      .select(col("user_id"),
        struct(expr("unix_micros(ts)").as("ts_us"), col("event_id"),
          col("event_type"), col("value")).as("s"))
      .groupBy("user_id").agg(max("s").as("s"))
      .select(col("user_id"), col("s.ts_us").as("exp_ts"),
        col("s.event_type").as("exp_type"), col("s.value").as("exp_value"))
    assert(snap.join(latest, Seq("user_id"))
      .filter(col("last_ts_us") =!= col("exp_ts")
        || col("last_type") =!= col("exp_type")
        || col("last_value") =!= col("exp_value")).isEmpty)
    events.unpersist(); snap.unpersist()
  }
}
