package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for d19 (cleaned-corpus materialization) — the op
  * that EXECUTES d17's plan: drop exact/near losers, excise the merged
  * keeper-restricted span intervals from survivors, and emit the rebuilt
  * text's md5 + exact kept-token count.
  *
  * Forged-corpus geometry covers the surgery cases the sf oracle corpus
  * cannot isolate: a cut that starts at token 1 (1-based index parity —
  * an off-by-one keeps the first span token), two disjoint intervals in
  * one document, and overlapping intervals from DIFFERENT partners that
  * must merge before cutting (double-cutting would under-count kept
  * tokens). The reconciliation tests pin d19 to d17's ledger row-for-row
  * — the materialized corpus must be exactly what the census budgeted.
  */
class CleanedCorpusSpec extends SparkSpecBase {

  private def toks(p: String, a: Int, b: Int): String =
    (a to b).map(i => s"$p$i").mkString(" ")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Forged corpus (spans are 8-token grams, min 16-token spans,
  // 3-shingle Jaccard < 0.5 between every non-identical pair so no
  // near-dup drop fires; every doc_a span keeper survives, so every
  // found span cuts):
  //   8: p1..p20 R1..R20            — donor of R1..R20 (keep)
  //   9: R11..R30 s1..s20           — donor of R11..R30 (keep)
  //  10: f1..f10 A1..A20 f11..f20 B1..B16 — donor of A and B (keep)
  //  11: A1..A20 g1..g30            — span [1,20] from 10: cut STARTS AT
  //                                   TOKEN 1 (the parity case)
  //  12: h1..h10 A1..A20 h11..h20 B1..B16 — TWO disjoint intervals
  //                                   [11,30] and [41,56] (A also arrives
  //                                   duplicated via the (11,12) pair and
  //                                   must not double-cut)
  //  13: c1..c4 R1..R30 c5..c20     — [5,24] from 8 OVERLAPS [15,34]
  //                                   from 9 → merged [5,34], cut 30
  //  14: z1..z20                    — untouched (keep)
  //  15/16: y1..y20 byte-identical  — 16 = drop_exact, absent from d19
  private lazy val forged: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-d19").toString
    val rows = Seq(
      8L  -> (toks("p", 1, 20) + " " + toks("R", 1, 20)),
      9L  -> (toks("R", 11, 30) + " " + toks("s", 1, 20)),
      10L -> (toks("f", 1, 10) + " " + toks("A", 1, 20) + " " +
              toks("f", 11, 20) + " " + toks("B", 1, 16)),
      11L -> (toks("A", 1, 20) + " " + toks("g", 1, 30)),
      12L -> (toks("h", 1, 10) + " " + toks("A", 1, 20) + " " +
              toks("h", 11, 20) + " " + toks("B", 1, 16)),
      13L -> (toks("c", 1, 4) + " " + toks("R", 1, 30) + " " + toks("c", 5, 20)),
      14L -> toks("z", 1, 20),
      15L -> toks("y", 1, 20),
      16L -> toks("y", 1, 20))
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("d19: span surgery — 1-based parity, disjoint intervals, cross-partner merge") {
    val got = SparkEntry.queries("d19_cleaned_corpus")(spark, forged).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val expect = Seq(
      (8L, "keep", 40L, md5hex(toks("p", 1, 20) + " " + toks("R", 1, 20))),
      (9L, "keep", 40L, md5hex(toks("R", 11, 30) + " " + toks("s", 1, 20))),
      (10L, "keep", 56L, md5hex(toks("f", 1, 10) + " " + toks("A", 1, 20) + " " +
        toks("f", 11, 20) + " " + toks("B", 1, 16))),
      // [1,20] cut: the rebuilt text must start at g1 — A1 surviving (a
      // 0-based read of the 1-based span start) changes this md5.
      (11L, "trim", 30L, md5hex(toks("g", 1, 30))),
      // [11,30] ∪ [41,56]: both h runs survive, A and B both go; the
      // duplicate A-interval from the (11,12) pair must not double-cut.
      (12L, "trim", 20L, md5hex(toks("h", 1, 10) + " " + toks("h", 11, 20))),
      // [5,24] ∪ [15,34] → merged [5,34]: exactly the 30 R-tokens go.
      (13L, "trim", 20L, md5hex(toks("c", 1, 4) + " " + toks("c", 5, 20))),
      (14L, "keep", 20L, md5hex(toks("z", 1, 20))),
      (15L, "keep", 20L, md5hex(toks("y", 1, 20))))
    assert(got.toSeq == expect,
      s"got:\n${got.mkString("\n")}\nexpect:\n${expect.mkString("\n")}")
    // 16 (the exact loser) must be absent — materialization only emits
    // survivors.
    assert(!got.exists(_._1 == 16L))
  }

  test("d19: reconciles with d17's ledger row-for-row on the forged corpus") {
    reconcile(forged)
  }

  test("d19: reconciles with d17's ledger row-for-row on testdata") {
    reconcile(sf())
  }

  private def reconcile(dir: String): Unit = {
    val plan = SparkEntry.queries("d17_dedup_action_plan")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    val corpus = SparkEntry.queries("d19_cleaned_corpus")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // Same survivor set: every non-dropped plan row materializes, every
    // dropped one does not.
    val survivors = plan.filter(!_._2._1.startsWith("drop")).keySet
    assert(corpus.map(_._1).toSet == survivors,
      s"survivor sets diverge: d19-only=${corpus.map(_._1).toSet -- survivors}, " +
        s"d17-only=${(survivors -- corpus.map(_._1)).take(5)}")
    // Same action and EXACTLY the kept-token budget the census promised.
    for ((id, action, kept) <- corpus) {
      assert((action, kept) == plan(id),
        s"doc $id: d19 ($action, $kept) != d17 ledger ${plan(id)}")
    }
  }

  test("d19: kept text md5 of untouched docs equals md5 of the whitespace-token join") {
    // 'keep' rows must carry the md5 of the original token stream —
    // pinned against the corpus itself so the surgery path cannot leak
    // into untouched documents.
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"),
        md5(array_join(graft.functions.TextFns.tokens(col("text")), " ")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = SparkEntry.queries("d19_cleaned_corpus")(spark, sf())
      .filter(col("action") === "keep").collect()
    assert(kept.nonEmpty)
    for (r <- kept)
      assert(r.getString(3) == docs(r.getLong(0)), s"doc ${r.getLong(0)} md5 drifted")
  }
}
