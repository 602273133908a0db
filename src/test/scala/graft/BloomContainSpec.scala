package graft

import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomProbe

/** Semantics of the two round-10 additions that the DuckDB oracle alone
  * can't pin:
  *
  *  - t37's Bloom stage is PRUNING ONLY — the removal list must be
  *    byte-identical to the plain exact join, including under a
  *    deliberately undersized (high-false-positive) filter, because the
  *    confirming join eats every false positive and Bloom filters have
  *    no false negatives.
  *  - d13's containment is the asymmetric complement of d4's Jaccard: a
  *    short document embedded verbatim in a long one must surface with
  *    containment exactly 1.0, and block isolation (lang × source) must
  *    hold.
  */
class BloomContainSpec extends SparkSpecBase {

  private def forge(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bc").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("BloomProbe: no false negatives even under a severely undersized filter") {
    import spark.implicits._
    val build = (0L until 1000L).toDF("k")
    // 64 bits for 1000 keys: the filter is saturated, false positives
    // are near-certain — but every inserted key MUST still pass.
    val probe = (0L until 1000L).toDF("v")
      .filter(BloomProbe.mightContain(build, col("k"), 1000L, 64L)(col("v")))
    assert(probe.count() === 1000L)
  }

  test("BloomProbe + confirming join recovers the exact membership set") {
    import spark.implicits._
    val build = (0L until 500L).map(_ * 7L).toDF("k")
    val candidates = (0L until 20000L).toDF("v")
      .filter(BloomProbe.mightContain(build, col("k"), 500L, 128L)(col("v")))
    // The tiny filter lets false positives through; the exact join must
    // reduce the candidate set to precisely the build keys.
    val confirmed = candidates.join(build, col("v") === col("k"))
      .select(col("v")).distinct().orderBy("v").as[Long].collect()
    assert(confirmed.toSeq === (0L until 500L).map(_ * 7L))
  }

  test("t37: forged leak corpus — removal list matches the exact join bit-for-bit") {
    // Eval doc 50 (doc_id % 50 == 0) holds exactly one word-8-gram;
    // train docs 1 and 2 embed it verbatim at different offsets, train
    // doc 3 is clean. The removal list must name docs 1 and 2 only.
    val gram = "alpha beta gamma delta epsilon zeta eta theta"
    val tmp = forge(Seq(
      (50L, gram, "en", "web"),
      (1L, s"$gram iota kappa lambda mu", "en", "web"),
      (2L, s"prefix1 prefix2 $gram", "en", "web"),
      (3L, "one two three four five six seven eight nine ten", "en", "web")))
    val got = TextOps.t37BloomDecontam.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 1L)), got.toSeq.toString)
    // And the eval-side audit (t32, the plain exact join over the same
    // grams) must agree on the leak: eval doc 50 collides with 2 train
    // docs through its 1 gram.
    val audit = TextOps.t32Decontamination.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.toSeq === Seq((50L, 2L, 1L)), audit.toSeq.toString)
  }

  test("d13: verbatim embedding surfaces at containment 1.0; blocks isolate") {
    // A (6 words → 2 five-word shingles) is embedded verbatim in B
    // (20 words → 16 shingles): cont(A→B) = 2/2 = 1.0, cont(B→A) =
    // 2/16 = 0.125. C shares the block but no shingle. D is A's exact
    // text in a DIFFERENT source — block isolation must keep it out.
    val a = "pine oak elm birch cedar maple"
    val filler = "ash fir yew teak balsa bamboo hazel rowan alder laurel willow poplar spruce larch"
    val tmp = forge(Seq(
      (10L, a, "en", "web"),
      (11L, s"$a $filler", "en", "web"),
      (12L, "stone iron gold silver copper tin lead zinc mercury brass", "en", "web"),
      (13L, a, "en", "books")))
    val got = Dedup.d13ContainmentPairs.run(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === Seq((10L, 11L, 1.0, 0.125)), got.toSeq.toString)
  }

  test("d13 on testdata: every pair respects the threshold and the bounds of a ratio") {
    val rows = Dedup.d13ContainmentPairs.run(spark, sf()).collect()
    rows.foreach { r =>
      val (ca, cb) = (r.getDouble(2), r.getDouble(3))
      assert(math.max(ca, cb) >= 0.5 && ca > 0 && cb > 0 && ca <= 1.0 && cb <= 1.0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }
}
