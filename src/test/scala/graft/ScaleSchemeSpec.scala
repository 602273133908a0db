package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Machine-checks the scale probe's replication premise: a K×-replicated
  * corpus must grow every pair/join/block space EXACTLY K× — replicas
  * never cross-match. A shared space fabricates super-linear growth and
  * ScaleCheck then measures the forged data instead of the engine; the
  * round-10 regression here was character 5-grams under the old
  * per-token-prefix transform: token-body grams stayed identical across
  * replicas (ratio ~700 at 64×) while the shared prefix on every token
  * manufactured within-replica pairs — replaced by a per-replica
  * alphabet bijection plus a replica-local `source` (d4's block key).
  *
  * Each case asserts an EXACT count property, which only holds if
  * replicas are pairwise non-interacting:
  *   - d2 pairs never cross replicas, and replica 0 (identity) equals
  *     the base pair set (exact-K× would be fragile for an LSH op:
  *     banding recall may differ per replica on borderline pairs)
  *   - d4 pair count (char-5-gram × (lang, source, lenb) blocks — the
  *     bijection preserves per-replica gram structure EXACTLY and the
  *     source suffix keeps blocks replica-local; this case fails under
  *     the old per-token-prefix transform both ways — cross-replica
  *     token-body grams collide AND the shared prefix inflates
  *     within-replica pair density ~100×)
  *   - d8 pair count (label × LSH-bucket blocks — label suffix)
  *   - lineitem⋈orders inner-join count (order-key offset on BOTH sides)
  */
class ScaleSchemeSpec extends SparkSpecBase {

  private val K = 2

  private lazy val scaled: String = {
    val out = Files.createTempDirectory("graft-scalescheme").toString
    ScaleCheck.scaleDocuments(spark, sf(), out, K)
    ScaleCheck.scaleEmbeddings(spark, sf(), out, K)
    ScaleCheck.scaleRelational(spark, sf(), out, K)
    out
  }

  private def q(name: String, dir: String): Long =
    SparkEntry.queries(name)(spark, dir).count()

  // THE offset rule, not a mirror of it: the tests fold replica ids
  // back with ScaleCheck's own offsetFor, so a change to the floor
  // constant or max-key logic cannot leave the spec grading against a
  // stale formula.
  private lazy val docOffset: Long =
    ScaleCheck.offsetFor(Tables.documents(spark, sf()), Seq("doc_id"))

  // d2 is LSH-based: the bijection preserves TRUE Jaccard but
  // re-randomizes minhash values per replica, so banding recall on
  // borderline pairs may differ between replicas — an exact-K× count
  // would be fragile against the data. The deterministic assertions:
  // no pair may cross replicas, and replica 0 (the identity transform)
  // must reproduce the base pair set EXACTLY.
  test("d2: no cross-replica pairs; identity replica reproduces base pairs exactly") {
    val offset = docOffset
    def pairSet(dir: String): Set[(Long, Long)] =
      SparkEntry.queries("d2_dedup_minhash_lsh")(spark, dir)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scaledPairs = pairSet(scaled)
    assert(scaledPairs.nonEmpty)
    assert(scaledPairs.forall { case (a, b) => a / offset == b / offset },
      "a cross-replica near-dup pair means the replication scheme leaks a shared shingle space")
    val rep0 = scaledPairs.filter { case (a, _) => a / offset == 0 }
    assert(rep0 == pairSet(sf()),
      "replica 0 is the identity transform and must reproduce the base pair set")
  }

  test("d4 char-gram pairs grow exactly Kx (bijection preserves gram structure; source suffix keeps blocks replica-local)") {
    assert(q("d4_dedup_ngram_jaccard", scaled) == K * q("d4_dedup_ngram_jaccard", sf()))
  }

  test("d13 containment pairs grow exactly Kx (word-shingle spaces replica-distinct; source suffix keeps blocks replica-local)") {
    assert(q("d13_containment_pairs", scaled) == K * q("d13_containment_pairs", sf()))
  }

  test("d14 repeated spans grow exactly Kx (bijection preserves span geometry)") {
    assert(q("d14_repeated_spans", scaled) == K * q("d14_repeated_spans", sf()))
  }

  // The bijection preserves gram structure, so spans must not just
  // COUNT K× — every base span must reappear in every replica with the
  // SAME start positions and length, and no span may cross replicas.
  test("d14 span geometry replicates exactly: K copies of each base span, none cross-replica") {
    val offset = docOffset
    def spans(dir: String): Seq[(Long, Long, Long, Long, Long)] =
      SparkEntry.queries("d14_repeated_spans")(spark, dir)
        .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
          col("start_a").cast("long"), col("start_b").cast("long"),
          col("span_tokens").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val base = spans(sf())
    assert(base.nonEmpty, "the premise check needs base spans to replicate")
    val big = spans(scaled)
    assert(big.forall { case (a, b, _, _, _) => a / offset == b / offset },
      "a cross-replica span means the replication scheme leaks a shared gram space")
    val folded = big.groupBy { case (a, b, sa, sb, n) => (a % offset, b % offset, sa, sb, n) }
      .view.mapValues(_.size).toMap
    val baseMap = base.groupBy(identity).view.mapValues(_.size).toMap
    assert(folded == baseMap.map { case (k, v) => (k, v * K) },
      "every base span must appear exactly K times with identical geometry")
  }

  // d15's census is per-document, so its replication premise is
  // row-level: each replica doc must carry ITS base doc's exact ledger
  // (token count, span count, cut tokens) — the interval-union sweep is
  // deterministic given identical span geometry.
  test("d15 trim census replicates exactly per document") {
    val offset = docOffset
    def census(dir: String): Map[Long, (Long, Long, Long)] =
      SparkEntry.queries("d15_span_trim_census")(spark, dir)
        .select(col("doc_id").cast("long"), col("n_tokens").cast("long"),
          col("n_spans").cast("long"), col("cut_tokens").cast("long"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val base = census(sf())
    assert(base.values.exists(_._3 > 0), "the premise check needs base cuts to replicate")
    val big = census(scaled)
    assert(big.size == K * base.size)
    big.foreach { case (id, ledger) =>
      assert(ledger == base(id % offset),
        s"replica doc $id must mirror base doc ${id % offset}'s ledger exactly")
    }
  }

  // d8 is LSH-blocked: the per-replica dimension permutation preserves
  // every within-replica dot product (so TRUE cosine structure mirrors
  // base exactly — asserted below on the surfaced pairs), but the
  // sign-random-projection bucket scores a PERMUTED vector against
  // fixed per-dimension signs, so bucket-block recall on borderline
  // pairs may differ per replica — the d2-minhash situation, pinned the
  // same way. The permutation is what keeps replicas from being
  // geometric clones: identical coordinates land in identical k-means
  // cells no matter how many cells a scaled build trains, and every
  // cell-pruned ANN probe would measure fabricated K× cell growth.
  test("d8: no cross-replica pairs; identity replica reproduces base; cosines replica-invariant") {
    val offset = ScaleCheck.offsetFor(Tables.embeddings(spark, sf()), Seq("vec_id"))
    def pairs(dir: String): Map[(Long, Long), Double] =
      SparkEntry.queries("d8_dedup_embedding_multiprobe")(spark, dir)
        .select(col("vec_a").cast("long"), col("vec_b").cast("long"),
          col("cosine").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scaledPairs = pairs(scaled)
    assert(scaledPairs.nonEmpty)
    assert(scaledPairs.keys.forall { case (a, b) => a / offset == b / offset },
      "a cross-replica embedding pair means replicas share an LSH block")
    val basePairs = pairs(sf())
    assert(scaledPairs.filter { case ((a, _), _) => a / offset == 0 } == basePairs,
      "replica 0 is the identity transform and must reproduce base pairs exactly")
    // Every surfaced pair's cosine must equal its base pair's cosine
    // bit-for-bit: the permutation may change WHICH borderline pairs
    // the buckets surface, never the similarity of those it does.
    scaledPairs.foreach { case ((a, b), cos) =>
      basePairs.get((a % offset, b % offset)).foreach { baseCos =>
        assert(cos == baseCos,
          s"pair ($a,$b): cosine $cos != base $baseCos — permutation broke geometry")
      }
    }
  }

  test("lineitem joins orders exactly Kx (order keys offset on BOTH sides)") {
    def joined(dir: String): Long =
      Tables.lineitem(spark, dir).select("l_orderkey")
        .join(Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"))
        .count()
    assert(joined(scaled) == K * joined(sf()))
  }

  // The affine-map family is only pairwise everywhere-distinct WITHIN a
  // stride group (36 shifts); replicas 36+ switch stride and cross-group
  // map pairs agree on gcd(Δstride, 36) symbols — the deep tier (64×)
  // spans that boundary, so the premise needs checking ACROSS it, not
  // just at K=2. K=38 is the cheapest spanning factor (replicas 36, 37
  // sit in the second stride group).
  private val KDeep = 38

  private lazy val scaledDeep: String = {
    val out = Files.createTempDirectory("graft-scalescheme-deep").toString
    ScaleCheck.scaleDocuments(spark, sf(), out, KDeep)
    out
  }

  test("d4 char-gram pairs grow exactly Kx across the stride-group boundary") {
    assert(q("d4_dedup_ngram_jaccard", scaledDeep) == KDeep * q("d4_dedup_ngram_jaccard", sf()))
  }

  test("d13 containment pairs grow exactly Kx across the stride-group boundary") {
    assert(q("d13_containment_pairs", scaledDeep) == KDeep * q("d13_containment_pairs", sf()))
  }

  test("d14 repeated spans grow exactly Kx across the stride-group boundary") {
    assert(q("d14_repeated_spans", scaledDeep) == KDeep * q("d14_repeated_spans", sf()))
  }

  test("d2: no cross-replica pairs across the stride-group boundary") {
    val offset = docOffset
    val crossers = SparkEntry.queries("d2_dedup_minhash_lsh")(spark, scaledDeep)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().filter(r => r.getLong(0) / offset != r.getLong(1) / offset)
    assert(crossers.isEmpty,
      s"cross-replica near-dup pairs leak a shared shingle space across stride groups: ${crossers.take(5).mkString(",")}")
  }
}
