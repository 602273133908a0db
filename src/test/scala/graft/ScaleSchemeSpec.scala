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
  * Each case asserts an EXACT K× count, which only holds if replicas are
  * pairwise non-interacting:
  *   - d2 pair count (word-shingle MinHash space — per-replica alphabet
  *     bijection keeps token spaces distinct)
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

  test("d2 word-shingle pairs grow exactly Kx (alphabet bijection keeps shingle spaces replica-local)") {
    assert(q("d2_dedup_minhash_lsh", scaled) == K * q("d2_dedup_minhash_lsh", sf()))
  }

  test("d4 char-gram pairs grow exactly Kx (bijection preserves gram structure; source suffix keeps blocks replica-local)") {
    assert(q("d4_dedup_ngram_jaccard", scaled) == K * q("d4_dedup_ngram_jaccard", sf()))
  }

  test("d8 embedding pairs grow exactly Kx (label suffix keeps blocks replica-local)") {
    assert(q("d8_dedup_embedding_multiprobe", scaled) == K * q("d8_dedup_embedding_multiprobe", sf()))
  }

  test("lineitem joins orders exactly Kx (order keys offset on BOTH sides)") {
    def joined(dir: String): Long =
      Tables.lineitem(spark, dir).select("l_orderkey")
        .join(Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"))
        .count()
    assert(joined(scaled) == K * joined(sf()))
  }
}
