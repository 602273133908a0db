package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.operators.Dedup

/** Behavioral pins for d18 (SemDeDup, Abbas et al. arXiv:2303.09540).
  *
  * The dominance rule under test: within a cell, a member is removed iff
  * some cell-mate at cosine ≥ SemTau PRECEDES it in the diversity order
  * (distance-to-own-centroid DESCENDING, ties to the LOWER vec_id) —
  * i.e. each near-duplicate group keeps its member farthest from the
  * centroid. Geometry is forged so Lloyd's converged cells and every
  * integer centroid distance are hand-derivable; the testdata case
  * re-derives kept/n_dom from the op's own cells by brute force, so the
  * rule cannot drift without a spec failure.
  */
class SemDedupSpec extends SparkSpecBase {

  private def writeVecs(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-d18").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("d18: farthest-from-centroid member of a near-dup group is kept; ties to lower vec_id") {
    // Two well-separated axes, kc=2 → seeds 0 and 1. Lloyd (2 rounds)
    // converges to cells {0,2,3,5} (centroid (1.75e6, 0, 1.25e6, 0)) and
    // {1,4} (centroid (0, 1.5e6, 0, 0)). Within cell 0: vectors 0,2,3
    // are colinear (cosine 1 ≥ τ) with centroid distances 2.125e12 <
    // 6.625e12 for v3 → v3 (farthest) is kept, v0 is dominated only by
    // v3, v2 by both; v5 is orthogonal (cosine 0 < τ) → kept untouched.
    // Cell 1: v1 and v4 are colinear and EQUIDISTANT (0.25e12 each) →
    // the tie goes to the lower vec_id: v1 kept, v4 dominated by v1.
    val dir = writeVecs(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(2f, 0f, 0f, 0f),
      3L -> Seq(4f, 0f, 0f, 0f),
      4L -> Seq(0f, 2f, 0f, 0f),
      5L -> Seq(0f, 0f, 5f, 0f)))
    val got = Dedup.semDeDup(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 2125000000000L, false, 1L),
      (1L, 1L, 250000000000L, true, 0L),
      (2L, 0L, 1625000000000L, false, 2L),
      (3L, 0L, 6625000000000L, true, 0L),
      (4L, 1L, 250000000000L, false, 1L),
      (5L, 0L, 17125000000000L, true, 0L)), got.mkString(","))
  }

  test("d18: cross-cell near-duplicates are NOT removed — the documented SemDeDup blind spot") {
    // v2 (cell of seed 0) and v3 (cell of seed 1) are near-duplicates of
    // each other (cosine ≈ 0.917 ≥ τ) but land in DIFFERENT cells, and
    // within each cell every cosine sits below τ — so SemDeDup keeps all
    // four. This is the algorithm's known blind spot (dedup only looks
    // within a cell); the spec pins it as DOCUMENTED behavior, not a bug.
    val dir = writeVecs(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 0f, 1f, 0f),
      2L -> Seq(0.3f, 1f, 0f, 0f),
      3L -> Seq(0.3f, 1f, 0.45f, 0f)))
    val got = Dedup.semDeDup(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getLong(4)))
    assert(got.forall(g => g._3 && g._4 == 0L), got.mkString(","))
    // The blind-spot premise must actually hold: recompute the one
    // cross-cell cosine from the quantized vectors.
    val cells = got.map(g => g._1 -> g._2).toMap
    assert(cells(0L) == cells(2L) && cells(1L) == cells(3L) && cells(0L) != cells(1L),
      s"forged geometry landed in unexpected cells: $cells")
    val qv = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    assert(cos(qv(2L), qv(3L)) >= Dedup.SemTau,
      "premise broken: the cross-cell pair is not a near-dup at all")
    assert(cos(qv(0L), qv(2L)) < Dedup.SemTau && cos(qv(1L), qv(3L)) < Dedup.SemTau,
      "premise broken: a within-cell pair crosses the threshold")
  }

  test("d18: kept/n_dom on testdata reconcile with a brute-force replay of the dominance rule") {
    val out = SparkEntry.queries("d18_semdedup")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(out.nonEmpty && out.exists(!_._4), "testdata should remove at least one vector")
    val qv = Tables.embeddings(spark, sf())
      .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    // Replay dominance from the op's OWN cells and centroid distances —
    // independent of its join: a is dominated by b iff same cell, cosine
    // ≥ τ, and b precedes a in (cdist desc, vec_id asc).
    for ((id, cell, cdist, kept, nDom) <- out) {
      val doms = out.filter { case (oid, ocell, ocdist, _, _) =>
        oid != id && ocell == cell &&
          (ocdist > cdist || (ocdist == cdist && oid < id)) &&
          cos(qv(oid), qv(id)) >= Dedup.SemTau
      }
      assert(doms.length == nDom && kept == doms.isEmpty,
        s"vec $id: expected n_dom=${doms.length}, got $nDom (kept=$kept)")
    }
  }

  test("two-level assignment is exact at every codebook entry and loud on impossible anchors") {
    import spark.implicits._
    // Entries at distinct coordinates: a vector sitting exactly ON entry
    // i must be assigned to i — its own anchor wins the coarse argmin
    // (buckets are built by the same nearest-anchor tie rule), and
    // distance 0 wins the fine argmin. This pins the two halves agree
    // on geometry; the approximation (a vector BETWEEN buckets may
    // mis-assign) is documented IVF behavior, not tested as exact.
    val entries = (0L until 100L).map(i =>
      i -> Array(i * 1000L, (i % 10) * 777L, 31337L - i))
    val df = operators.Similarity.withTwoLevelCid(
      entries.map { case (i, c) => (i, c.toSeq) }.toDF("vec_id", "qv"),
      col("qv"), "assigned", entries)
    assert(df.filter(col("assigned") =!= col("vec_id")).isEmpty,
      "a vector at an entry's own coordinates was assigned elsewhere")
  }

  test("two-level assignment agrees with the exact flat argmin on most of a spread corpus") {
    import spark.implicits._
    // The approximation's quality, pinned as a NUMBER: on deterministic
    // spread data with a 100-entry codebook, count how many of 1,000
    // vectors the two-level path assigns to their true (flat-argmin)
    // nearest entry. Everything is deterministic, so the agreement
    // count is exact and stable — a stride/bucketing change that
    // degrades it shows up as a moved number, not a flaky bound.
    val entries = (0L until 100L).map { i =>
      i -> Array.tabulate(4)(d => ((i * 2654435761L + d * 40503L) % 2000000L) + 1L)
    }
    val vecs = (0 until 1000).map { i =>
      i.toLong -> Seq.tabulate(4)(d =>
        ((i.toLong * 1103515245L + d * 12345L) % 2000000L) + 1L)
    }.toDF("vec_id", "qv")
    val got = operators.Similarity.withTwoLevelCid(vecs, col("qv"), "tl", entries)
      .select("vec_id", "qv", "tl").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    assert(got.length == 1000)
    // Flat-argmin ground truth recomputed in the spec (same full-d2
    // ordering, ties to the lowest id).
    def flat(v: Array[Long]): Long = entries.map { case (id, c) =>
      val d2 = c.map(x => x * x).sum + v.map(x => x * x).sum -
        2 * c.zip(v).map { case (x, y) => x * y }.sum
      (d2, id)
    }.min._2
    val agree = got.count { case (_, v, tl) => tl == flat(v) }
    // Most vectors land in their true bucket; the misses are the
    // documented IVF boundary trade. Deterministic data → this count is
    // exact and stable; a stride/bucketing change that degrades it
    // moves the number, not a flaky bound.
    assert(agree >= 800, s"two-level agreement collapsed: $agree/1000")
    // Every assignment is a REAL entry id (no raise_error arm, no null).
    val ids = entries.map(_._1).toSet
    assert(got.forall(g => ids(g._3)))
  }

  test("d18: the derived path above TwoLevelMin (two-level Lloyd) stays replay-consistent") {
    // Forge a corpus big enough that semCellCount exceeds TwoLevelMin
    // (> 64·64 vectors), forcing BOTH the training rounds and the final
    // assignment onto the two-level path — then replay the dominance
    // rule from the op's own cells exactly as the testdata spec does.
    // The replay is assignment-agnostic (it takes the cells as given),
    // so it verifies the semantics the approximation must preserve:
    // within every cell, removal is dominance by (cdist desc, id) at
    // cosine ≥ τ, no matter how the cell was chosen.
    import spark.implicits._
    val n = 4600
    val rows = (0 until n).map { i =>
      // 8-dim deterministic spread; duplicate PAIRS (i, i+1) for even
      // i ≥ 100 — guaranteed within-cell near-dups (cosine 1) wherever
      // both land, so the removal machinery is live. The first 100
      // vectors stay DISTINCT: Lloyd seeds are the table head, and
      // duplicate seeds would collapse the trained cell count.
      val base = if (i >= 100) i - (i % 2) else i
      i.toLong -> Seq.tabulate(8)(d =>
        ((((base * 2654435761L + d * 40503L) % 1000L) + 1000L) / 1000.0f))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-d18big").toString
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(graft.operators.Dedup.semCellCount(n.toLong) > operators.Similarity.TwoLevelMin)
    val out = graft.operators.Dedup.semDeDup(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(out.length == n)
    // Path selection rides cells0 (asserted above); occupancy is a
    // plausibility floor (Lloyd may merge/empty some of the 72 cells).
    assert(out.map(_._2).distinct.length > operators.Similarity.TwoLevelMin / 2,
      "derived run collapsed to implausibly few occupied cells")
    assert(out.exists(!_._4), "no removals — the forged near-dup pairs vanished")
    val qv = Tables.embeddings(spark, tmp)
      .select(col("vec_id"), graft.functions.VectorFns.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val byCell = out.groupBy(_._2)
    for ((_, members) <- byCell; (id, _, cdist, kept, nDom) <- members) {
      val doms = members.count { case (oid, _, ocdist, _, _) =>
        oid != id && (ocdist > cdist || (ocdist == cdist && oid < id)) &&
          cos(qv(oid), qv(id)) >= graft.operators.Dedup.SemTau
      }
      assert(doms == nDom && kept == (doms == 0),
        s"vec $id: expected n_dom=$doms, got $nDom (kept=$kept)")
    }
  }

  test("d18: the derived cell count matches the pinned geometry at small SF and scales with n") {
    // sf0.001's 50 vectors derive max(KC, ceil(50/64)) = KC — so the
    // corpus-scaled default and the oracle-pinned constant agree at the
    // gate SFs (sf0.01: ceil(500/64) = 8 = KC too), while a 100 TB
    // corpus gets cells ∝ n (bounded ~SemCellSize-vector cells).
    assert(Dedup.semCellCount(50L) == operators.Similarity.KC)
    assert(Dedup.semCellCount(500L) == operators.Similarity.KC)
    assert(Dedup.semCellCount(640000L) == 10000)
    val derived = Dedup.semDeDup(spark, sf()).collect().toSeq
    val pinned = Dedup.semDeDup(spark, sf(), operators.Similarity.KC).collect().toSeq
    assert(derived == pinned)
  }

  test("d20: the index-served probe replays d18's verdicts on forged geometry") {
    // A forged corpus with KNOWN dominance structure (6 orthogonal axes,
    // 3 colinear members each — cosine 1 within an axis, 0 across), big
    // enough to feed the FULL index build (PQ's residual codebook seeds
    // vectors 8..15, so ≥16 rows; dims padded to the PQ layout's 64).
    // The index is built at the SAME non-default kc the inline op is
    // called with, so probeSemDedup must equal Dedup.semDeDup row for
    // row — no Lloyd run of its own, cells come off disk — and the
    // colinear groups force live dominance (kept=false rows exist).
    // This is the s18-shares-s17's-oracle argument made mechanical on a
    // corpus whose near-dup groups are forged, not found.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-d20").toString
    val rows = (0L until 18L).map { i =>
      val axis = (i % 6).toInt
      val mag = 1f + (i / 6).toFloat
      (i, s"l$axis", Seq.tabulate(64)(d => if (d == axis) mag else 0f))
    }
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft-d20-idx").toString
    graft.operators.AnnIndex.build(spark, tmp, root, kc = 4)
    def verdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
      .toSeq
    val probe = verdicts(graft.operators.AnnIndex.probeSemDedup(spark, root))
    val inline = verdicts(Dedup.semDeDup(spark, tmp, 4))
    assert(probe == inline, s"probe=$probe\ninline=$inline")
    assert(probe.exists(!_._4), "no dominated member — the forged groups went inert")
    assert(probe.exists(_._4), "everything dominated — degenerate forge")

    // d23 ≡ d22 on the same index: the multi-assignment probe reads the
    // SAME stored cells/centroids, computes rank 2 with the same
    // expression, and must replay the inline verdicts row for row.
    def mverdicts(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    val mprobe = mverdicts(graft.operators.AnnIndex.probeSemDedupMulti(spark, root))
    val minline = mverdicts(Dedup.semDeDupMulti(spark, tmp, 4))
    assert(mprobe == minline, s"probe=$mprobe\ninline=$minline")
    assert(mprobe.exists(!_._5), "no dominated member in the multi variant")
  }

  test("d22: the cross-cell boundary pair d18 misses is CAUGHT by multi-assignment") {
    // The EXACT corpus of the d18 blind-spot test above: v2 (cell of
    // seed 0) and v3 (cell of seed 1) are near-duplicates across the
    // cell boundary, and d18 keeps all four (pinned above). Under
    // top-2 assignment at kc=2 every vector joins both cells, so the
    // pair meets — exactly one of v2/v3 is dominated (by the other;
    // nothing else crosses τ, so n_dom is exactly 1 and the other two
    // vectors stay untouched).
    val dir = writeVecs(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 0f, 1f, 0f),
      2L -> Seq(0.3f, 1f, 0f, 0f),
      3L -> Seq(0.3f, 1f, 0.45f, 0f)))
    val got = Dedup.semDeDupMulti(spark, dir, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4),
        r.getLong(5))).toSeq
    val byId = got.map(g => g._1 -> g).toMap
    // Primary cells match d18's assignment; cell2 is the OTHER cell.
    assert(got.forall(g => g._2 != g._3), s"cell2 degenerate: $got")
    assert(byId(0L)._4 && byId(1L)._4, s"an unrelated vector was dropped: $got")
    val pair = Seq(byId(2L), byId(3L))
    assert(pair.count(!_._4) == 1,
      s"expected exactly one of the boundary pair dropped: $got")
    assert(pair.filter(!_._4).forall(_._5 == 1L),
      s"the dropped member should have exactly one dominator: $got")
  }

  test("d22 on testdata: drops are a superset of d18's; primary geometry unchanged") {
    // Adding second-assignment members to a cell only ADDS dominance
    // opportunities — the original cell-mates keep their cdist — so
    // every d18 drop must survive into d22, and d22's primary
    // cell/centroid distance per vector must equal d18's.
    val d18 = SparkEntry.queries("d18_semdedup")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val d22 = SparkEntry.queries("d22_semdedup_multicell")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(4)))
    assert(d18.map(_._1).toSeq == d22.map(_._1).toSeq)
    d18.zip(d22).foreach { case ((id, cell, cd, _), (id2, cell2, cd2, _)) =>
      assert(id == id2 && cell == cell2 && cd == cd2,
        s"primary geometry drifted for vec $id")
    }
    val drop18 = d18.filter(!_._4).map(_._1).toSet
    val drop22 = d22.filter(!_._4).map(_._1).toSet
    assert(drop18.subsetOf(drop22),
      s"d18 drops lost in d22: ${drop18 -- drop22}")
  }
}
