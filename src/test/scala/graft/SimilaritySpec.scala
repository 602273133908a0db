package graft

import graft.functions.VectorFns
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN-family invariants beyond the DuckDB oracle gate. */
class SimilaritySpec extends SparkSpecBase {

  test("s8 ADC distances vary across a query's neighbors (no degenerate codebook)") {
    // A residual codebook seeded from the coarse centroids themselves
    // encodes every vector to the all-zero residual, making adc_d2 a
    // per-query CONSTANT — oracle equality still passes (the mirror
    // shares the construction) but the index carries no ANN signal.
    // Pin the fix: at least one query must see >1 distinct distance,
    // and across the result set distances must not collapse per query.
    val s8 = Similarity.s8IvfPqTopK.run(spark, sf()).cache()
    val perQuery = s8.groupBy("query_id")
      .agg(countDistinct("adc_d2").as("nd"), count(lit(1)).as("n"))
      .collect()
    assert(perQuery.nonEmpty)
    val varying = perQuery.count(r => r.getLong(1) > 1)
    assert(varying * 2 >= perQuery.length,
      s"adc_d2 constant for ${perQuery.length - varying}/${perQuery.length} queries — degenerate codebook?")
    s8.unpersist()
  }

  test("s7 ADC distances vary across a query's neighbors") {
    val s7 = Similarity.s7PqTopK.run(spark, sf())
    val maxDistinct = s7.groupBy("query_id")
      .agg(countDistinct("adc_d2").as("nd"))
      .agg(max("nd")).collect()(0).getLong(0)
    assert(maxDistinct > 1, "every query's ADC distances are constant")
  }

  test("rank-filter top-k plans a partial WindowGroupLimit below the exchange") {
    // The scale guarantee for grouped top-k with FEW groups: every input
    // partition forwards at most k rows per group before the shuffle.
    val df = spark.range(0, 1000, 1, 16)
      .select((col("id") % 7).as("g"), col("id"),
        (col("id") * 2654435761L % 1013).as("score"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val plan = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      "InferWindowGroupLimit did not apply — grouped top-k would funnel " +
        "the full candidate set into #groups tasks:\n" + plan.take(1500))
  }

  test("s14 filtered top-k has PRE-filter semantics (never under-returns)") {
    // The classic filtered-search bug: rank globally, THEN filter — any
    // query whose global top-k contains cross-label neighbors comes back
    // with fewer than k results. s14 filters before ranking, so every
    // query with ≥k same-label candidates must return exactly k rows
    // with contiguous ranks, and every neighbor must share the query's
    // label. The spec also proves the distinction is live on testdata:
    // post-filtering s1's global top-k would under-return somewhere.
    import spark.implicits._
    val dir = sf()
    val s14 = Similarity.s14FilteredTopK.run(spark, dir).cache()
    val labels = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").as("nb_label"))

    val mismatched = s14.join(labels, s14("neighbor_id") === labels("vec_id"))
      .filter(col("label") =!= col("nb_label")).count()
    assert(mismatched == 0, s"$mismatched neighbors outside the query's label")

    // Contiguous ranks 1..n per query; n == k wherever the label has
    // enough candidates (label size - 1 >= k).
    val labelSizes = Tables.embeddings(spark, dir)
      .groupBy("label").agg(count(lit(1)).as("lsz"))
    val perQuery = s14.groupBy("query_id", "label")
      .agg(count(lit(1)).as("n"), max("rnk").as("maxr"))
      .join(labelSizes, "label")
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      val (n, maxr, lsz) = (r.getAs[Long]("n"), r.getAs[Int]("maxr"), r.getAs[Long]("lsz"))
      assert(n == maxr, s"ranks not contiguous for query ${r.getAs[Long]("query_id")}")
      val expect = math.min(5L, lsz - 1)
      assert(n == expect,
        s"query ${r.getAs[Long]("query_id")}: $n results, expected $expect (label size $lsz)")
    }

    // The filter must be doing real work: at least one query's GLOBAL
    // top-k (s1) crosses labels, i.e. post-filtering would under-return.
    val s1 = Similarity.s1BruteTopK.run(spark, dir)
    val qLabels = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"))
    val crossLabel = s1.join(labels, s1("neighbor_id") === labels("vec_id"))
      .join(qLabels, "query_id")
      .filter(col("nb_label") =!= col("q_label")).count()
    assert(crossLabel > 0,
      "every global top-k is already label-pure — the spec corpus cannot distinguish pre- from post-filtering")
    s14.unpersist()
  }

  test("s16 fuses both modalities and respects the RRF formula") {
    val s16 = Similarity.s16HybridRrf.run(spark, sf()).collect()
    assert(s16.nonEmpty)
    // Ranks contiguous 1..n per query.
    s16.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $q ranks not contiguous: $ranks")
    }
    // Every surviving row sits in at least one modality pool, and its
    // rrf is exactly the formula over its pool ranks.
    s16.foreach { r =>
      val rl = Option(r.getAs[Integer]("r_lex")).map(_.toInt)
      val rv = Option(r.getAs[Integer]("r_vec")).map(_.toInt)
      assert(rl.isDefined || rv.isDefined, s"row in neither pool: $r")
      val expect = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rv.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(r.getAs[Double]("rrf") == expect, s"rrf formula mismatch: $r")
    }
    // Fusion is live on this corpus: at least one fused top-k row is
    // carried by a single modality (the cross-recall case hybrid search
    // exists for).
    assert(s16.exists(r => r.getAs[Integer]("r_lex") == null
        || r.getAs[Integer]("r_vec") == null),
      "every fused row was in both pools — corpus cannot distinguish fusion from intersection")
  }

  test("lshBucket projects wide vectors exactly (no width cap, no truncation)") {
    // r14: lshBit's ±1 sign is computed inline per component
    // (LshSignDotLong), so the old LshMaxDim literal-row cap — and its
    // fail-fast guard against silent truncation — no longer exists.
    // Pin the replacement property: a vector WIDER than the old 4096
    // cap projects over ALL components, matching the sign formula.
    import spark.implicits._
    def signParity(b: Int, i: Int): Long =
      if (java.lang.Long.bitCount(b.toLong * 1000003L + i) % 2 == 0) 1L else -1L
    val v = Array.tabulate(5000)(i => (i % 7 - 3).toLong)
    val wide = Seq((1L, v)).toDF("vec_id", "qv")
    (0 until 8).foreach { b =>
      val got = wide.select(VectorFns.lshBit(b, col("qv"))).head().getLong(0)
      val want = v.zipWithIndex.map { case (x, i) => x * signParity(b, i + 1) }.sum
      assert(got == want, s"bit $b: inline sign dot diverged on a 5000-dim vector")
    }
  }

  test("s17 rerank: exact cosines, exact ordering, pool-bounded, and the rerank reorders") {
    val out = SparkEntry.queries("s17_ann_pq_rerank")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    assert(out.nonEmpty)
    // Stage-2 membership: every emitted neighbor came from stage 1's
    // ADC pool, and the final cut is the top-K of that pool.
    assert(out.forall(r => r._5 >= 1 && r._5 <= Similarity.RerankPool),
      "adc_rnk outside the stage-1 pool")
    assert(out.forall(_._3 <= 5), "rnk beyond K leaked through")
    // Exact-cosine recompute from the quantized vectors (the SemDedup
    // spec's technique): the reported score must be the true integer-
    // quantized cosine, and rnk must order by (cosine desc, neighbor).
    val qv = Tables.embeddings(spark, sf())
      .select(col("vec_id"), VectorFns.quantize(col("embedding")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    for ((query, neighbor, _, cosine, _) <- out)
      assert(cosine == cos(qv(query), qv(neighbor)),
        s"($query,$neighbor) reported $cosine != exact recompute")
    for ((query, rows) <- out.groupBy(_._1)) {
      val byRnk = rows.sortBy(_._3)
      val expected = rows.sortBy(r => (-r._4, r._2))
      assert(byRnk.toSeq == expected.toSeq, s"query $query rnk order != (cosine desc, id)")
    }
    // The second stage must be OBSERVABLE: somewhere the exact order
    // disagrees with the ADC order (otherwise the op demonstrates
    // nothing at this SF and the pool should shrink).
    assert(out.exists(r => r._3 != r._5),
      "rerank never reordered — ADC was already exact at this SF")
  }
}
