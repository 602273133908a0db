package graft

/** Physical-plan regression guards for the scale properties the engine
  * depends on: predicate pushdown + column pruning at the parquet scan,
  * broadcast joins for dimensions, and partial (map-side) aggregation.
  * If a refactor silently turns a broadcast join into an all-pairs
  * nested loop or loses pushdown, these fail before any benchmark
  * would notice. */
class PlanAuditSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString

  test("q2: filter reaches the parquet scan; unused columns pruned") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(l_discount,0.05)"), p.take(800))
    assert(!p.contains("l_shipdate"), "unused column not pruned from scan")
  }

  test("q3: all dimension joins are broadcast hash joins") {
    val p = plan("q3_star_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("BroadcastNestedLoopJoin"), "star join degraded to nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("q1: aggregation has a partial (map-side) phase") {
    val p = plan("q1_agg")
    assert(p.contains("partial_"), "no partial aggregation before shuffle")
  }

  test("q4: band join is a broadcast nested loop, never a cartesian shuffle") {
    val p = plan("q4_band_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("CartesianProduct"))
  }

  test("q13/q14: existence checks plan as semi/anti joins") {
    assert(plan("q13_semi_join").contains("LeftSemi"))
    assert(plan("q14_anti_join").contains("LeftAnti"))
  }

  test("q21: global id assignment is two-phase, no data-wide single-partition window") {
    val p = plan("q21_group_signature_ids")
    assert(p.contains("rangepartitioning"), "expected range repartition for two-phase rank")
    val rnWindows = p.linesIterator.filter(_.contains("row_number()")).toSeq
    assert(rnWindows.nonEmpty && rnWindows.forall(_.contains("__pid")),
      "row_number window must be partitioned by __pid, not global:\n" + rnWindows.mkString("\n"))
  }

  test("d4: gram generation is a generator, not a nested-loop range join") {
    val p = plan("d4_dedup_ngram_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "d4 gram rows degraded to an O(docs x max_len) nested loop")
    assert(p.contains("Generate"), "expected explode(sequence) generator")
  }
}
