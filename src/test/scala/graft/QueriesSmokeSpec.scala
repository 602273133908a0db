package graft

import org.apache.spark.sql.functions.col

/** Every declared query runs at sf0.001 and returns a stable schema.
  * (Value-level correctness is enforced by the DuckDB oracle gate —
  * tools/check.py — run per round; these specs catch regressions fast.) */
class QueriesSmokeSpec extends SparkSpecBase {

  test("all declared queries run at sf0.001") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf())
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every query has an oracle or is explicitly oracle-free") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1_agg known group values at sf0.001") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(5))).toSeq
    assert(rows.map(_._3).sum == 6000) // every lineitem lands in exactly one group
    assert(rows.map(t => (t._1, t._2)).distinct.size == rows.size)
  }

  test("q10 top-k emits at most 5 per brand, ranks contiguous") {
    val df = SparkEntry.queries("q10_topk_per_group")(spark, sf())
    val byBrand = df.collect().groupBy(_.getString(0))
    byBrand.foreach { case (brand, rows) =>
      val ranks = rows.map(_.getInt(3)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"$brand ranks: $ranks")
      assert(ranks.size <= 5)
    }
  }

  test("d2 minhash-lsh pairs are ordered and above threshold") {
    val rows = SparkEntry.queries("d2_dedup_minhash_lsh")(spark, sf()).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.5)
    }
  }

  test("connected-components: distributed propagation agrees with driver union-find") {
    import graft.operators.Dedup
    val pairs = Dedup.d2MinHashLsh.run(spark, sf()).select("doc_a", "doc_b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = toMap(Dedup.connectedComponents(pairs))
    val distributed = toMap(
      Dedup.connectedComponents(pairs, maxDriverEdges = 0)
        .select(col("doc_id").cast("long"), col("cluster_id").cast("long")))
    assert(driver == distributed)
    assert(driver.nonEmpty)
  }

  test("connected-components: large-star/small-star handles deep and cyclic graphs") {
    import graft.operators.Dedup
    import spark.implicits._
    // A 60-node path (diameter 59 — multiple LS/SS rounds), a cycle, a
    // star rooted at a LARGE id, and an isolated pair.
    val path = (0L until 59L).map(i => (i, i + 1))
    val cycle = Seq((100L, 101L), (101L, 102L), (102L, 103L), (103L, 100L))
    val star = Seq((900L, 200L), (900L, 201L), (900L, 202L))
    val pair = Seq((500L, 501L))
    val edges = (path ++ cycle ++ star ++ pair).toDF("a", "b")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = toMap(Dedup.connectedComponents(edges))
    val dist = toMap(Dedup.connectedComponents(edges, maxDriverEdges = 0))
    assert(driver == dist)
    assert(dist.filter(_._1 <= 60L).values.toSet == Set(0L), "path collapses to min 0")
    assert(dist(103L) == 100L && dist(900L) == 200L && dist(501L) == 500L)
  }

  test("s1 brute-force ANN: 5 neighbors per query, self excluded") {
    val rows = SparkEntry.queries("s1_ann_brute_topk")(spark, sf()).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(!rs.exists(_.getLong(1) == q), s"query $q returned itself")
      val cosines = rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, "not descending")
    }
  }

  test("s2 LSH ANN is a subset-ranking of s1 candidates (same bucket)") {
    val s2 = SparkEntry.queries("s2_ann_lsh_topk")(spark, sf()).collect()
    s2.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getString(2)).distinct.length == 1) // one bucket per query
    }
  }
}
