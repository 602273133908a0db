package graft.operators

import graft.{SparkEntry, SparkSpecBase}
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q3/q8/q9/q10 aggregate BEFORE their fact⋈dim join (one row per
  * order/part through the key shuffle). This spec pins each production
  * query against the literal join-then-aggregate shape it replaced, on
  * forged data exercising the edges the shared sf corpus doesn't have:
  * a NULL l_orderkey line (inner join drops it in both shapes — but it
  * still counts toward q10's per-part revenue, which never joins
  * orders), a dangling line referencing no order, multi-line orders
  * (decimal partials must re-sum exactly), and an 'R'-flag subset for
  * q9's filtered branch. */
class PreAggJoinSpec extends SparkSpecBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-preagg").toString
    Seq((0, "AMERICA"), (1, "EUROPE"))
      .toDF("r_regionkey", "r_name").write.parquet(s"$d/region.parquet")
    Seq((0, "BRAZIL", 0), (1, "FRANCE", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey").write.parquet(s"$d/nation.parquet")
    Seq((100L, 0), (101L, 1))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$d/customer.parquet")
    Seq(
      (1000L, 100L, Timestamp.valueOf("2024-03-01 00:00:00"), 150.75),
      (1001L, 101L, Timestamp.valueOf("2025-07-15 00:00:00"), 77.77),
      (1002L, 100L, Timestamp.valueOf("2025-01-02 00:00:00"), 12.00))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, "Brand#1"), (2L, "Brand#2"))
      .toDF("p_partkey", "p_brand").write.parquet(s"$d/part.parquet")
    Seq[(Option[Long], Long, Double, Double, String)](
      (Some(1000L), 1L, 100.25, 0.10, "R"), // multi-line order 1000
      (Some(1000L), 2L, 50.50, 0.00, "N"),
      (Some(1001L), 1L, 77.77, 0.05, "R"),
      (Some(1002L), 2L, 12.00, 0.00, "N"),
      (Some(9999L), 1L, 999.99, 0.50, "R"), // dangling: no order 9999
      (None, 2L, 555.55, 0.25, "R"))        // NULL orderkey
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_returnflag")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q3 equals the join-then-aggregate shape on edge data") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ref = li
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$dir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$dir/region.parquet"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(27,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name", "o_year")
    val got = SparkEntry.queries("q3_star_join")(spark, dir)
    assert(rows(got) == rows(ref))
    assert(got.count() == 3) // 1000+1002 (BRAZIL 2024/2025), 1001 (FRANCE 2025)
  }

  test("q8 pivot equals the join-then-aggregate shape on edge data") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ref = li
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .join(spark.read.parquet(s"$dir/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .join(spark.read.parquet(s"$dir/region.parquet"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("r_name", Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(27,6)")).cast("double"))
      .orderBy("o_year")
    val got = SparkEntry.queries("q8_pivot")(spark, dir)
    assert(rows(got) == rows(ref))
  }

  test("q9 equals the join-then-aggregate shape on edge data") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val ordRef = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("order_value"))
    val retRef = li.filter(col("l_returnflag") === "R")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_returned"))
    val ref = ordRef.join(retRef, Seq("nk", "yr"))
      .join(spark.read.parquet(s"$dir/nation.parquet"), col("nk") === col("n_nationkey"))
      .select("n_name", "yr", "n_orders", "order_value", "n_returned")
      .orderBy("n_name", "yr")
    val got = SparkEntry.queries("q9_drill_across")(spark, dir)
    assert(rows(got) == rows(ref))
    assert(got.count() == 2) // orders 1000 (BRAZIL 2024) and 1001 (FRANCE 2025)
  }

  test("q10 equals the join-then-aggregate shape on edge data") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    import org.apache.spark.sql.expressions.Window
    val ref = li
      .join(spark.read.parquet(s"$dir/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(27,6)")).cast("double").as("revenue"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))))
      .filter(col("rnk") <= 5)
      .select("p_brand", "p_partkey", "revenue", "rnk")
      .orderBy("p_brand", "rnk")
    val got = SparkEntry.queries("q10_topk_per_group")(spark, dir)
    assert(rows(got) == rows(ref))
    // NULL-orderkey and dangling lines still join part, so they COUNT
    // toward per-part revenue here — both parts have revenue rows.
    assert(got.count() == 2)
  }
}
