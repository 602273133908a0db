package graft.operators

import graft.{SparkEntry, SparkSpecBase}
import java.nio.file.Files

/** q34 on a forged star schema containing exactly the defects an FK
  * audit exists to surface: a NULL foreign key, a dangling foreign key
  * per relationship, and — the subtle one — a DUPLICATED dim key. The
  * audit's broadcast key-set joins must have EXISTS semantics (a dim
  * key appearing twice must not fan out fact rows and inflate every
  * count), matching the oracle's NOT EXISTS formulation. */
class FkAuditSpec extends SparkSpecBase {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-fkaudit").toString
    // part key 1 is DUPLICATED on purpose.
    Seq(1L, 1L, 2L).toDF("p_partkey").write.parquet(s"$d/part.parquet")
    Seq(10L).toDF("s_suppkey").write.parquet(s"$d/supplier.parquet")
    Seq(100L).toDF("c_custkey").write.parquet(s"$d/customer.parquet")
    Seq((1000L, 100L), (1001L, 999L)) // 999: dangling customer
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq[(Option[Long], Option[Long], Option[Long])](
      (Some(1000L), Some(1L), Some(10L)),  // clean (but dup part key 1)
      (Some(1000L), Some(2L), Some(11L)),  // dangling supplier 11
      (Some(9999L), Some(1L), Some(10L)),  // dangling order 9999
      (None, Some(3L), None))              // null order/supp, dangling part 3
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q34 counts each fact row once despite a duplicated dim key") {
    val got = SparkEntry.queries("q34_fk_audit")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("lineitem.l_orderkey->orders") == ((4L, 1L, 1L)))
    assert(got("lineitem.l_partkey->part") == ((4L, 0L, 1L)))
    assert(got("lineitem.l_suppkey->supplier") == ((4L, 1L, 1L)))
    assert(got("orders.o_custkey->customer") == ((2L, 0L, 1L)))
  }
}
