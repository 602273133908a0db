package graft.operators

import graft.{SparkSpecBase, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions.{col, greatest, least}

/** Pins the crash-replay contract of [[NearDupIndex.addDocuments]]'s
  * commit order (pairs → bands → shingles, shingles = commit point).
  * Lives in graft.operators to reach Dedup's package-private stages,
  * which it uses to forge the exact on-disk state of an in-flight
  * crash. */
class NearDupIndexCrashSpec extends SparkSpecBase {

  private def fullPairs = Dedup.d2MinHashLsh.run(spark, sf())
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def indexPairs(root: String) = NearDupIndex.pairs(spark, root)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("crash after pairs+bands but before shingles is healed by replay") {
    val root = Files.createTempDirectory("neardup-idx-crash").toString
    val docs = Tables.documents(spark, sf())
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    NearDupIndex.addDocuments(spark, half1, root)
    // Forge the worst in-flight crash of addDocuments(half2): pairs and
    // bands appended, shingles (the commit point) NOT — exactly the
    // state the commit order leaves behind if the JVM dies between the
    // last two writes.
    val sh2 = Dedup.shingled(half2).cache()
    val bands2 = Dedup.minhashBands(sh2)
    val cand = spark.read.parquet(s"$root/bands").union(bands2).as("a")
      .join(bands2.as("b"),
        col("a.band") === col("b.band") && col("a.hx") === col("b.hx")
          && col("a.hy") === col("b.hy") && col("a.doc_id") =!= col("b.doc_id"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    val allSh = spark.read.parquet(s"$root/shingles").union(sh2.select("doc_id", "sh"))
    Dedup.exactJaccard(cand, allSh)
      .filter(col("jac") >= Dedup.jaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jac").as("jaccard"))
      .write.mode("append").parquet(s"$root/pairs")
    bands2.write.mode("append").parquet(s"$root/bands")
    sh2.unpersist()
    // Replay the batch: the anti-join keys on SHINGLES, so half2 is
    // re-admitted; the duplicate band/pair rows it re-appends collapse
    // through the distinct()s. The index must converge to the full set.
    NearDupIndex.addDocuments(spark, half2, root)
    assert(indexPairs(root) == fullPairs)
    // And a further replay is a no-op.
    assert(NearDupIndex.addDocuments(spark, half2, root) == 0L)
    assert(indexPairs(root) == fullPairs)
  }
}
