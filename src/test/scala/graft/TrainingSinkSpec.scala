package graft

import graft.sources.TrainingSink
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Export-sink contract: content round-trips exactly, shard assignment
  * is a pure function of the key (stable across physical layouts), and
  * the one-file-per-shard layout holds. */
class TrainingSinkSpec extends SparkSpecBase {

  test("JSONL export round-trips content and shard assignment is layout-independent") {
    val out = Files.createTempDirectory("graft-sink").toString
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val n = TrainingSink.writeJsonlShards(docs, s"$out/docs", "doc_id", 8)
    assert(n == docs.count())
    val back = TrainingSink.readJsonlShards(spark, s"$out/docs")
    // Content equality (json reads longs back as longs here).
    val a = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = back.select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    // Same rows exported through a DIFFERENT physical layout land in the
    // SAME shards: assignment depends only on the key.
    val out2 = Files.createTempDirectory("graft-sink2").toString
    TrainingSink.writeJsonlShards(docs.repartition(17).sortWithinPartitions("lang"),
      s"$out2/docs", "doc_id", 8)
    def shardMap(p: String) = TrainingSink.readJsonlShards(spark, p)
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shardMap(s"$out/docs") == shardMap(s"$out2/docs"))
  }

  test("rejects an input that already carries a 'shard' column, and counts an empty input as 0") {
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("lang"))
    val out = Files.createTempDirectory("graft-sink4").toString
    // A caller-side 'shard' column would be silently overwritten and its
    // data dropped from the export — refuse instead.
    intercept[IllegalArgumentException] {
      TrainingSink.writeJsonlShards(
        docs.withColumn("shard", lit(99)), s"$out/bad", "doc_id", 4)
    }
    // Empty input: zero rows written, no schema-inference crash from
    // re-reading a fileless output tree.
    assert(TrainingSink.writeJsonlShards(docs.limit(0), s"$out/empty", "doc_id", 4) == 0L)
  }

  test("each shard directory holds exactly one gzip part file") {
    val out = Files.createTempDirectory("graft-sink3").toString
    TrainingSink.writeJsonlShards(
      Tables.documents(spark, sf()).select("doc_id", "lang"), s"$out/d", "doc_id", 4)
    val shardDirs = Files.list(Paths.get(s"$out/d")).toArray.map(_.toString)
      .filter(_.contains("shard="))
    assert(shardDirs.length == 4, shardDirs.mkString(","))
    shardDirs.foreach { dir =>
      val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(p => p.contains("part-") && p.endsWith(".json.gz"))
      assert(parts.length == 1, s"$dir: ${parts.length} part files")
    }
  }
}
