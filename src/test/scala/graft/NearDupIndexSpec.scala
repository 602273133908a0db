package graft

import graft.operators.{Dedup, NearDupIndex}
import graft.streaming.DocStream
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** The incremental near-dup index must converge to exactly the batch
  * operator's pair set, regardless of how the corpus is batched — and
  * replays must be no-ops. */
class NearDupIndexSpec extends SparkSpecBase {

  private def fullPairs = Dedup.d2MinHashLsh.run(spark, sf())
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def indexPairs(root: String) = NearDupIndex.pairs(spark, root)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental adds over two batches equal the batch d2 pair set") {
    val root = Files.createTempDirectory("neardup-idx").toString
    val docs = Tables.documents(spark, sf())
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)
    val n1 = NearDupIndex.addDocuments(spark, half1, root)
    val n2 = NearDupIndex.addDocuments(spark, half2, root)
    assert(n1 + n2 == fullPairs.size.toLong, s"pair counts: $n1 + $n2 vs ${fullPairs.size}")
    assert(indexPairs(root) == fullPairs)
    // Replay: already-indexed docs are skipped, nothing appended.
    assert(NearDupIndex.addDocuments(spark, half2, root) == 0L)
    assert(indexPairs(root) == fullPairs)
  }

  test("streaming file-batches maintain the same index") {
    val landing = Files.createTempDirectory("neardup-landing")
    val root = Files.createTempDirectory("neardup-idx-stream").toString
    val docs = Tables.documents(spark, sf())
    docs.filter(col("doc_id") % 2 === 0)
      .write.parquet(landing.resolve("b0").toString)
    docs.filter(col("doc_id") % 2 === 1)
      .write.parquet(landing.resolve("b1").toString)
    // Two directories of files drained one file per micro-batch: the
    // index must not depend on batch boundaries.
    val q = DocStream.indexDocuments(
      spark, s"$landing/*", root, docs.schema)
    q.awaitTermination()
    assert(indexPairs(root) == fullPairs)
  }
}
