package graft

import graft.operators.Curation
import java.nio.file.Files

/** The persisted-pair-table curation path must agree byte-for-byte with
  * the inline c1 pipeline (whose values the DuckDB oracle gate pins). */
class CurationSpec extends SparkSpecBase {

  test("curation against a persisted near-dup pair table equals the inline DAG") {
    val table = Files.createTempDirectory("graft-pairs").resolve("neardup_pairs").toString
    val nPairs = Curation.persistNearDupPairs(spark, sf(), table)
    assert(nPairs >= 0L)
    val inline = Curation.c1Curation.run(spark, sf())
      .collect().map(_.toString).sorted.toSeq
    val persisted = Curation.curateAgainstPairs(spark, sf(), table)
      .collect().map(_.toString).sorted.toSeq
    assert(persisted == inline)
    assert(inline.nonEmpty)
  }

  test("curation composes with the incrementally-built index") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-idx-curate").toString
    val docs = Tables.documents(spark, sf())
    graft.operators.NearDupIndex.addDocuments(
      spark, docs.filter(col("doc_id") % 2 === 0), root)
    graft.operators.NearDupIndex.addDocuments(
      spark, docs.filter(col("doc_id") % 2 === 1), root)
    val viaIndex = Curation.curateAgainstPairs(spark, sf(), s"$root/pairs")
      .collect().map(_.toString).sorted.toSeq
    val inline = Curation.c1Curation.run(spark, sf())
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex == inline)
  }

  test("persisted pairs reload with the d2 schema") {
    val table = Files.createTempDirectory("graft-pairs2").resolve("neardup_pairs").toString
    Curation.persistNearDupPairs(spark, sf(), table)
    val cols = spark.read.parquet(table).columns.toSet
    assert(Set("doc_a", "doc_b").subsetOf(cols), cols.mkString(","))
  }
}
