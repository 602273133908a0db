package graft

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Similarity, TextOps}
import org.apache.spark.sql.functions._

/** Invariants of the training-sequence prep operators (t33 chunking,
  * t34 block packing, s12 int8 quantization) beyond the DuckDB oracle
  * gate — the oracle proves both engines compute the same thing; these
  * prove the thing computed has the properties the pipeline relies on.
  */
class TrainingPrepSpec extends SparkSpecBase {

  test("t36: forged PII corpus counts exactly; scrub leaves no residue and is idempotent") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-t36").toString
    Seq(
      (0L, "contact me at alice@example.com or 10.0.0.1 today", "en"),
      (1L, "call 555-123-4567 now or 555-123-4567 later", "en"),
      (2L, "nothing sensitive here", "pt"),
      (3L, "bob@sub.domain.org and 192.168.1.100 and 123-456-7890", "pt"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val census = TextOps.t36PiiScrub.run(spark, tmp).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (n_docs, docs_with_pii, n_emails, n_ipv4, n_phones)
    assert(census("en") == ((2L, 2L, 1L, 1L, 2L)), census.toString)
    assert(census("pt") == ((2L, 1L, 1L, 1L, 1L)), census.toString)
    // Scrub removes every match (no residual PII) and is idempotent.
    val scrubbed = spark.read.parquet(s"$tmp/documents.parquet")
      .select(TextOps.scrubPii(col("text")).as("s"))
    assert(scrubbed.filter(col("s").rlike(TextOps.EmailRe)
      || col("s").rlike(TextOps.Ipv4Re) || col("s").rlike(TextOps.PhoneRe)).isEmpty)
    assert(scrubbed.withColumn("s2", TextOps.scrubPii(col("s")))
      .filter(col("s2") =!= col("s")).isEmpty)
  }

  test("t33 chunks tile every document: contiguous starts, full coverage, bounded width") {
    val chunks = TextOps.t33DocChunking.run(spark, sf()).cache()
    try {
      // Doc-level roll-up of the chunk rows.
      val byDoc = chunks.groupBy("doc_id").agg(
        min("start_token").as("first_start"),
        max(col("start_token") + col("n_tokens") - 1).as("covered_to"),
        max("n_tokens").as("widest"),
        count(lit(1)).as("n_chunks"),
        // starts are 1, 1+stride, …: max start == 1 + (n_chunks-1)*stride
        max("start_token").as("last_start"))
      val docLen = Tables.documents(spark, sf())
        .select(col("doc_id"), size(TextFns.tokens(col("text"))).cast("long").as("len"))
      val joined = byDoc.join(docLen, "doc_id").collect()
      assert(joined.nonEmpty)
      joined.foreach { r =>
        val (first, coveredTo, widest, nChunks, lastStart, len) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))
        assert(first == 1L, s"doc ${r.get(0)}: first chunk starts at $first")
        assert(coveredTo == len, s"doc ${r.get(0)}: covered to $coveredTo of $len tokens")
        assert(widest <= 32L, s"doc ${r.get(0)}: chunk wider than ChunkLen")
        assert(lastStart == 1L + (nChunks - 1) * 24L,
          s"doc ${r.get(0)}: starts not on the stride grid")
      }
      // Overlap is real on multi-chunk docs: with stride < width, some doc
      // must emit more than one chunk at this corpus's lengths.
      assert(joined.exists(_.getLong(4) > 1), "no doc produced multiple chunks")
    } finally chunks.unpersist()
  }

  test("t34 interior blocks hold exactly BlockSize tokens; carryover ≤ 1; totals conserved") {
    val blocks = TextOps.t34BlockPacking.run(spark, sf()).cache()
    try {
      val rows = blocks.collect()
      assert(rows.nonEmpty)
      // Per (lang, shard): every block except the last is exactly full,
      // blocks are dense 0..max, and at most one document can straddle
      // into any block (documents are contiguous in the stream).
      rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
        case ((lang, shard), rs) =>
          val byBlock = rs.sortBy(_.getLong(2))
          val ids = byBlock.map(_.getLong(2))
          assert(ids.sameElements(0L until ids.length.toLong),
            s"($lang,$shard): block ids not dense: ${ids.mkString(",")}")
          byBlock.dropRight(1).foreach { r =>
            assert(r.getLong(4) == 512L,
              s"($lang,$shard) block ${r.getLong(2)}: interior block has ${r.getLong(4)} tokens")
          }
          byBlock.foreach { r =>
            assert(r.getLong(5) <= 1L,
              s"($lang,$shard) block ${r.getLong(2)}: ${r.getLong(5)} carryover docs")
          }
          // Block 0 by construction starts at offset 0: nothing carries in.
          assert(byBlock.head.getLong(5) == 0L)
      }
      // Conservation: the packed token total is the corpus token total.
      val packed = rows.map(_.getLong(4)).sum
      val corpus = Tables.documents(spark, sf())
        .select(size(TextFns.tokens(col("text"))).cast("long").as("n"))
        .filter(col("n") >= 1).agg(sum("n")).collect()(0).getLong(0)
      assert(packed == corpus, s"packed $packed tokens, corpus has $corpus")
    } finally blocks.unpersist()
  }

  test("s12 codes stay in int8 range and reconstruction error is within the scalar-quant bound") {
    val rep = Similarity.s12Int8Quantize.run(spark, sf()).collect()
    assert(rep.nonEmpty)
    // Worst-case per-element error of symmetric 127-level quantization is
    // mx/254 + rounding slack; bound mse by (mxMax/254 + 1)².
    val mxMax = Tables.embeddings(spark, sf())
      .select(explode(VectorFns.quantize(col("embedding"))).as("x"))
      .agg(max(abs(col("x")))).collect()(0).getLong(0)
    val bound = math.pow(mxMax / 254.0 + 1.0, 2)
    rep.foreach { r =>
      val (nVecs, sqErr, maxCode, mse) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nVecs > 0)
      assert(maxCode <= 127L, s"label ${r.get(0)}: code $maxCode out of int8 range")
      assert(maxCode > 0L, s"label ${r.get(0)}: all-zero codes (degenerate scale)")
      assert(sqErr > 0L, s"label ${r.get(0)}: zero error — quantization not lossy?")
      assert(mse <= bound, s"label ${r.get(0)}: mse $mse exceeds bound $bound")
    }
  }
}
