package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Lazy broadcast-sketch membership probe built from Spark's own
  * runtime-filtering expressions (`BloomFilterAggregate` +
  * `BloomFilterMightContain`, the pair the optimizer's
  * InjectRuntimeFilter rule wires up for shuffle-join pruning; neither is
  * exposed through `org.apache.spark.sql.functions`, hence this shim in
  * the extension package next to [[Bridge]]).
  *
  * `mightContain(build, key, …)(value)` returns a boolean Column that
  * tests `value` against a Bloom filter aggregated over `build`'s `key`
  * column. The filter is wired in as a SCALAR SUBQUERY, exactly like the
  * optimizer's own injection: the aggregate runs as its own (lazy,
  * executor-side) Spark job when the consuming plan first executes, and
  * the resulting sketch bytes are inlined into the probe's generated
  * code. Nothing happens at Column-construction time — operators built
  * on this stay lazy like every other Op — and nothing but the
  * fixed-size sketch ever reaches the driver.
  *
  * Why this matters at 100 TB: a semi/equi-join against a small build
  * side still SHUFFLES or at least scans-and-hashes the full probe side.
  * A Bloom probe filters the probe side IN THE SCAN STAGE at
  * O(bits) broadcast cost, so only candidate rows (true matches + the
  * configured false-positive tail) reach the join that confirms them.
  * Correctness is unaffected as long as a confirming exact join follows:
  * Bloom filters have no false negatives.
  *
  * Sizing: `numBits ≈ 1.44 · n · log2(1/fpp)` — 8 bits/key ≈ 2% false
  * positives. Both sizes must be compile-time constants (the aggregate
  * requires foldable arguments), so callers size for the TARGET scale,
  * not the observed input; an oversized filter costs only broadcast
  * bytes.
  */
object BloomProbe {

  /** Boolean probe Column: might `value` be among `build`'s `key`s?
    * False ⇒ definitely absent; true ⇒ present or false positive (rate
    * set by `numBits` / #distinct keys). `key` and `value` must be
    * LONG columns (hash wider keys to int64 first — the engine's
    * standard 15-hex-md5 keys are already exactly that). */
  def mightContain(build: DataFrame, key: Column, estItems: Long, numBits: Long)(
      value: Column): Column = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(key), Literal(estItems), Literal(numBits))
      .toAggregateExpression()
    val bloomDf = build.select(Bridge.column(agg).as("bloom_bytes"))
    val plan =
      bloomDf.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.analyzed
    Bridge.column(BloomFilterMightContain(ScalarSubquery(plan), Bridge.expression(value)))
  }
}
