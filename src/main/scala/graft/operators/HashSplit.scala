package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE train/valid/test split definition — one place, two renderings.
  *
  * Split = md5(key) first-15-hex → int64 → mod 100, thresholds 80/90
  * (80/10/10). t27 ships this split, c3 audits it for near-dup leakage,
  * c4 remedies it with group-aware keys, and the specs verify all three
  * — so the definition must be literally shared, or an edit to t27
  * silently turns the audit into an audit of a DIFFERENT split than the
  * one shipped (round-7 advice). Both renderings are pure per-row
  * arithmetic: no shuffle, no state, stable under re-runs and engine
  * choice. */
object HashSplit {

  val TrainPct = 80
  val ValidPct = 90 // exclusive upper bucket of 'valid'; >= 90 is 'test'

  /** 0-99 bucket of a key column (the repo's standard 15-hex md5 →
    * int64 cross-engine hash). */
  def bucketOf(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long") % 100

  /** Spark rendering: 'train' | 'valid' | 'test'. */
  def splitOf(key: Column): Column = {
    val b = bucketOf(key)
    when(b < TrainPct, "train").when(b < ValidPct, "valid").otherwise("test")
  }

  /** DuckDB rendering of [[bucketOf]] for SQL expression `e`. */
  def duckBucket(e: String): String =
    s"CAST(('0x' || substring(md5(CAST($e AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  /** DuckDB rendering of [[splitOf]] for SQL expression `e` (the bucket
    * expression is inlined twice — md5 is cheap next to keeping the
    * oracle structurally identical to the shipped split). */
  def duckSplit(e: String): String = {
    val b = duckBucket(e)
    s"CASE WHEN $b < $TrainPct THEN 'train' WHEN $b < $ValidPct THEN 'valid' ELSE 'test' END"
  }
}
