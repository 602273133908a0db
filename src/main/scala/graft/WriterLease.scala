package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Advisory single-writer lease for on-disk artifacts with
  * read-before-write merge contracts — the warehouse ingest (bridge
  * max+1 merge, manifest append; reference semantics
  * spark_script_sim.py:197-255) and the persisted indexes
  * ([[operators.NearDupIndex]], [[operators.AnnIndex]]), all of which a
  * second concurrent writer corrupts SILENTLY (duplicate bridge ids,
  * double-appended facts, lost index pairs).
  *
  * Acquisition is a create-exclusive file (`_writer_lease`) carrying the
  * owner id, a unique lease id, and an epoch stamp. A live lease makes
  * the second writer fail fast and loud; a lease older than `ttlMs` is
  * presumed crashed and is broken — safe because every guarded write
  * path is independently replay-idempotent (manifest day keys,
  * per-family anti-joins), so the recovering writer converges.
  *
  * Scope and honesty notes: this is a correctness net for the DECLARED
  * single-writer deployments, not a distributed lock service — on
  * filesystems without atomic create-exclusive (S3 without conditional
  * writes) two writers racing the same millisecond can both pass; HDFS
  * and local FS creates are atomic. A holder paused LONGER than the TTL
  * (GC, hung NFS) can lose its lease to a recoverer; the lease-id check
  * in renew/release NARROWS — but, absent conditional writes, cannot
  * eliminate — the window in which the waking holder clobbers or deletes
  * the new holder's lease (see [[WriterLease#renew]] for the residual
  * ordering), and it cannot retract writes the paused holder had already
  * issued — size `ttlMs` above the worst expected pause.
  *
  * A daemon heartbeat re-stamps the epoch every ttl/3 for as long as the
  * lease is held, so a HEALTHY long-running writer (a multi-hour ingest,
  * an index build) is never presumed crashed — `ttlMs` is purely the
  * crash-detection bound. A killed JVM takes its heartbeat with it and
  * the lease expires on schedule. */
final class WriterLease private[graft] (fs: FileSystem, val path: Path,
    owner: String, leaseId: String,
    heartbeat: java.util.concurrent.ScheduledExecutorService) {

  /** Set when a post-renew read shows someone else's stamp: the lease
    * was stolen while we were paused, and this holder must stop
    * claiming it (renew becomes a no-op; release won't delete the new
    * holder's file). */
  @volatile private var revoked = false

  private def ownsFile(): Boolean =
    !revoked &&
      WriterLease.readStamp(fs, path).exists(_.contains(s"lease=$leaseId"))

  /** Re-stamp the epoch — ONLY while the on-disk lease is still ours: a
    * holder paused past the TTL may have lost the lease to a recoverer,
    * and overwriting the recoverer's stamp would put two writers live.
    *
    * The ownership check NARROWS that race; it cannot eliminate it on
    * filesystems without conditional writes. Between the check and the
    * overwrite, a recoverer that just broke this (TTL-expired) lease can
    * create its own stamp, which the overwrite then clobbers — that
    * ordering is undetectable afterwards (the re-read shows our own
    * fresh stamp). What the post-write verification below DOES catch is
    * the other ordering — the recoverer stamping after our overwrite —
    * in which case this holder self-revokes instead of fighting. The
    * residual window is one check-to-write gap per heartbeat, versus a
    * full TTL without the check; size `ttlMs` above the worst expected
    * pause (see the class doc). */
  def renew(): Unit =
    if (ownsFile()) {
      WriterLease.stamp(fs, path, owner, leaseId, overwrite = true)
      // Self-revoke ONLY on positive evidence of a foreign stamp. A None
      // read here is ambiguous (most likely a transient IO failure of
      // this beat's verification read) — treating it as theft would
      // permanently silence the heartbeat of a healthy holder and
      // manufacture the very two-writers window the lease prevents; the
      // next beat re-verifies.
      WriterLease.readStamp(fs, path) match {
        case Some(s) if !s.contains(s"lease=$leaseId") => revoked = true
        case _ => ()
      }
    }

  def release(): Unit = {
    // Drain the heartbeat BEFORE deleting: an in-flight re-stamp landing
    // after the delete would resurrect an ownerless lease and block the
    // next writer for a full TTL.
    heartbeat.shutdownNow()
    heartbeat.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
    // Delete only OUR lease: if a recoverer stole it mid-pause, the file
    // now belongs to them.
    if (ownsFile()) fs.delete(path, false)
    ()
  }
}

object WriterLease {

  val LeaseFile = "_writer_lease"
  val DefaultTtlMs: Long = 15 * 60 * 1000L

  /** hostname@pid — diagnostic identity for the conflict message. */
  def processOwner(tag: String): String =
    s"$tag:${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"

  private def stamp(fs: FileSystem, p: Path, owner: String, leaseId: String,
      overwrite: Boolean): Unit = {
    val out = fs.create(p, overwrite)
    try out.write(
      s"owner=$owner lease=$leaseId epoch=${System.currentTimeMillis()}\n"
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** The stamp's content, or None when the file doesn't exist /
    * can't be read (a racing create or release). */
  private def readStamp(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Acquire the lease under `dir` (created if absent). Throws
    * IllegalStateException if a non-expired lease is held by anyone —
    * including another process of the same job: the contract is one
    * writer, not one job name.
    *
    * `scope` narrows the lease to one resource group within the dir:
    * the SIM and SINASC ingests write disjoint facts (the reference
    * runs them as two independent DAGs, possibly concurrently), so each
    * takes its own scoped lease and only true same-resource writers
    * conflict. Empty scope = the whole dir (the index roots). */
  def acquire(spark: SparkSession, dir: String, owner: String,
      ttlMs: Long = DefaultTtlMs, scope: String = ""): WriterLease = {
    val suffix = if (scope.isEmpty) "" else s"_$scope"
    val p = new Path(s"$dir/$LeaseFile$suffix")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p.getParent)) fs.mkdirs(p.getParent)
    val leaseId = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try { stamp(fs, p, owner, leaseId, overwrite = false); true }
      catch { case _: java.io.IOException => false }

    // Bounded attempts: each loop iteration either creates, proves the
    // lease live (throw), or breaks a provably-dead lease and retries —
    // the retry bound only guards against pathological rename/create
    // thrash under heavy contention.
    var acquired = tryCreate()
    var attempts = 0
    while (!acquired && attempts < 3) {
      attempts += 1
      readStamp(fs, p) match {
        case None =>
          // The file vanished between our create and this read — the
          // holder just released. Take the free lease; don't throw.
          acquired = tryCreate()
        case Some(info) =>
          // An unparseable stamp (holder crashed mid-create, or we peeked
          // between its create-exclusive and its write) falls back to the
          // FILE's mtime: a just-created empty stamp reads as fresh (held
          // — never break a live writer mid-create), while a crashed
          // holder's empty stamp ages out on the same TTL as a written one.
          val epoch = "epoch=(\\d+)".r.findFirstMatchIn(info).map(_.group(1).toLong)
            .orElse(try Some(fs.getFileStatus(p).getModificationTime)
                    catch { case _: java.io.IOException => None })
          val expired = epoch.exists(e => System.currentTimeMillis() - e > ttlMs)
          if (!expired && epoch.isDefined)
            throw new IllegalStateException(
              s"single-writer lease at $p is held ($info) — a concurrent " +
                s"ingest/build/append against the same root would corrupt its " +
                s"merge contracts; wait for the holder or, if it crashed, " +
                s"retry after the ${ttlMs / 1000}s TTL expires")
          if (expired) {
            // Break the dead lease via RENAME, not delete-then-create:
            // rename has exactly one winner when several recoverers race
            // (the losers' source is already gone), where concurrent
            // deletes could each remove the OTHER recoverer's fresh lease
            // and let both proceed. A failed rename means someone else
            // won (or the holder released) — loop and re-evaluate.
            val steal = new Path(p.getParent,
              s".${p.getName}_stale_${java.util.UUID.randomUUID().toString.take(8)}")
            if (fs.rename(p, steal)) fs.delete(steal, false)
          }
          // epoch undefined (file vanished during evaluation) → retry.
          acquired = tryCreate()
      }
    }
    if (!acquired)
      throw new IllegalStateException(
        s"single-writer lease at $p could not be acquired after $attempts " +
          "contended attempts — another writer is actively racing this root")
    // Keep-alive: a live holder re-stamps every ttl/3, so only a DEAD
    // holder's lease can ever reach the expiry a recovering writer
    // breaks. Daemon thread — a killed JVM stops stamping by definition.
    val beat = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, "writer-lease-heartbeat"); t.setDaemon(true); t })
    val period = math.max(ttlMs / 3, 50L)
    val lease = new WriterLease(fs, p, owner, leaseId, beat)
    beat.scheduleAtFixedRate(
      () => try lease.renew() catch { case _: java.io.IOException => () },
      period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    lease
  }

  /** acquire → body → release (release also on failure: a thrown body
    * must not turn into a TTL-long outage for the next writer). */
  def withLease[T](spark: SparkSession, dir: String, owner: String,
      ttlMs: Long = DefaultTtlMs, scope: String = "")(body: => T): T = {
    val lease = acquire(spark, dir, owner, ttlMs, scope)
    try body finally lease.release()
  }

  /** [[withLease]] that BLOCKS with bounded retry instead of failing
    * fast on a live holder — for short-lived, high-contention scopes
    * like the warehouse manifest append, where every holder is another
    * sub-second append and where the caller throwing would strand work
    * already done (a fact day written but its manifest row lost). Long
    * scopes (a whole ingest, an index build) should keep the fail-fast
    * [[withLease]]: there, a live holder means hours, not milliseconds,
    * and failing loudly is the right answer. Rethrows the last
    * contention error once `maxWaitMs` elapses. */
  def withLeaseRetry[T](spark: SparkSession, dir: String, owner: String,
      ttlMs: Long = DefaultTtlMs, scope: String = "",
      maxWaitMs: Long = 60000L)(body: => T): T = {
    val deadline = System.currentTimeMillis() + maxWaitMs
    // Retry ONLY the acquisition: a body failure must propagate once,
    // not re-run the body.
    var lease: WriterLease = null
    while (lease == null) {
      try lease = acquire(spark, dir, owner, ttlMs, scope)
      catch {
        case e: IllegalStateException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(100L + scala.util.Random.nextInt(100))
      }
    }
    try body finally lease.release()
  }
}
