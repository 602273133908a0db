package graft

import graft.operators.NearDupIndex
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Single-writer lease contract: a live lease makes the second writer
  * fail fast and loud; a crashed writer's (expired) lease is broken and
  * the replay-idempotent write paths converge. */
class WriterLeaseSpec extends SparkSpecBase {

  test("second acquire fails while held, succeeds after release, breaks an expired lease") {
    val dir = Files.createTempDirectory("lease").toString
    val l1 = WriterLease.acquire(spark, dir, "writer-1")
    val ex = intercept[IllegalStateException] {
      WriterLease.acquire(spark, dir, "writer-2")
    }
    assert(ex.getMessage.contains("writer-1"))
    l1.release()
    WriterLease.acquire(spark, dir, "writer-2").release()
    // A crashed writer never releases: its stale epoch is past the TTL,
    // so the next writer breaks the lease instead of waiting forever.
    // (Sleep past the tiny TTL: expiry is strict millisecond arithmetic.)
    WriterLease.acquire(spark, dir, "crashed")
    Thread.sleep(50)
    WriterLease.acquire(spark, dir, "recoverer", ttlMs = 10L).release()
  }

  test("heartbeat keeps a live lease from expiring mid-write") {
    val dir = Files.createTempDirectory("lease-hb").toString
    // TTL far shorter than the hold time: without the keep-alive the
    // impatient second writer would break this LIVE lease and corrupt.
    val l = WriterLease.acquire(spark, dir, "long-job", ttlMs = 1000L)
    Thread.sleep(2500)
    intercept[IllegalStateException] {
      WriterLease.acquire(spark, dir, "impatient", ttlMs = 1000L)
    }
    l.release()
    WriterLease.acquire(spark, dir, "next").release()
  }

  test("withLease releases on body failure; renew keeps a long job alive") {
    val dir = Files.createTempDirectory("lease2").toString
    intercept[RuntimeException] {
      WriterLease.withLease(spark, dir, "thrower") { sys.error("boom") }
    }
    // The failed body's lease is gone — no TTL-long outage.
    val l = WriterLease.acquire(spark, dir, "next")
    l.renew()
    intercept[IllegalStateException] { WriterLease.acquire(spark, dir, "other") }
    l.release()
  }

  test("a concurrent writer against a held warehouse fails fast; ingest replays after expiry") {
    val dir = Files.createTempDirectory("lease-wh")
    val wh = new olapsus.Warehouse(spark, dir.resolve("wh").toString)
    olapsus.Dims.seedAll(wh,
      olapsus.Fixtures.write(dir, "municipio.csv", olapsus.Fixtures.municipio),
      olapsus.Fixtures.write(dir, "cbo.csv", olapsus.Fixtures.cbo),
      olapsus.Fixtures.write(dir, "cid.csv", olapsus.Fixtures.cid))
    val csvGlob = olapsus.Fixtures.write(dir, "sinasc.csv", olapsus.Fixtures.sinasc)
    val held = WriterLease.acquire(spark, wh.root, "other-driver", scope = "sinasc")
    intercept[IllegalStateException] {
      olapsus.Pipeline.ingestSinasc(wh, csvGlob, "2020-01-01")
    }
    // Scopes are independent: a SIM writer does not block a SINASC day
    // (the reference's two DAGs run concurrently against one warehouse).
    val simHeld = WriterLease.acquire(spark, wh.root, "sim-driver", scope = "sim")
    held.release()
    assert(olapsus.Pipeline.ingestSinasc(wh, csvGlob, "2020-01-01") > 0L)
    simHeld.release()
    // Crash-replay: a leftover expired lease (epoch forged into the past)
    // does not block the idempotent re-run.
    val stale = WriterLease.acquire(spark, wh.root, "crashed-driver", scope = "sinasc")
    val leaseFile = java.nio.file.Paths.get(wh.root, s"${WriterLease.LeaseFile}_sinasc")
    assert(java.nio.file.Files.exists(leaseFile))
    // Forge expiry by backdating the stamp through the same FS API.
    // (Release first so the holder's heartbeat can't re-stamp over it.)
    stale.release()
    val fs = new org.apache.hadoop.fs.Path(wh.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"${wh.root}/${WriterLease.LeaseFile}_sinasc"), true)
    out.write("owner=crashed-driver epoch=1000\n".getBytes("UTF-8")); out.close()
    // Re-ingest of the logged day: lease broken, manifest makes it a no-op.
    assert(olapsus.Pipeline.ingestSinasc(wh, csvGlob, "2020-01-01") == 0L)
    stale.release() // already broken; harmless
  }

  test("seed writes and bucketed rebuilds are writers too: a held table scope makes them fail fast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lease-wr")
    val wh = new olapsus.Warehouse(spark, dir.resolve("wh").toString)
    // Warehouse.write takes the table's lease scope — the exact scope a
    // compaction of that table holds — so seed-vs-compact races lose
    // loudly instead of interleaving file rewrites.
    val heldSeed = WriterLease.acquire(spark, wh.root, "compactor", scope = "dimTest")
    intercept[IllegalStateException] { wh.write("dimTest", Seq(1, 2).toDF("v")) }
    heldSeed.release()
    wh.write("dimTest", Seq(1, 2).toDF("v"))
    // writeBucketed guards the bucketed DIRECTORY it rewrites, under the
    // same scope compact("dimtest_bucketed") takes.
    val heldBucket = WriterLease.acquire(spark, wh.root, "compactor", scope = "dimtest_bucketed")
    intercept[IllegalStateException] { wh.writeBucketed("dimTest", 2, Seq("v")) }
    heldBucket.release()
    assert(wh.writeBucketed("dimTest", 2, Seq("v")) == "dimtest_bucketed")
  }

  test("concurrent manifest appends block-and-retry: the loser waits instead of throwing after its fact write") {
    val dir = Files.createTempDirectory("lease-manifest")
    val wh = new olapsus.Warehouse(spark, dir.resolve("wh").toString)
    // Forge the race ADVICE r8 flagged: one dataset's driver holds the
    // manifest scope while the other dataset finishes its fact write and
    // calls logIngest. Fail-fast would throw here — stranding an
    // appended-but-unlogged day; the retry path must just wait.
    val held = WriterLease.acquire(spark, wh.root, "sinasc-manifest",
      scope = olapsus.Warehouse.ManifestScope)
    @volatile var failure: Throwable = null
    val simDriver = new Thread(() =>
      try wh.logIngest("sim", "2020-03-01")
      catch { case t: Throwable => failure = t })
    simDriver.start()
    Thread.sleep(1000) // the logIngest is now inside its retry loop
    assert(simDriver.isAlive, "logIngest gave up instead of waiting for the holder")
    held.release()
    simDriver.join(30000)
    assert(!simDriver.isAlive && failure == null,
      s"logIngest failed under manifest contention: $failure")
    assert(wh.ingestLogged("sim", "2020-03-01"))
  }

  test("index writers take the lease: concurrent addDocuments/build fail fast") {
    val root = Files.createTempDirectory("lease-idx").toString
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 50)
    val held = WriterLease.acquire(spark, root, "other-indexer")
    intercept[IllegalStateException] {
      NearDupIndex.addDocuments(spark, docs, root)
    }
    intercept[IllegalStateException] {
      operators.AnnIndex.build(spark, sf(), root)
    }
    held.release()
    NearDupIndex.addDocuments(spark, docs, root)
    assert(NearDupIndex.addDocuments(spark, docs, root) == 0L)
  }
}
