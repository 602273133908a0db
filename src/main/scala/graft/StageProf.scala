package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement-only harness (optimization rounds): per-stage/per-job time
  * attribution for one declared query. Runs the query once untimed (codegen
  * + JIT + listings), then once with a listener attached, and prints every
  * job and stage with wall time, task count, executor run/CPU time and
  * shuffle bytes — the local-mode stand-in for the Spark UI's stage table
  * (the UI is disabled in the bench contract).
  *
  *   sbt "runMain graft.StageProf <sfDir> <query> [query ...]"
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_agg")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-stageprof", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(jobId: Int, stageId: Int, name: String, wallMs: Long,
      tasks: Int, runMs: Long, cpuMs: Long, deserMs: Long, gcMs: Long,
      shRead: Long, shWrite: Long)

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // Warm run: absorbs codegen/JIT/file listing like the bench's cold run.
      spark.sharedState.cacheManager.clearCache()
      fn(spark, sfDir).count()
      spark.sharedState.cacheManager.clearCache()
      System.gc()

      val stages = ArrayBuffer.empty[StageRow]
      val stageToJob = scala.collection.mutable.Map.empty[Int, Int]
      var nJobs = 0
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          nJobs += 1
          js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for (s <- si.submissionTime; c <- si.completionTime) yield c - s).getOrElse(-1L)
          val m = si.taskMetrics
          stages += StageRow(stageToJob.getOrElse(si.stageId, -1), si.stageId,
            si.name, wall, si.numTasks, m.executorRunTime, m.executorCpuTime / 1000000L,
            m.executorDeserializeTime, m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.queryExecution.executedPlan // force analysis + optimization + physical planning
      val tPlan = (System.nanoTime() - t0) / 1e9
      val rows = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // Post-execution (AQE-final) join strategy census: the static
      // explain shows isFinalPlan=false, so runtime SMJ→SHJ rewrites
      // are only visible here.
      val finalPlan = df.queryExecution.executedPlan.toString
      def joins(p: String): String = Seq("SortMergeJoin", "ShuffledHashJoin",
        "BroadcastHashJoin").map(j => s"$j=${p.sliding(j.length).count(_ == j)}")
        .mkString(" ")
      println(s"  finalPlanJoins: ${joins(finalPlan)}")

      def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
      println(s"\n===== $n rows=$rows wall=${fmt(dt)}s build=${fmt(tBuild)}s " +
        s"plan=${fmt(tPlan)}s jobs=$nJobs stages=${stages.size} " +
        s"sumStageWall=${fmt(stages.map(_.wallMs).sum / 1e3)}s " +
        s"sumRun=${fmt(stages.map(_.runMs).sum / 1e3)}s =====")
      stages.sortBy(-_.wallMs).foreach { s =>
        println(f"  job=${s.jobId}%3d stage=${s.stageId}%4d wall=${s.wallMs}%6dms " +
          f"tasks=${s.tasks}%3d run=${s.runMs}%6dms cpu=${s.cpuMs}%6dms " +
          f"deser=${s.deserMs}%6dms gc=${s.gcMs}%5dms " +
          f"shR=${s.shRead}%9d shW=${s.shWrite}%9d  ${s.name.take(70)}%s")
      }
    }
    spark.stop()
  }
}
