package graft

/** Throwaway same-JVM interleaved A/B harness (measurement only, r15):
  * alternates a boolean system property per rep inside ONE process so
  * both variants share the identical ambient window — the cross-JVM
  * pair is unusable when the box swings 2-3× within minutes.
  *
  *   sbt "runMain graft.ABProp <sfDir> <reps> <prop> <query> [query ...]"
  */
object ABProp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val prop = args.lift(2).getOrElse("graft.c5.overlap")
    val names = if (args.length > 3) args.drop(3).toSeq else Seq("c5_semantic_curation")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-abprop", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", v)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // Warm both variants untimed (codegen/JIT for both plan shapes).
      Seq("off", "on").foreach { m =>
        System.setProperty(prop, m)
        spark.sharedState.cacheManager.clearCache()
        fn(spark, sfDir).count()
      }
      val times = scala.collection.mutable.Map("off" -> List.empty[Double],
        "on" -> List.empty[Double])
      (1 to reps).foreach { _ =>
        Seq("off", "on").foreach { m =>
          System.setProperty(prop, m)
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          times(m) = times(m) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
      println(s"ABPROP $n $prop off=${times("off").map(fmt).mkString(",")} " +
        s"median=${fmt(med(times("off")))}")
      println(s"ABPROP $n $prop on=${times("on").map(fmt).mkString(",")} " +
        s"median=${fmt(med(times("on")))}")
    }
    spark.stop()
  }
}
