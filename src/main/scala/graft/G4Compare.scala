package graft

import org.apache.spark.sql.SparkSession

/** One-JVM A/B for the g4 scope confound flagged by the r13 verdict: the
  * committed g4_pagerank moved 1.92 s (r12) → 3.12 s (r13 driver re-run),
  * but the cached AQE-off child session ([[queries.Nested.pageRank]])
  * landed the SAME round as heavy ambient load, so the records cannot
  * separate "the scoping rework costs real time" from "the machine was
  * busy".
  *
  * This main separates them by running BOTH scopes over the SAME
  * [[queries.Nested.pageRankOn]] body, INTERLEAVED (A B A B …) in one JVM,
  * so JIT state, page cache, and ambient load are identical for both
  * variants on every pair:
  *
  *   - variant `child`: the production path — the cached AQE-off child
  *     session from `newSession()` (fresh SessionState, AQE off in its
  *     own SQLConf, nothing toggled anywhere).
  *   - variant `toggle`: the r12 scope this replaced — set
  *     `spark.sql.adaptive.enabled=false` on the CALLER session, run,
  *     restore. (Rejected for production because a concurrent query
  *     planning on the same session mid-build would silently lose AQE;
  *     resurrected here ONLY as the measurement control.)
  *
  * If the child session costs real time, `child` reads consistently above
  * `toggle` on the interleaved pairs; if r13's regression was load, the
  * two variants read the same. Run:
  *   `java … graft.G4Compare [sfDir] [pairs]`
  */
object G4Compare {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pairs = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true") // pinned, see Engine.session
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val childBuild = {
      val b = spark.newSession()
      b.conf.set("spark.sql.adaptive.enabled", "false")
      b
    }
    def runOn(build: SparkSession): Double = {
      val t0 = System.nanoTime()
      queries.Nested.pageRankOn(build, sfDir, rounds = 3)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def child(): Double = runOn(childBuild)
    def toggle(): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try runOn(spark) finally
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // warm-up: two of each, untimed (the g4 JIT tail spans two executions
    // of the unrolled codegen class — BATCH_METRICS_r12.md)
    (1 to 2).foreach { _ => child(): Unit; toggle(): Unit }
    val childT = collection.mutable.ArrayBuffer.empty[Double]
    val toggleT = collection.mutable.ArrayBuffer.empty[Double]
    (1 to pairs).foreach { i =>
      // alternate which variant goes first inside the pair so within-pair
      // drift (GC, page cache) doesn't systematically favor one side
      if (i % 2 == 1) { childT += child(); toggleT += toggle() }
      else { toggleT += toggle(); childT += child() }
      println(f"pair $i%d: child ${childT.last}%.3f s  toggle ${toggleT.last}%.3f s")
    }
    def stats(xs: Seq[Double]) = {
      val s = xs.sorted
      // true midpoint for even-length samples, not the upper-middle element
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      f"min ${s.head}%.3f  median $med%.3f  max ${s.last}%.3f"
    }
    println(s"child  (cached AQE-off child session): ${stats(childT.toSeq)}")
    println(s"toggle (r12 session-global conf flip): ${stats(toggleT.toSeq)}")
    val loads = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    println(f"loadavg ${loads.getSystemLoadAverage}%.2f  cpus $cpus%s")
    spark.stop()
  }
}
