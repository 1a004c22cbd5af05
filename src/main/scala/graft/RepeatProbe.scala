package graft

import org.apache.spark.sql.SparkSession

/** Repeated-run drift prober: run one registered query N times in one
  * JVM and print, per run, everything that could plausibly accumulate —
  * wall, GC time delta, heap in use, persisted-RDD count, block-manager
  * remaining memory, and the on-disk size of this context's scratch
  * (blockmgr + spark-local shuffle dirs). Built for the g7 sf10 drift
  * (r13 disclosed 57.8 → 94.9 s; r14 measured 50 → 179 s in ScaleBench's
  * shared JVM even after the checkpoint-lifecycle fix) — the question is
  * WHICH resource grows with run index.
  *
  * Run: `java … graft.RepeatProbe <query> <sfDir> [n]`.
  */
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true") // pinned, see Engine.session
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.kb", classOf[graft.sources.KbCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def scratchBytes: Long = {
      // every blockmgr-/spark- dir under spark.local.dir. This sums dirs
      // from EVERY live Spark JVM on the box, not just this one (the names
      // carry no app id) — run the probe alone, or the column misattributes
      // a concurrent process's growth to this one.
      val local = spark.sparkContext.getConf.get("spark.local.dir", "/tmp")
      local.split(",").map(new java.io.File(_)).filter(_.isDirectory).map {
        root =>
          // another JVM's shutdown hook can delete root between isDirectory
          // and listFiles — treat the race as "nothing there", same as du
          Option(root.listFiles()).getOrElse(Array.empty).filter(f =>
            f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-"))
            .map(du).sum
      }.sum
    }
    def du(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(du).sum).getOrElse(0L)

    (1 to n).foreach { i =>
      val gc0 = gcMs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val rt = Runtime.getRuntime
      val (mx, rem) = spark.sparkContext.getExecutorMemoryStatus.values.head
      println(f"run $i%d wall ${wall}%.1f s  gc ${(gcMs - gc0) / 1000.0}%.1f s  " +
        f"heapUsed ${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB  " +
        f"persistedRdds ${spark.sparkContext.getPersistentRDDs.size}%d  " +
        f"bmRemaining ${rem / 1e9}%.1f/${mx / 1e9}%.1f GB  " +
        f"scratch ${scratchBytes / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
