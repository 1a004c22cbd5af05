package graft

/** Spawns `graft.ChaosRetry` ONCE per test run (MemorySpec's subprocess
  * pattern) and shares its output between ArchiveSinkSpec and KbDimSpec —
  * the chaos run needs a retry-enabled `local[4, 2]` scheduler, which the
  * shared test session's fixed SparkContext cannot provide. The runner JVM
  * does the invariant checks itself (require → nonzero exit); the specs
  * assert exit 0 and the per-scenario stats line. */
object ChaosRetryRunner {

  /** Spawn `mainClass` with the test JVM's --add-opens and classpath, drain
    * stderr on a daemon thread, and return (exitCode, stdout, stderr). */
  private def spawn(
      mainClass: String, xmx: String,
      env: Map[String, String] = Map.empty): (Int, String, String) = {
    val javaBin = sys.props("java.home") + "/bin/java"
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString).filter(_.startsWith("--add-opens"))
    val cmd = Seq(javaBin) ++ addOpens ++
      Seq(s"-Xmx$xmx", "-cp", sys.props("java.class.path"), mainClass)
    val pb = new ProcessBuilder(cmd: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val errBuf = new StringBuilder
    val errThread = new Thread(() =>
      scala.io.Source.fromInputStream(proc.getErrorStream)
        .foreach(c => errBuf.synchronized { errBuf.append(c); () }))
    errThread.setDaemon(true)
    errThread.start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    val code = proc.waitFor()
    errThread.join(2000)
    (code, out, errBuf.synchronized(errBuf.toString))
  }

  lazy val run: (Int, String, String) = spawn("graft.ChaosRetry", "4g")

  /** Spawns `graft.ChaosSpeculation` once — the speculative-execution
    * race (r14). Unlike [[run]], the subprocess hosts a real two-worker
    * standalone cluster whose workers spawn executor JVMs through the
    * Spark distribution's launcher, so it needs SPARK_HOME and
    * SPARK_SCALA_VERSION in its environment (the test JVM itself may not
    * have them — set explicitly from the known layout). */
  lazy val speculationRun: (Int, String, String) =
    spawn("graft.ChaosSpeculation", "2g", Map(
      "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
      "SPARK_SCALA_VERSION" -> "2.13"))

  /** The runner's JSON stats line for `scenario`, failing with the
    * subprocess's stderr tail if it died. `speculation` comes from the
    * two-host cluster subprocess, everything else from the local[4,2]
    * retry runner. */
  def line(scenario: String): String = {
    val (code, out, err) =
      if (scenario == "speculation") speculationRun else run
    assert(code == 0,
      s"chaos runner exited $code; stderr tail: ${err.takeRight(1200)}")
    out.linesIterator.find(_.contains(s""""scenario":"$scenario"""")).getOrElse(
      throw new AssertionError(s"no $scenario line in chaos output: $out"))
  }

  def stat(scenario: String, key: String): Long = {
    val l = line(scenario)
    s""""$key":(-?\\d+)""".r.findFirstMatchIn(l)
      .getOrElse(throw new AssertionError(s"no $key in $l")).group(1).toLong
  }
}
