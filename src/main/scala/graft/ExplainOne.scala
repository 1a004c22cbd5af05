package graft

/** Print the AQE-final executed plan of one registered query at any SF:
  * `sbt "runMain graft.ExplainOne <query> [sfDir]"`. The companion of
  * PlanAudit for ad-hoc plan inspection at non-default scale factors. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Engine.session()
    // build INSIDE the timer, like Bench: several queries run eager
    // localCheckpoint materializations while being built, and timing only
    // the final write would silently exclude them
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"=== $name @ $dir (${f"$sec%.2f"} s) ===")
    println(df.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
