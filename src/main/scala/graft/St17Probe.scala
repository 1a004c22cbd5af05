package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Where does st17_streaming_neardup's wall time go, and how does each
  * stage scale? (r16 verdict ask #3: st17 is the sf1 paired-bench series
  * max every round since r14 — ~3.2 vs the 1.35 median.)
  *
  * st17 keeps NO state-store state (foreachBatch + a filesystem band
  * index), so `StreamingQueryProgress` shows one addBatch blob and the
  * state-store hypothesis from the verdict cannot be tested from the
  * listener — this probe times the stages INSIDE the batch function at
  * both scales instead: staging, stream scaffolding, per-batch minhash
  * signature computation, the index read + anti-join probe, and the two
  * parquet writes. Output: one JSON line per (side, stage, seconds).
  *
  * Run: `java -cp ... graft.St17Probe [sf0.1-dir] [sf1-dir] [out.json]`.
  */
object St17Probe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaledDir = args.lift(1).getOrElse("/tmp/sf1")
    val outPath = args.lift(2).getOrElse("/tmp/st17_probe.json")
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val out = new StringBuilder("{\n")
    for ((side, dir) <- Seq("sf0_1" -> baseDir, "sf1" -> scaledDir)) {
      // staging (once per JVM per dir — NOT in ScaleBench's timed runs)
      val (staged, tStage) = time(queries.StreamingQ.stageSt17(spark, dir))

      // full query, warmed then 3 samples — the ScaleBench view
      val (_, warm) = time(
        queries.StreamingQ.st17StreamingNeardup(spark, dir).write
          .format("noop").mode("overwrite").save())
      val samples = Seq.fill(3)(time(
        queries.StreamingQ.st17StreamingNeardup(spark, dir).write
          .format("noop").mode("overwrite").save())._2)

      // stage decomposition: replay the two micro-batches by hand with
      // per-stage materialization barriers (counts / writes)
      val idx = java.nio.file.Files.createTempDirectory("p17_idx").toString
      val sink = java.nio.file.Files.createTempDirectory("p17_sink").toString
      val halves = Seq(0, 1).map(h =>
        spark.read.parquet(staged).filter($"half" === h)
          .select($"doc_id", $"lang", $"text"))
      var stages = Vector.empty[(String, Double)]
      for ((batch, batchId) <- halves.zipWithIndex) {
        val cached = batch.persist()
        val (nRows, tCache) = time(cached.count())
        val bands = queries.Llm.minhashBands(
          cached.select($"doc_id".as("id"), $"text")).persist()
        val (nBands, tSig) = time(bands.count())
        val dupT =
          if (batchId == 0) 0.0
          else time {
            val dup = bands.join(
              spark.read.parquet(idx).filter($"batch_id" < batchId),
              Seq("band", "bi")).select($"id").distinct().persist()
            dup.count()
            val kept = cached.join(dup, cached("doc_id") === dup("id"), "left_anti")
            kept.count()
            dup.unpersist()
          }._2
        val (_, tWriteKept) = time(
          cached.select($"doc_id", $"lang")
            .write.mode(SaveMode.Overwrite).parquet(s"$sink/batch_id=$batchId"))
        val (_, tWriteBands) = time(
          bands.select($"band", $"bi")
            .write.mode(SaveMode.Overwrite).parquet(s"$idx/batch_id=$batchId"))
        bands.unpersist(); cached.unpersist()
        stages ++= Seq(
          s"b$batchId.cache_rows_$nRows" -> tCache,
          s"b$batchId.minhash_bands_$nBands" -> tSig,
          s"b$batchId.index_probe_join" -> dupT,
          s"b$batchId.write_kept" -> tWriteKept,
          s"b$batchId.write_bands" -> tWriteBands)
      }
      out.append(s"""  "$side": {\n""")
      out.append(s"""    "staging_sec": ${f"$tStage%.3f"}, "warm_sec": ${f"$warm%.3f"},\n""")
      out.append(s"""    "samples_sec": [${samples.map(s => f"$s%.3f").mkString(", ")}],\n""")
      out.append(stages.map { case (k, v) => s"""    "$k": ${f"$v%.3f"}""" }
        .mkString(",\n"))
      out.append(s"\n  }${if (side == "sf0_1") "," else ""}\n")
      println(s"$side done: warm=$warm samples=$samples")
    }
    out.append("}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.toString.getBytes("UTF-8"))
    println(s"wrote $outPath")
    spark.stop()
  }
}
