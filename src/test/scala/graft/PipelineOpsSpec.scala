package graft

import graft.queries.{Llm, Sources}
import org.apache.spark.sql.functions._

/** Quality bounds for the round-6 pipeline operators whose full output is
  * rows-only or whose physical effect (file layout) the oracle can't see. */
class PipelineOpsSpec extends SparkSpec {

  test("L26: k-means assigns every vector once into k clusters and never worsens inertia") {
    import spark.implicits._
    val seed = Llm.kmeansAssignment(spark, sfDir, 0)
    val fitted = Llm.kmeansAssignment(spark, sfDir, 3)
    val n = Engine.embeddings(spark, sfDir).count()
    assert(fitted.count() == n, "assignment must be total")
    assert(fitted.select($"cid").distinct().count() == 4)
    // Lloyd's invariant: each (update centroids, reassign) round can only
    // lower the within-cluster squared distance — 3 rounds vs the raw seed
    val i0 = seed.agg(sum($"d2")).head().getDouble(0)
    val i3 = fitted.agg(sum($"d2")).head().getDouble(0)
    assert(i3 <= i0 + 1e-9, s"inertia grew: seed $i0 -> fitted $i3")
    assert(i3 < i0 * 0.95, s"3 rounds should visibly tighten clusters: $i0 -> $i3")
  }

  test("L26: same seed, same data => identical clustering") {
    def sizes() = Llm.l26KmeansClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sizes() == sizes())
  }

  test("S22: dynamic overwrite rewrites only the restated day partitions") {
    import spark.implicits._
    import org.apache.spark.sql.SaveMode
    val out = java.nio.file.Files.createTempDirectory("s22_test").toString
    val base = Engine.events(spark, sfDir)
      .select($"event_id", $"value", date_format($"ts", "yyyy-MM-dd").as("day"))
    base.write.mode(SaveMode.Overwrite).partitionBy("day").parquet(out)
    def files(day: String) = new java.io.File(s"$out/day=$day").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val keptBefore = files("2024-01-15")
    val restatedBefore = files("2024-01-05")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try base.filter($"day" === "2024-01-05")
      .write.mode(SaveMode.Overwrite).partitionBy("day").parquet(out)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(files("2024-01-15") == keptBefore,
      "untouched partition must keep its exact files")
    assert(files("2024-01-05") != restatedBefore,
      "restated partition must be rewritten")
  }

  test("S20: compaction rewrites each day to one file and keeps every day") {
    val (frag, compact) = Sources.compactLayout(spark, sfDir)
    def filesPerDay(root: String): Map[String, Int] =
      new java.io.File(root).listFiles().filter(_.getName.startsWith("day="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = filesPerDay(frag)
    val after = filesPerDay(compact)
    assert(before.keySet == after.keySet, "compaction must not drop partitions")
    assert(after.values.forall(_ == 1), s"expected 1 file/day, got $after")
    assert(before.values.sum > after.values.sum,
      s"fragmented=$before compacted=$after")
  }
}
