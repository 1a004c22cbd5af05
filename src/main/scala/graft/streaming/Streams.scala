package graft.streaming

import graft.Engine
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Per-user running (count, max) via the NEW arbitrary-state API
  * (`transformWithState`, Spark 4): typed ValueState slots replace
  * mapGroupsWithState's single state object — independently evolvable,
  * TTL-capable, and backed by the RocksDB state store. Emits the
  * cumulative totals for each key seen in a batch (update semantics). */
class CountMaxProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}

  @transient private var count: ValueState[Long] = _
  @transient private var maxV: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    count = getHandle.getValueState[Long]("count",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    maxV = getHandle.getValueState[Double]("maxv",
      org.apache.spark.sql.Encoders.scalaDouble, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Double)] = {
    var c = if (count.exists()) count.get() else 0L
    var m = if (maxV.exists()) maxV.get() else Double.NegativeInfinity
    rows.foreach { case (_, v) => c += 1; if (v > m) m = v }
    count.update(c)
    maxV.update(m)
    Iterator.single((key, c, m))
  }
}

/** Bounded-state streaming heavy hitters: Misra-Gries with capacity `k`
  * PER SHARD, held in a typed `MapState` on the RocksDB store. The scale
  * contract this demonstrates is the one that matters on an unbounded
  * stream: state NEVER grows with the key space — at most k counters per
  * shard survive, however many distinct items flow through. Classic MG
  * update per item: increment if tracked, insert if a slot is free, else
  * decrement every counter (evicting zeros). Counters therefore
  * UNDERestimate by at most n_shard/(k+1) — shard sketches merge by
  * summing, preserving the bound (asserted in StreamingSpec); every item
  * with true frequency above the bound is guaranteed to survive. Emits
  * the shard's full sketch each batch (update semantics — the final
  * batch's emission IS the final sketch). */
class MisraGriesProcessor(k: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{MapState, OutputMode, TimeMode, TTLConfig}

  @transient private var sketch: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    sketch = getHandle.getMapState[Long, Long]("mg",
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    // State-store discipline: the sketch is loaded into a (bounded, ≤ k
    // entries) heap map ONCE, every row of the batch is applied in memory,
    // and the store sees exactly one clear + ≤ k puts at the end. The
    // naive formulation (a containsKey/getValue/updateValue round-trip per
    // ROW) costs a RocksDB call per event and turned a 1.5 s stream into
    // 35 s at sf0.1 — per-batch state I/O must be O(k), never O(rows).
    val local = scala.collection.mutable.HashMap.empty[Long, Long]
    sketch.iterator().foreach { case (it, c) => local(it) = c }
    rows.foreach { case (_, item) =>
      local.get(item) match {
        case Some(c) => local(item) = c + 1L
        case None if local.size < k => local(item) = 1L
        case None =>
          // decrement-all admission: k+1 distinct items each give up one
          // count; zeroed counters free their slot
          local.keysIterator.toArray.foreach { it =>
            val c = local(it)
            if (c <= 1L) local.remove(it) else local(it) = c - 1L
          }
      }
    }
    sketch.clear()
    local.foreach { case (it, c) => sketch.updateValue(it, c) }
    local.toList.map { case (it, c) => (key, it, c) }.iterator
  }
}

/** Structured Streaming harness (SURVEY §2.9): the reference is a
  * checkpointed micro-batch stream over the date axis
  * (main.yml:70-95 + scraper_state.json) — here expressed as real
  * `readStream` pipelines run to completion with Trigger.AvailableNow so
  * results are deterministic and oracle-checkable.
  */
object Streams {

  private val stagedCache = new java.util.concurrent.ConcurrentHashMap[(String, Int), String]()

  /** Stage the events table as `n` parquet files so maxFilesPerTrigger can
    * drive a deterministic number of micro-batches (the per-day batch
    * pacing of main.yml:77-95). Staged once per (source, n) per JVM — the
    * streaming queries share the copy instead of re-writing it. */
  def stageEvents(spark: SparkSession, dir: String, n: Int): String =
    stagedCache.computeIfAbsent((dir, n), { _ =>
      val out = java.nio.file.Files.createTempDirectory("events_staged").toString
      Engine.events(spark, dir).repartition(n)
        .write.mode(SaveMode.Overwrite).parquet(out)
      out
    })

  def eventsSchema(spark: SparkSession, dir: String): StructType =
    Engine.events(spark, dir).schema

  /** Streaming source over the staged events files. */
  def eventsStream(spark: SparkSession, staged: String, schema: StructType,
      maxFilesPerTrigger: Int): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)

  /** Run `f` with the session's shuffle-partition count overridden, then
    * restore. Stateful streaming queries fix their state-partition count at
    * the first checkpoint, and every partition is a state-store instance
    * with per-batch commit overhead — so state-heavy operators should size
    * this to key cardinality/data volume rather than inherit the batch
    * default (tiny fixtures → fewer, a 100 TB deployment → more; either
    * way an explicit choice, which is the point). */
  /** State-partition count for a stateful streaming query: `default` is
    * the committed fixture-scale MEASURED optimum (each query documents its
    * own sweep), `SPARK_GRAFT_STATE_PARTS` overrides it for sweeps and for
    * production-sized key spaces where the commit-cost/parallelism tradeoff
    * flips — the r20 optimization-round knob that keeps the scale-dependent
    * setting parameterised instead of hard-coded to either environment. */
  def stateParts(default: Int): Int =
    sys.env.get("SPARK_GRAFT_STATE_PARTS").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).filter(_ > 0).getOrElse(default)

  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** Run a streaming aggregation to completion, materializing each complete
    * snapshot to parquet via foreachBatch (last batch wins = final state).
    * Unlike a memory sink this never buffers results on the driver — the
    * write is a distributed parquet job, so the pattern holds when the
    * aggregate itself is large. Returns the sink path. */
  def runCompleteToParquet(agg: DataFrame, ckName: String): String =
    runCompleteToParquetCk(agg, ckName)._1

  /** Like [[runCompleteToParquet]] but also returns the checkpoint dir, for
    * callers that inspect the retained state afterwards (state source). */
  def runCompleteToParquetCk(agg: DataFrame, ckName: String): (String, String) = {
    val out = java.nio.file.Files.createTempDirectory(s"${ckName}_sink").toString
    val ck = java.nio.file.Files.createTempDirectory(s"ck_$ckName").toString
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode(SaveMode.Overwrite).parquet(out)
      }
      .start()
    q.awaitTermination()
    (out, ck)
  }
}
