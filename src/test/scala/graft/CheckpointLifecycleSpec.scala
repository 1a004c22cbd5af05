package graft

import org.apache.spark.sql.DataFrame

import graft.queries.{Llm, Nested}

/** Pins the r14 checkpoint-lifecycle contract (VERDICT r13 item 3): the
  * iterative queries (g4/g7/g8/l17) release each superseded
  * `localCheckpoint`'s cached blocks as soon as the next one eagerly
  * materializes, instead of parking every round's frontier/edge copy in
  * the BlockManager until the ContextCleaner's GC race collects it. The
  * r13 sf10 record measured the accumulation as 57.8 → 94.9 s of
  * within-JVM sample drift for g7; in a long-lived 100 TB session it is a
  * storage leak proportional to rounds × runs.
  *
  * Contract tested here: after a query's result is materialized, the
  * number of PERSISTED RDDs in the context may have grown by at most ONE
  * (the query's final checkpoint — still live because the caller owns the
  * returned frame; only the ContextCleaner may reap it). Intermediates
  * (per-round frontiers, the edge set, per-cadence rank snapshots) must
  * all be gone. Correctness of the unpersist sites themselves (a released
  * block is never re-read) is covered by the existing oracle matches and
  * GraphDepthSpec — a mis-scoped unpersist fails those loudly with
  * block-not-found, never silently.
  */
class CheckpointLifecycleSpec extends SparkSpec {

  /** Persisted-RDD ids currently registered with the context. */
  private def persisted: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def newlyPersisted(body: => DataFrame): Set[Int] = {
    val before = persisted
    materialize(body)
    persisted -- before
  }

  test("g7 BFS: per-round frontiers and the edge set are released") {
    // 3 rounds + edge build = 4 checkpoints per run; only the final
    // frontier may remain
    assert(newlyPersisted(Nested.g7BfsReachability(spark, sfDir)).size <= 1)
  }

  test("g4 pageRank (deep, 12 rounds): cadence snapshots and edges released") {
    // 12 rounds = edge build + two interior cadence checkpoints + final:
    // everything but the final ranks must be gone
    assert(newlyPersisted(Nested.pageRank(spark, sfDir, rounds = 12)).size <= 1)
  }

  test("g8 star contraction: superseded edge sets are released per round") {
    assert(newlyPersisted(Nested.g8ConnectedComponents(spark, sfDir)).size <= 1)
  }

  test("l17 min-label propagation: per-round labels and edges released") {
    assert(newlyPersisted(Llm.l17DedupClusters(spark, sfDir)).size <= 1)
  }

  test("repeated g7 runs do not accumulate persisted state (the sf10 drift)") {
    val before = persisted
    (1 to 3).foreach(_ => materialize(Nested.g7BfsReachability(spark, sfDir)))
    // one still-referenced final frontier per run at the very most; the
    // 3-round × 3-run = 12-checkpoint pile-up of the old behavior fails
    assert((persisted -- before).size <= 3)
  }
}
