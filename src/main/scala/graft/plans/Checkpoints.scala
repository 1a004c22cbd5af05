package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for eager `localCheckpoint` frames in iterative
  * loops (g4/g7/g8/l17).
  *
  * Each eager `localCheckpoint(true)` materializes the frame into
  * BlockManager-cached partitions and truncates lineage; the blocks then
  * live until the ContextCleaner notices the RDD is unreachable — which is
  * GC-timing-dependent, not prompt. In a bounded bench run that shows up
  * as round-over-round drift (the r13 sf10 record disclosed g7 samples
  * moving 57.8 → 94.9 s within one JVM as dead checkpoint blocks and page
  * cache accumulated); in a long-lived 100 TB session it is a real storage
  * leak: every iteration of every graph query parks a full frontier/edge
  * copy in executor memory until some future GC.
  *
  * [[unpersist]] releases a checkpoint's blocks the moment the loop can
  * prove it dead (the NEXT checkpoint has eagerly materialized, so the
  * old one can never be read again). It must ONLY be called on frames
  * that are provably never read after this point: a local checkpoint has
  * no lineage to recompute from, so a later read of an unpersisted one
  * fails loudly (block-not-found), never silently wrong.
  */
object Checkpoints {
  /** Release the cached blocks behind an eagerly-checkpointed frame.
    * No-ops on frames that are not checkpoints (e.g. a loop's round-0
    * seed built from a LocalRelation). Non-blocking: removal proceeds
    * async on the BlockManager, submitting no job — listener-based job
    * pins (GraphDepthSpec) are unaffected. */
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
