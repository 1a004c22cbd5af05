package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator — the whole-operator rung of
  * the extension ladder (custom LogicalPlan + Strategy + SparkPlan via
  * SparkSessionExtensions), used where composition genuinely can't reach:
  * the window formulation (`rank() OVER (PARTITION BY k ORDER BY o) <= n`)
  * must SORT every group's full row set inside each shuffle partition
  * before it can rank, buffering rows proportional to partition size. At
  * 100 TB that sort is the cost; top-k needs none of it.
  *
  * Two-phase plan, because top-k is a semigroup (top-k of a union = top-k
  * over the per-part top-ks): a PARTIAL pass runs before the exchange and
  * keeps a local k-buffer per key, so at most mappers × keys × k rows ever
  * cross the wire — the map-side-combine shape hash aggregation gets for
  * free; the FINAL pass after the single hash exchange merges survivors in
  * O(n log k). Neither phase sorts anything (plan test pins no SortExec,
  * one Exchange).
  *
  * Memory posture: the partial phase caps its hash state at
  * [[TopKPerKeyExec.PartialKeyCap]] distinct keys — past the cap, rows of
  * unseen keys PASS THROUGH unfiltered (never wrong, never OOM: the final
  * phase re-filters), the same degrade-don't-die contract as hash
  * aggregation's spill fallback. Overflow rows are STREAMED to the parent
  * as they arrive (like FilterExec — no copy, no buffering), so partial
  * heap state is the only memory the phase ever holds even when every key
  * overflows. The final phase holds the exact keys-in-partition × k state
  * any grouped aggregate holds; cardinality beyond that is sized with
  * `spark.sql.shuffle.partitions` like every keyed agg.
  *
  * Determinism contract: callers must pass a TOTAL ordering (tie columns
  * down to a unique key), same as they must for the window formulation to
  * be oracle-stable. */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** User API: top `k` rows per `keys` group under `order`. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val plan = df.queryExecution.analyzed
    val keyExprs = keys.map(c => GraftBridge.expression(spark, c))
    val sortExprs = order.map { c =>
      GraftBridge.expression(spark, c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    GraftBridge.ofRows(spark, TopKPerKey(keyExprs, sortExprs, k, plan))
  }
}

/** Physical operator: one bounded k-buffer per key.
  * `partial = true` is the pre-exchange combine (bounded key state,
  * overflow keys pass through); `partial = false` is the exact post-
  * exchange merge. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  // the final phase's ONLY requirement is co-location of each key: one
  // hash exchange, no child ordering — the point of the operator is that
  // no sort exists. The partial phase runs wherever the data already is.
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      // codegen'd row comparator for the SortOrder set: cmp(a,b) < 0
      // means `a` sorts before `b`, i.e. `a` ranks higher
      val cmp = new LazilyGeneratedOrdering(order, childOutput)
      val buffers = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      // heap keeps the WORST retained row on top (reverse of the sort
      // order), so replacing the head maintains the best k
      val heapOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = cmp.compare(b, a)
      }
      // Overflow rows past the key cap are EMITTED IMMEDIATELY (no copy,
      // no buffering — the parent is either the shuffle writer, which
      // serializes each row before pulling the next, or the final phase,
      // which copies on retention; same streaming contract as FilterExec).
      // Rows absorbed into a heap produce nothing now; the retained
      // k-per-key survivors drain lazily after the input is exhausted.
      val streamed: Iterator[UnsafeRow] = iter.flatMap { r =>
        val row = r.asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = buffers.get(key)
        if (heap == null) {
          if (isPartial && buffers.size >= TopKPerKeyExec.PartialKeyCap) {
            // degrade, don't die: past the key cap the partial stops
            // filtering NEW keys — their rows flow to the exact final
            // phase unfiltered (cap bounds heap state; correctness is
            // unaffected because the final phase re-filters everything)
            Iterator.single(row)
          } else {
            heap = new java.util.PriorityQueue[UnsafeRow](k, heapOrd)
            buffers.put(key.copy(), heap)
            heap.add(row.copy())
            Iterator.empty
          }
        } else if (heap.size < k) { heap.add(row.copy()); Iterator.empty }
        else if (cmp.compare(row, heap.peek()) < 0) {
          // `row` sorts before the current worst retained row -> keep it
          heap.poll()
          heap.add(row.copy())
          Iterator.empty
        } else Iterator.empty
      }
      def drainHeaps(): Iterator[UnsafeRow] = {
        val out = new scala.collection.mutable.ArrayBuffer[UnsafeRow]()
        buffers.forEach { (_, heap) =>
          val rows = new Array[UnsafeRow](heap.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 }
          out ++= rows
        }
        out.iterator
      }
      // Iterator.++ takes its argument by name: the heaps drain only after
      // every input row has been seen (required — a heap row can be
      // evicted by a later, better row).
      streamed ++ drainHeaps()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Max distinct keys the PARTIAL phase buffers per task before new keys
    * pass through unfiltered. 16k keys × k rows is a few MB of heap at
    * typical widths — the same order as a map-side combine buffer. */
  val PartialKeyCap: Int = 1 << 14
}

/** Planner strategy: final merge over a pre-exchange partial combine —
  * EnsureRequirements inserts the one hash exchange between them. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
