package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Verified-ingest metric as a typed Aggregator (SURVEY §2.10 conclusion):
  * mirrors the reference's per-issue bookkeeping — count successes and
  * failures and decide completeness in one pass
  * (/root/reference/src/01-scrape-images.py:456-477: success_count vs
  * len(jp2_urls)). Registered through `functions.udaf`, so it runs as a
  * regular partial+final hash aggregate (mergeable buffer — safe on any
  * partitioning).
  */
object VerifiedIngestAgg {

  case class In(ok: Boolean, bytes: Long)
  case class Buf(nOk: Long, nFail: Long, bytes: Long)
  case class Out(n_ok: Long, n_fail: Long, total_bytes: Long, all_ok: Boolean)

  val agg: Aggregator[In, Buf, Out] = new Aggregator[In, Buf, Out] {
    def zero: Buf = Buf(0L, 0L, 0L)
    def reduce(b: Buf, r: In): Buf =
      Buf(b.nOk + (if (r.ok) 1L else 0L), b.nFail + (if (r.ok) 0L else 1L), b.bytes + r.bytes)
    def merge(a: Buf, b: Buf): Buf = Buf(a.nOk + b.nOk, a.nFail + b.nFail, a.bytes + b.bytes)
    def finish(b: Buf): Out = Out(b.nOk, b.nFail, b.bytes, b.nFail == 0L)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** Column-level entry point: verified_ingest(ok, bytes). */
  val verifiedIngest: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(agg)
}
