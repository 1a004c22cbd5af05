package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, DateAdd, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range}
import org.apache.spark.sql.types.{DateType, IntegerType}

/** `day_spine(start_date, end_date)` — a custom TABLE-VALUED function
  * injected via `SparkSessionExtensions.injectTableFunction`, completing
  * the extension-point ladder (scalar expression, Aggregator/UDAF,
  * optimizer Rule, planner Strategy, catalogs — and now the TVF registry):
  * `SELECT day FROM day_spine(DATE'2024-01-01', DATE'2024-01-31')` yields
  * one row per calendar day, the spine every gap-fill / reconcile query
  * (w8, j4, g3) builds inline today.
  *
  * The builder runs at ANALYSIS time: it folds the two literal bounds and
  * plans a catalyst `Range` (0 to n-1) projected through `date_add` — so
  * the spine is generated DISTRIBUTED and splittable like `spark.range`,
  * never a driver-materialized LocalRelation: a 100-year spine at 100 TB
  * scale costs nothing on the driver (plan-shape test pins the Range
  * node). Non-literal or malformed bounds fail analysis with a
  * descriptive error, matching the engine's loud-failure convention.
  */
object DaySpineTvf {

  val description: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("day_spine"),
    new ExpressionInfo(getClass.getName, "day_spine"),
    (exprs: Seq[Expression]) => build(exprs))

  /** Folds one bound to days-since-epoch (dates are Int-encoded). Under
    * the default ANSI mode a malformed string makes Cast.eval THROW
    * rather than return null, so the cast is wrapped to keep the
    * descriptive day_spine error in both modes. */
  private def evalDateDays(e: Expression, which: String): Int = {
    require(e.foldable, s"day_spine: the $which bound must be a literal, got $e")
    val v =
      try Cast(e, DateType, Some("UTC")).eval()
      catch {
        case ex: Exception => throw new IllegalArgumentException(
          s"day_spine: the $which bound is not a valid date: $e", ex)
      }
    require(v != null, s"day_spine: the $which bound is not a valid date: $e")
    v.asInstanceOf[Int]
  }

  private[graft] def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 2,
      s"day_spine expects exactly (start_date, end_date), got ${exprs.length} arguments")
    val start = evalDateDays(exprs.head, "start")
    val end = evalDateDays(exprs(1), "end")
    require(end >= start, s"day_spine: end bound precedes start bound")
    val range = Range(0L, (end - start + 1).toLong, 1L, None)
    Project(Seq(Alias(
      DateAdd(Literal(start, DateType), Cast(range.output.head, IntegerType)),
      "day")()), range)
  }
}
