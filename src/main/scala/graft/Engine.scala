package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core harness: session factory + fixture-table loaders (SURVEY §7.1 step 1).
  *
  * Scale design: all loaders return plain parquet scans so Catalyst keeps
  * pushdown/pruning; nothing is cached or collected here. Shuffle partitions
  * are sized by the caller (`Verify`/`Bench` set them from SPARK_GRAFT_CPUS);
  * on a real cluster the same code runs with AQE coalescing partitions.
  */
object Engine {

  /** Local session with the settings every entry point shares.
    *
    * EXPLICIT SESSION CONTRACT: `spark.sql.legacy.parquet.nanosAsLong=true`
    * is part of this engine's session configuration — every graft session
    * reads parquet TIMESTAMP(NANOS) columns as raw nano longs (the fixture
    * `events.ts` encoding; Spark has no native nanos type). [[table]] and
    * [[eventsBetween]] also set it defensively for sessions built elsewhere.
    * Consequence: any OTHER nano-timestamp parquet column read in a graft
    * session also arrives as a raw long — callers needing timestamps must
    * narrow explicitly (see [[table]]'s `events.ts` handling). */
  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.catalog.kb", classOf[graft.sources.KbCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Parquet scan for one fixture table under `dir` (see TESTDATA.md).
    *
    * Timestamp storage differs per table: lineitem/orders use parquet
    * TIMESTAMP(MILLIS), which Spark reads natively as TIMESTAMP_NTZ —
    * range predicates with [[tsLit]] literals stay cast-free and reach the
    * scan as PushedFilters (asserted in PlanShapeSpec). `events.ts` is
    * TIMESTAMP(NANOS), which Spark has no native type for: it is read as a
    * raw nano long (legacy nanosAsLong conf) and losslessly narrowed to a
    * microsecond timestamp (generator emits micro precision; zero sub-micro
    * residue at every SF). The narrowing is a projection, so event-time
    * range filters do not push to the scan — time pruning for the events
    * table belongs in partition layout (e.g. day-partitioned ingest), which
    * is how the streaming path organizes it anyway. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == org.apache.spark.sql.types.LongType && f.name == "ts" && name == "events")
        df.withColumn(f.name, narrowNanosToTs(f.name))
      else df
    }
  }

  /** The ONE definition of the nanos→micros narrowing for `events.ts` —
    * shared by [[table]] and [[eventsBetween]] so the two paths can never
    * narrow differently. */
  private def narrowNanosToTs(col: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr(s"$col div 1000"))

  /** Events scan with the event-time range predicate pushed to the parquet
    * scan. The nanos→micros narrowing in [[table]] is a projection, so a
    * filter on the narrowed `ts` can never reach the source; this loader
    * instead applies the range to the RAW nano long BEFORE narrowing — a
    * plain long comparison that lands in the scan's PushedFilters
    * (asserted in PlanShapeSpec). At 100 TB this is the difference between
    * a time-pruned read and a full scan, so time-ranged event queries
    * should come through here (or through a day-partitioned layout, see
    * Sources.s5PartitionPrunedRead). Bounds are UTC dates, [start, end). */
  def eventsBetween(spark: SparkSession, dir: String, startDay: String, endDay: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def nanos(day: String): Long =
      java.time.LocalDate.parse(day).atStartOfDay
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.filter(raw("ts") >= nanos(startDay) && raw("ts") < nanos(endDay))
      .withColumn("ts", narrowNanosToTs("ts"))
  }

  /** NTZ timestamp literal for pushdown-friendly comparisons against the
    * fixture timestamp columns. */
  def tsLit(iso: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.lit(iso).cast("timestamp_ntz")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
