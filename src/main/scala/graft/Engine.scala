package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Core harness: session factory + fixture-table loaders (SURVEY §7.1 step 1).
  *
  * Scale design: all loaders return plain parquet scans so Catalyst keeps
  * pushdown/pruning; nothing is cached or collected here. Shuffle partitions
  * are sized by the caller (`Verify`/`Bench` set them from SPARK_GRAFT_CPUS);
  * on a real cluster the same code runs with AQE coalescing partitions.
  */
object Engine {

  /** Local session with the settings every entry point shares. */
  def session(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Timestamp columns stored as parquet TIMESTAMP(NANOS) in the fixtures.
    * Spark has no nanosecond timestamp type, so these are read as raw nano
    * longs (legacy nanosAsLong conf) and losslessly narrowed to microsecond
    * timestamps (the fixture generator emits micro-precision values; checked:
    * zero rows with sub-micro residue at every SF). */
  private val nanoTsCols = Map(
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"),
    "events" -> Seq("ts"))

  /** Parquet scan for one fixture table under `dir` (see TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    nanoTsCols.getOrElse(name, Nil).foldLeft(raw) { (df, c) =>
      if (df.schema.fieldNames.contains(c) && df.schema(c).dataType == LongType)
        df.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else df
    }
  }

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
