package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per SURVEY §2 row);
  * `oracleSql` carries the DuckDB-equivalent SQL for every query whose
  * semantics are SQL-expressible (the driver hash-compares results).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 minimum slice) on sf=0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.a9MultiAggQ1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Extraction.queries ++
      graft.queries.Sources.queries ++
      graft.queries.Nested.queries ++
      graft.queries.Llm.queries ++
      graft.queries.StreamingQ.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Extraction.oracle ++
      graft.queries.Sources.oracle ++
      graft.queries.Nested.oracle ++
      graft.queries.Llm.oracle ++
      graft.queries.StreamingQ.oracle
}
