package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent incremental sink (SURVEY S6/J1/O4): append only rows whose key
  * is not already present, mirroring the reference's skip-if-exists probe
  * (/root/reference/src/01-scrape-images.py:181-188 driven at :462-465 and
  * the local-file skip :357-359). Re-running the same batch appends nothing.
  *
  * Scale design: the existence probe is a left-anti join on the key columns
  * only (sink is read key-projected, so the parquet scan prunes to the key
  * columns); the join shuffles at most |incoming| + |sink keys| rows and AQE
  * broadcasts the smaller side. No driver-side collection of keys.
  */
class IncrementalWriter(spark: SparkSession, path: String, keys: Seq[String]) {

  private def sinkExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Append the anti-joined remainder; returns the number of rows written. */
  def append(batch: DataFrame): Long = {
    val fresh =
      if (!sinkExists) batch
      else batch.join(spark.read.parquet(path).select(keys.map(col): _*).distinct(),
        keys, "left_anti")
    // Materialize the remainder once so the count and the write agree.
    val staged = fresh.cache()
    try {
      val n = staged.count()
      if (n > 0) staged.write.mode(SaveMode.Append).parquet(path)
      n
    } finally staged.unpersist()
  }
}

/** Verified write (SURVEY S7/O10): write, read back, and compare content
  * checksums, mirroring the reference's md5 verify-after-upload
  * (/root/reference/src/01-scrape-images.py:99-132, fail at :126-129). */
object VerifiedWriter {

  /** Writes `df` to `path` and returns (written, verified, mismatched) by
    * md5-comparing `contentCol` between source and sink per `keyCol`. */
  def writeVerified(spark: SparkSession, df: DataFrame, path: String,
      keyCol: String, contentCol: String): (Long, Long, Long) = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    val src = df.select(col(keyCol), md5(col(contentCol).cast("binary")).as("md5_src"))
    val snk = spark.read.parquet(path)
      .select(col(keyCol), md5(col(contentCol).cast("binary")).as("md5_sink"))
    val joined = src.join(snk, Seq(keyCol), "full_outer")
      .select(when(col("md5_src") === col("md5_sink"), 1L).otherwise(0L).as("ok"))
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_ok"))
      .head()
    val n = joined.getLong(0)
    val ok = joined.getLong(1)
    (n, ok, n - ok)
  }
}
