package graft

import org.apache.spark.sql.functions._

import graft.functions.{MinhashSigExpr, Text}

/** Equivalence and safety for the fused MinHash signature expression. */
class MinhashExprSpec extends SparkSpec {
  import spark.implicits._

  test("native signature equals the composed explode+groupBy signature per doc") {
    val docs = Engine.documents(spark, sfDir).select($"doc_id", $"text")
    val hs = (1 to 6).map(i =>
      min(substring($"d", 1 + (i - 1) * 5, 5)).as(s"h$i"))
    val composed = docs
      .select($"doc_id", explode(Text.shingles($"text", 3)).as("shingle"))
      .withColumn("d", md5($"shingle".cast("binary")))
      .groupBy($"doc_id")
      .agg(hs.head, hs.tail: _*)
      .as[(Long, String, String, String, String, String, String)]
      .collect().map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6, r._7)).toMap
    val native = docs
      .select($"doc_id", MinhashSigExpr.minhashSigNative(spark, $"text").as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[String])].collect().toMap
    assert(native.nonEmpty && native.keySet == composed.keySet)
    native.foreach { case (id, sig) =>
      assert(sig == composed(id), s"doc $id: $sig vs ${composed(id)}")
    }
  }

  test("short texts yield null, matching the composed pipeline's absence") {
    val rows = Seq((1L, "only two"), (2L, "a b c"), (3L, ""))
      .toDF("id", "text")
      .select($"id", MinhashSigExpr.minhashSigNative(spark, $"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L), "2 tokens -> no shingle -> null")
    assert(!rows(2L), "3 tokens -> exactly one shingle")
    assert(rows(3L), "empty text is one empty token -> null")
  }

  test("SQL arity misuse fails with a comprehensible error") {
    MinhashSigExpr.minhashSigNative(spark, lit("warm up registry")): Unit
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig_native()").collect()
    }
    assert(e.getMessage.contains("exactly 1 argument"), e.getMessage)
  }
}
