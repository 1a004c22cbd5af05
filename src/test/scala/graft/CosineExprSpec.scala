package graft

import graft.functions.{CosineSimilarityExpr, Text}
import org.apache.spark.sql.functions._

/** The native codegen'd cosine must agree bit-for-bit with the
  * higher-order-function formulation (same sequential accumulation). */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the HOF cosine bitwise on fixtures") {
    val emb = Engine.embeddings(spark, sfDir).limit(200)
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("b_emb"))
    val pairs = emb.filter($"vec_id" < 10).crossJoin(broadcast(b))
    val diff = pairs.select(
        Text.cosine($"embedding", $"b_emb").as("hof"),
        CosineSimilarityExpr.cosineNative(spark, $"embedding", $"b_emb").as("native"))
      .filter($"hof" =!= $"native")
    assert(diff.isEmpty, diff.take(3).mkString(","))
  }

  test("native expression survives codegen (no interpreted fallback errors)") {
    val emb = Engine.embeddings(spark, sfDir)
    val out = emb.select(
      CosineSimilarityExpr.cosineNative(spark, $"embedding", $"embedding").as("self"))
    // every self-similarity is exactly 1.0 up to fp rounding
    assert(out.filter(abs($"self" - 1.0) > 1e-12).isEmpty)
  }

  test("sql registration: usable from spark.sql") {
    CosineSimilarityExpr.cosineNative(spark, lit(null), lit(null)) // ensure registered
    Engine.embeddings(spark, sfDir).limit(5).createOrReplaceTempView("emb_tmp")
    val r = spark.sql(
      "SELECT cosine_native(embedding, embedding) AS c FROM emb_tmp").as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("registration reaches a fresh session (no JVM-global once-flag)") {
    val s2 = spark.newSession()
    import s2.implicits._
    val df = s2.createDataset(Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))))
      .toDF("a", "b")
      .select(CosineSimilarityExpr.cosineNative(s2, col("a"), col("b")).as("c"))
    assert(math.abs(df.as[Double].head() - 1.0) < 1e-12)
  }

  test("non-float-array inputs are rejected at analysis time") {
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0))).toDF("a", "b") // array<double>
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(CosineSimilarityExpr.cosineNative(spark, $"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_native"), e.getMessage.take(300))
  }
}
