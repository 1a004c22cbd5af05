package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnaccentExpr

/** Known-answer, null, and fast-path coverage for the native accent
  * stripper (L34). */
class UnaccentExprSpec extends SparkSpec {
  import spark.implicits._

  test("known answers match the unaccent contract") {
    val rows = Seq(
      "café",           // composed é
      "café",     // decomposed e + combining acute — same answer
      "naïve ÑÇ über",  // mixed case, multiple marks
      "ASCII stays",    // fast path
      "")               // empty
      .toDF("s")
      .select(UnaccentExpr.unaccentNative(spark, $"s").as("c"))
      .as[String].collect().toSeq
    assert(rows == Seq("cafe", "cafe", "naive NC uber", "ASCII stays", ""))
  }

  test("null in, null out; non-string input is rejected at analysis") {
    val out = Seq[Option[String]](Some("ña"), None).toDF("s")
      .select(UnaccentExpr.unaccentNative(spark, $"s").as("c"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("na"), None))
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(UnaccentExpr.unaccentNative(spark, $"x")).collect()
    }
    assert(err.getMessage.contains("string"),
      s"expected a type error naming 'string', got: ${err.getMessage}")
  }

  test("pure-ASCII input returns the same UTF8String object (zero-copy)") {
    val in = UTF8String.fromString("plain ascii text")
    assert(UnaccentExpr.unaccent(in) eq in)
    val accented = UTF8String.fromString("piñata")
    assert(UnaccentExpr.unaccent(accented).toString == "pinata")
  }

  test("registered builder rejects wrong arity with a clear message") {
    UnaccentExpr.unaccentNative(spark, lit("x")) // ensure registration
    val err = intercept[Exception] {
      spark.sql("SELECT unaccent_native()").collect()
    }
    assert(err.getMessage.contains("exactly 1 argument"))
  }
}
