package graft

import graft.functions.{ExtractTextExpr, TextExtract}
import org.apache.spark.sql.functions._

/** Native Catalyst expression vs UDF equivalence for the text extractor. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("extract_text native expression ≡ UDF, usable from SQL and Column API") {
    ExtractTextExpr.register(spark)
    val cfg = cdc.EventGen.Config(nEvents = 300, nUrls = 50, seed = 5,
      parallelism = 2)
    val df = cdc.EventGen.events(spark, cfg).toDF

    val both = df.select(
      TextExtract.extract_text(col("html")).as("via_udf"),
      ExtractTextExpr.extract_text_native(col("html")).as("via_expr"),
      col("text"))
    assert(both.filter($"via_udf" =!= $"via_expr").count() == 0)
    assert(both.filter($"via_expr" =!= $"text").count() == 0)

    df.createOrReplaceTempView("pages_expr_test")
    val sqlCount = spark
      .sql("SELECT count(*) FROM pages_expr_test WHERE extract_text(html) = text")
      .as[Long].collect().head
    assert(sqlCount == 300)

    // null-intolerance: null html → null text (prunable by the optimizer)
    val n = spark.sql("SELECT extract_text(CAST(NULL AS BINARY)) AS t")
      .as[Option[String]].collect().head
    assert(n.isEmpty)
  }
}
