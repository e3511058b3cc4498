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

  test("dot_product native expression ≡ HOF fold, codegen'd, null-safe") {
    import graft.operators.Ann
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }.toDF("id", "a", "b")
    // bit-identical to the interpreted HOF fold (same fold order)
    val diff = vecs.select(
        Ann.dot($"a", $"b").as("native"),
        Ann.dotHof($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof")
    assert(diff.count() == 0)
    // cosine built on it matches too
    val c = vecs.select(Ann.cosine($"a", $"b").as("c"))
      .filter($"c" < -1.0 || $"c" > 1.0)
    assert(c.count() == 0)
    // null in → null out
    val n = vecs.select(Ann.dot(lit(null).cast("array<float>"), $"b").as("d"))
      .as[Option[Double]].head()
    assert(n.isEmpty)
    // the plan stays in whole-stage codegen (no CodegenFallback wrapper);
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // projection at plan time
    val q = vecs.repartition(2).select(Ann.dot($"a", $"b"))
    q.collect() // finalize the adaptive plan
    // "*(n)" prefixes mark whole-stage-codegen stages; the projection with
    // dot_product must carry one (a CodegenFallback expr would strip it)
    assert(q.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("*(") && l.contains("dot_product")))
  }
}
