package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression form of the HTML→text extractor.
  *
  * Versus the UDF (TextExtract.extract_text): no SQL↔Scala codec boundary —
  * the UTF8String bytes flow straight into the scanner and back, and the
  * expression is visible to Catalyst as deterministic + null-intolerant
  * (prunable, pushable, CSE-eligible). `CodegenFallback` keeps the
  * surrounding stage in whole-stage codegen while this node evaluates via
  * its JVM method (the scanner is a single tight loop; a doGenCode variant
  * would only inline the call).
  */
case class ExtractTextExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // Spark 4: NullIntolerant became an expression property (null in → null
  // out lets the optimizer infer IsNotNull constraints through this node)
  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType || child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_text expects binary or string, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v match {
      case b: Array[Byte] => TextExtract.extractText(b)
      case u: UTF8String  => TextExtract.extractText(u.toString)
      case other          => TextExtract.extractText(other.toString)
    }
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(c: Expression): ExtractTextExpr =
    copy(child = c)

  override def prettyName: String = "extract_text"
}

object ExtractTextExpr {
  /** Register `extract_text` in the session's function registry (usable
    * from SQL and via the Column API). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_text", exprs => ExtractTextExpr(exprs.head), "built-in")

  /** Column API entry (requires register() once per session). */
  def extract_text_native(c: Column): Column = call_function("extract_text", c)
}
