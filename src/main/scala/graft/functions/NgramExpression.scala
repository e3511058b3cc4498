package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingles — the scan-stage hot loop of the
  * dedup family (Dedup.shingles feeds jaccard, minhash, LSH).
  *
  * The declarative spelling (split + transform over an index sequence +
  * array_distinct) runs interpreted (HOFs are CodegenFallback) and
  * re-evaluates sub-expressions per element; this expression makes ONE pass:
  * split on single spaces, slide an n-window, dedup through a hash set —
  * no intermediate arrays, no per-element expression trees. Byte-compatible
  * with the oracle's string_split + positional concat (single-space
  * separator, empty tokens preserved — exactly java.lang.String.split
  * semantics the HOF form had via functions.split).
  */
case class WordNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"ngram size must be >= 1, got $n")

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    // functions.split(col, " ") is StringSplit with limit -1: empty tokens
    // (incl. trailing) are KEPT — mirror exactly so results match the HOF
    // form and the DuckDB string_split oracle bit-for-bit
    val toks = text.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): WordNgramsExpr =
    copy(child = c)

  override def prettyName: String = "word_ngrams"
}

object NgramExpression {
  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "word_ngrams",
        exprs => WordNgramsExpr(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue()),
        "built-in")
  }

  def word_ngrams(text: Column, n: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    org.apache.spark.sql.functions.call_function(
      "word_ngrams", text, org.apache.spark.sql.functions.lit(n))
  }
}
