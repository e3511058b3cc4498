package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Sign-bit LSH bucket id over `planes` fixed hyperplanes — the bucketing
  * scalar of the ANN scale path (Ann.lshTopK).
  *
  * The declarative spelling ran, PER ROW and PER PLANE,
  * `aggregate(zip_with(vec, sequence(0, dim−1), (x, j) => x *
  * sign(xxhash64(j, p))), 0.0, _+_)` — an interpreted HOF fold that
  * allocates a sequence array and a product array per plane and, worst of
  * all, re-evaluates `xxhash64(j, p)` for every (element × plane) of every
  * row even though both arguments are constants of the plan. This
  * expression precomputes the ±1 sign table ONCE at construction (the
  * exact same hash chain: XXH64.hashInt(p, XXH64.hashInt(j, 42))) and
  * fuses all planes into one pass over the vector — no allocations, no
  * hashing, real codegen.
  *
  * Semantics mirror the HOF spelling bit-for-bit: per-plane projection is
  * the same left-to-right double fold; a null vector or a vector whose
  * length differs from `dim` yields bucket 0 (the old zip_with null-padding
  * collapsed every plane's fold to null, and `when(null > 0).otherwise(0)`
  * summed to 0).
  */
case class LshBucketExpr(child: Expression, dim: Int, planes: Int)
    extends UnaryExpression {

  require(dim >= 1 && planes >= 1 && planes <= 30,
    s"bad lsh params: dim=$dim planes=$planes")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val signs: Array[Array[Double]] =
    LshBucketOps.signTable(dim, planes)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else LshBucketOps.compute(v.asInstanceOf[ArrayData], signs, isFloat)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val signsRef = ctx.addReferenceObj("signs", signs, "double[][]")
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.LshBucketOps.compute(
            ${c.value}, $signsRef, $isFloat);
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)

  override def prettyName: String = "lsh_bucket"
}

object LshBucketOps {
  /** signs(p)(j) = +1 iff pmod(xxhash64(j, p), 2) == 0, with the exact
    * chain Spark's two-arg xxhash64 uses on int inputs:
    * hashInt(p, hashInt(j, 42)). */
  def signTable(dim: Int, planes: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, j) =>
      val h = XXH64.hashInt(p, XXH64.hashInt(j, 42L))
      if (((h % 2) + 2) % 2 == 0) 1.0 else -1.0
    }

  def compute(a: ArrayData, signs: Array[Array[Double]],
      isFloat: Boolean): Int = {
    val planes = signs.length
    val dim = signs(0).length
    if (a.numElements() != dim) return 0
    val proj = new Array[Double](planes)
    var j = 0
    while (j < dim) {
      if (a.isNullAt(j)) return 0 // old spelling: null element nulls every fold
      val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      var p = 0
      while (p < planes) { proj(p) += x * signs(p)(j); p += 1 }
      j += 1
    }
    var bucket = 0
    var p = 0
    while (p < planes) { if (proj(p) > 0) bucket |= 1 << p; p += 1 }
    bucket
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_bucket")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "lsh_bucket",
        exprs => LshBucketExpr(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue()),
        "built-in")
  }

  /** Column API entry. */
  def lsh_bucket(vec: Column, dim: Int, planes: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("lsh_bucket", vec,
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(planes))
  }
}
