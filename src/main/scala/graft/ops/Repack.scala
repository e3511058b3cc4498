package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-dtype shrinking before write — Spark re-expression of owid-repack
  * (`repack_frame` /root/reference/lib/repack/owid/repack/__init__.py:8-151):
  * integers narrow to the smallest signed type that holds the observed range,
  * floats narrow to Float32 when lossless, strings rely on Parquet dictionary
  * encoding (the reference's `category`).
  *
  * One `agg(min,max)` pass computes all bounds (single job), then a cast
  * projection — no per-column scans.
  */
object Repack {

  /** Narrow numeric columns based on an observed min/max/losslessness scan. */
  def repack(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields.collect {
      case StructField(n, LongType | IntegerType | ShortType, _, _) => n
    }
    val floatCols = df.schema.fields.collect {
      case StructField(n, DoubleType, _, _) => n
    }
    if (intCols.isEmpty && floatCols.isEmpty) return df

    val aggs =
      intCols.flatMap(c =>
        Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"))) ++
        floatCols.flatMap(c =>
          Seq(
            // float narrowing is allowed when float32 round-trips losslessly
            // (shrink_float, repack:129) and ints-in-floats become integers
            // when every value is whole (repack:61-98)
            max(when(
              col(c).isNotNull &&
                (col(c) =!= col(c).cast(FloatType).cast(DoubleType)),
              1).otherwise(0)).as(s"${c}__lossy32"),
            max(when(
              col(c).isNotNull && (col(c) =!= round(col(c))),
              1).otherwise(0)).as(s"${c}__frac"),
            min(col(c)).as(s"${c}__min"),
            max(col(c)).as(s"${c}__max")
          ))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    def narrowInt(lo: Long, hi: Long): DataType =
      if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
      else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
      else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
      else LongType

    var out = df
    for (c <- intCols) {
      val loAny = stats.getAs[Any](s"${c}__min")
      if (loAny != null) {
        val lo = loAny match { case l: Long => l; case i: Int => i.toLong; case s: Short => s.toLong }
        val hi = stats.getAs[Any](s"${c}__max") match { case l: Long => l; case i: Int => i.toLong; case s: Short => s.toLong }
        val t = narrowInt(lo, hi)
        if (t != df.schema(c).dataType) out = out.withColumn(c, col(c).cast(t))
      }
    }
    for (c <- floatCols) {
      val frac = stats.getAs[Any](s"${c}__frac")
      val lossy = stats.getAs[Any](s"${c}__lossy32")
      if (frac != null) {
        if (frac == 0) {
          val lo = stats.getAs[Double](s"${c}__min")
          val hi = stats.getAs[Double](s"${c}__max")
          if (lo >= Long.MinValue.toDouble && hi <= Long.MaxValue.toDouble)
            out = out.withColumn(c, col(c).cast(narrowInt(lo.toLong, hi.toLong)))
        } else if (lossy == 0) {
          out = out.withColumn(c, col(c).cast(FloatType))
        }
      }
    }
    out
  }

  /** Read-side widening back to safe compute types — `to_safe_types`
    * (repack:184): narrow ints → long, float32 → double. */
  def toSafeTypes(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case ByteType | ShortType | IntegerType =>
          d.withColumn(f.name, col(f.name).cast(LongType))
        case FloatType => d.withColumn(f.name, col(f.name).cast(DoubleType))
        case _         => d
      }
    }
}
