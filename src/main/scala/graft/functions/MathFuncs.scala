package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric display/compare scalar functions from the reference's
  * data-helpers (/root/reference/etl/data_helpers/misc.py:439-830), as pure
  * Column algebra (codegen'd). */
object MathFuncs {

  /** Bounded adjusted relative deviation |a−b| / (|a|+|b|+eps) —
    * `bard` (misc.py:439-483); the tolerance metric of the reference's
    * table-compare harness. */
  def bard(a: Column, b: Column, eps: Double = 1e-12): Column =
    abs(a - b) / (abs(a) + abs(b) + lit(eps))

  /** 10^floor(log10(x)) for x>0 — `round_to_nearest_power_of_ten`
    * (misc.py:665). */
  def roundToNearestPowerOfTen(x: Column): Column =
    when(x > 0, pow(lit(10.0), floor(log10(x))))

  /** Round to n significant figures — `round_to_sig_figs` (misc.py:699). */
  def roundToSigFigs(x: Column, n: Int): Column = {
    val magnitude = floor(log10(abs(x))) - (n - 1)
    when(x === 0, lit(0.0))
      .otherwise(round(x / pow(lit(10.0), magnitude)) * pow(lit(10.0), magnitude))
  }

  /** Driver-side humanize (display only) — `humanize_number` (misc.py:809). */
  def humanize(x: Double): String = {
    val units = Seq((1e12, "trillion"), (1e9, "billion"), (1e6, "million"))
    units.find { case (m, _) => math.abs(x) >= m } match {
      case Some((m, u)) => f"${x / m}%.1f $u"
      case None         => f"$x%,.0f"
    }
  }
}
