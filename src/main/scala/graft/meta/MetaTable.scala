package graft.meta

import graft.model.{TableMeta, VariableMeta}
import graft.ops.TableOps
import org.apache.spark.sql.{Column, DataFrame}

/** Metadata-carrying table — the Spark re-expression of the reference's
  * `Table` (pandas DF + per-column VariableMeta,
  * /root/reference/lib/catalog/owid/catalog/core/tables.py:50-89) and its
  * propagation rules:
  *
  *  - select/filter/rename keep each surviving column's metadata
  *    (tables.py `_metadata` propagation, :89);
  *  - merge/concat combine the two sides' metadata per shared column —
  *    equal fields are kept, conflicting fields are dropped
  *    (`combine_indicators_metadata`, core/indicators.py:795; concat
  *    tables.py:2192-2263);
  *  - derived columns start with empty metadata unless supplied
  *    (indicators.py arithmetic :278-405 — binary ops combine operands);
  *  - every op appends to the processing log (meta.py processing_log).
  *
  * The DataFrame stays the single source of truth for data; metadata rides
  * alongside (the sidecar model, not StructField.metadata, because Catalyst
  * drops custom metadata through many operators — same reason the
  * reference keeps `.meta.json` sidecars).
  */
final case class MetaTable(df: DataFrame, meta: TableMeta) {

  private def fields = meta.fields

  def select(cols: String*): MetaTable =
    MetaTable(
      df.select(cols.map(df.col): _*),
      meta.copy(fields = fields.view.filterKeys(cols.contains).toMap))

  def filter(cond: Column): MetaTable = copy(df = df.filter(cond))

  def withColumnRenamed(from: String, to: String): MetaTable =
    MetaTable(
      df.withColumnRenamed(from, to),
      meta.copy(
        primaryKey = meta.primaryKey.map(k => if (k == from) to else k),
        fields = fields.map { case (k, v) => (if (k == from) to else k) -> v }))

  /** Derived column: empty metadata unless given (indicator arithmetic
    * starts fresh; callers pass combined metadata when meaningful). */
  def withColumn(name: String, c: Column,
      vm: VariableMeta = VariableMeta()): MetaTable =
    MetaTable(df.withColumn(name, c), meta.copy(fields = fields + (name -> vm)))

  def underscore(): MetaTable = {
    val renames = df.columns.map(c => c -> graft.ops.Names.underscore(c))
    MetaTable(
      renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) },
      meta.copy(
        primaryKey = meta.primaryKey.map(graft.ops.Names.underscore(_)),
        fields = fields.map { case (k, v) => graft.ops.Names.underscore(k) -> v }))
  }

  def logStep(step: String): MetaTable = {
    val stamped = fields.map { case (k, v) =>
      k -> v.copy(processingLog = v.processingLog :+ step)
    }
    copy(meta = meta.copy(fields = stamped))
  }

  /** pandas-semantics merge with per-column metadata combination. */
  def merge(other: MetaTable, how: String = "inner",
      on: Seq[String] = Nil): MetaTable = {
    val joined = TableOps.merge(df, other.df, how, on)
    MetaTable(joined, meta.copy(
      fields = MetaTable.combineFields(fields, other.fields)
        .view.filterKeys(joined.columns.contains).toMap))
  }

  /** Vertical concat: schema union + per-shared-column metadata combine. */
  def concat(other: MetaTable): MetaTable =
    MetaTable(
      TableOps.concat(Seq(df, other.df)),
      meta.copy(fields = MetaTable.combineFields(fields, other.fields)))

  /** Column arithmetic with AUTOMATIC metadata combination — indicator
    * arithmetic (indicators.py:278-405 + combine_indicators_metadata
    * :795-880): `out = a <op> b` where each field keeps the unique non-null
    * value across operands, except division ("/" and "//"), which never
    * inherits a field the numerator lacks (indicators.py:570-575 — energy ÷
    * population must not get population's description). The processing log
    * records the operation. */
  def binaryOp(name: String, a: String, b: String, op: String): MetaTable = {
    val expr: Column = op match {
      case "+" => df.col(a) + df.col(b)
      case "-" => df.col(a) - df.col(b)
      case "*" => df.col(a) * df.col(b)
      case "/" => df.col(a) / org.apache.spark.sql.functions.nullif(
        df.col(b), org.apache.spark.sql.functions.lit(0))
      case "//" => org.apache.spark.sql.functions.floor(
        df.col(a) / org.apache.spark.sql.functions.nullif(
          df.col(b), org.apache.spark.sql.functions.lit(0)))
      case "%" => df.col(a) % df.col(b)
      case other => throw new IllegalArgumentException(s"binaryOp: $other")
    }
    val vm = MetaTable
      .combineVariableOp(
        fields.getOrElse(a, VariableMeta()),
        fields.getOrElse(b, VariableMeta()), op)
    withColumn(name, expr,
      vm.copy(processingLog = vm.processingLog :+ s"$name = $a $op $b"))
  }
}

object MetaTable {

  /** Field-wise metadata combination: agreeing values survive, conflicts
    * are dropped (combine_indicators_metadata semantics) — columns present
    * on only one side keep their metadata. */
  def combineFields(
      a: Map[String, VariableMeta],
      b: Map[String, VariableMeta]
  ): Map[String, VariableMeta] = {
    val shared = a.keySet & b.keySet
    val combined = shared.map { k =>
      k -> combineVariable(a(k), b(k))
    }.toMap
    (a -- shared) ++ (b -- shared) ++ combined
  }

  def combineVariable(x: VariableMeta, y: VariableMeta): VariableMeta =
    combineVariableOp(x, y, "+")

  /** Operation-aware field combination
    * (`_get_metadata_value_from_indicators_if_all_identical`,
    * indicators.py:564-595): a field keeps the UNIQUE non-null value across
    * operands (one side None + other set → kept; two different values →
    * dropped). Division ("/", "//") additionally never inherits a field the
    * numerator lacks (indicators.py:570-575). */
  def combineVariableOp(x: VariableMeta, y: VariableMeta, op: String): VariableMeta = {
    val division = op == "/" || op == "//"
    def keep[T](a: Option[T], b: Option[T]): Option[T] =
      if (division && a.isEmpty) None
      else (a, b) match {
        case (Some(av), Some(bv)) => if (av == bv) a else None
        case (Some(_), None)      => a
        case (None, bv)           => bv
        case _                    => None
      }
    VariableMeta(
      title = keep(x.title, y.title),
      unit = keep(x.unit, y.unit),
      shortUnit = keep(x.shortUnit, y.shortUnit),
      description = keep(x.description, y.description),
      display =
        // drop-on-conflict for ALL ops (two different non-empty displays →
        // None); division's special case ONLY forces None when the
        // numerator's value is missing (indicators.py:570-575, 564-600)
        if (x.display == y.display) x.display
        else if (division && x.display.isEmpty) Map.empty
        else if (x.display.isEmpty) y.display
        else if (y.display.isEmpty) x.display
        else Map.empty,
      processingLog = (x.processingLog ++ y.processingLog).distinct)
  }
}
