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

  def combineVariable(x: VariableMeta, y: VariableMeta): VariableMeta = {
    def keep[T](a: Option[T], b: Option[T]): Option[T] =
      if (a == b) a else None
    VariableMeta(
      title = keep(x.title, y.title),
      unit = keep(x.unit, y.unit),
      shortUnit = keep(x.shortUnit, y.shortUnit),
      description = keep(x.description, y.description),
      processingLog = (x.processingLog ++ y.processingLog).distinct)
  }
}
