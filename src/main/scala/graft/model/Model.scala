package graft.model

import java.sql.Timestamp

/** Core typed model of the CDC engine (SURVEY.md §7.1 module `model`).
  *
  * Shapes are fixed by BASELINE.json `input_hint`:
  * pages(url string, warc_ts timestamp, html binary, text string, lang string).
  *
  * Reference semantics: owid/etl models ingest as md5-pinned Snapshot files
  * (/root/reference/etl/snapshot.py:169) flowing through a step DAG into
  * checksummed datasets (/root/reference/etl/steps/__init__.py:565-599). We
  * lift that into an LSN-ordered change-event log applied to a lake table.
  */
object Op {
  val Insert = "I"
  val Update = "U"
  val Delete = "D"
}

/** One WAL/binlog entry. `lsn` is globally unique and totally ordered. */
final case class ChangeEvent(
    lsn: Long,
    op: String, // "I" | "U" | "D"
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A row of the target lake table (final state per url). `_lsn` is the
  * LSN of the event that produced the row — the cross-batch last-writer-wins
  * guard (analogue of Iceberg sequence numbers / the reference's
  * checksum-gated upsert, /root/reference/etl/grapher/to_db.py:209-220).
  */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String,
    _lsn: Long
)

/** Column-level metadata, the behavior-relevant subset of the reference's
  * VariableMeta (/root/reference/lib/catalog/owid/catalog/core/meta.py:440).
  */
final case class VariableMeta(
    title: Option[String] = None,
    unit: Option[String] = None,
    shortUnit: Option[String] = None,
    description: Option[String] = None,
    display: Map[String, String] = Map.empty, // grapher display dict (meta.py:470): zeroDay, timeInterval, …
    processingLog: List[String] = Nil
)

/** Table-level metadata, subset of the reference's TableMeta
  * (/root/reference/lib/catalog/owid/catalog/core/meta.py:621):
  * primary key + per-column metadata, persisted as a sidecar like the
  * reference's `.meta.json` (tables.py:185-221).
  */
final case class TableMeta(
    shortName: String,
    title: Option[String] = None,
    primaryKey: Seq[String] = Nil,
    fields: Map[String, VariableMeta] = Map.empty,
    // the reference's DatasetMeta.is_public (meta.py): private-step outputs
    // are stamped non-public and must never be depended on by public steps
    isPublic: Boolean = true
)
