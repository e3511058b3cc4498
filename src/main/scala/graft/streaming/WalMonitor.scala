package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** WAL/binlog contiguity monitor — custom keyed state over the change-event
  * stream (`flatMapGroupsWithState`, the KeyValueGroupedDataset custom-state
  * surface of SURVEY §2.10).
  *
  * A binlog tail promises LSN-contiguous delivery per shard; this operator
  * verifies it incrementally: per shard it keeps ONE long of state (the
  * highest LSN seen) and per micro-batch emits
  *  - `gap`   — LSNs skipped between batches or inside a batch,
  *  - `late`  — events at or below the shard's high watermark (out of order
  *    across batches; the merge tolerates them via tombstone/LWW, but the
  *    tail should know),
  * so gaps surface at ingest time instead of as silent missing rows. State
  * is O(shards), never O(events) — bounded forever.
  */
object WalMonitor {

  final case class ShardState(highest: Long)
  final case class GapReport(shard: String, kind: String, from: Long, to: Long, n: Long)

  private def report(
      shard: String,
      lsns: Iterator[Long],
      state: GroupState[ShardState]
  ): Iterator[GapReport] = {
    // Heap bound: one shard's LSNs for ONE micro-batch are materialized and
    // sorted on one task (contiguity needs total order). The working set is
    // 8 bytes × events-per-shard-per-batch — at 1M events/batch over ≥32
    // shards that is ≤ ~256 KB/task; size micro-batches (maxFilesPerTrigger)
    // so the hottest shard's slice stays executor-heap-friendly. State
    // carried across batches stays one long per shard.
    val sorted = lsns.toArray.sorted
    if (sorted.isEmpty) return Iterator.empty
    val prior = state.getOption.map(_.highest).getOrElse(Long.MinValue)
    val out = scala.collection.mutable.ArrayBuffer.empty[GapReport]
    val late = sorted.takeWhile(_ <= prior)
    if (late.nonEmpty)
      out += GapReport(shard, "late", late.head, late.last, late.length.toLong)
    val fresh = sorted.dropWhile(_ <= prior)
    if (fresh.nonEmpty) {
      if (prior != Long.MinValue && fresh.head > prior + 1)
        out += GapReport(shard, "gap", prior + 1, fresh.head - 1,
          fresh.head - prior - 1)
      fresh.sliding(2).foreach {
        case Array(a, b) if b > a + 1 =>
          out += GapReport(shard, "gap", a + 1, b - 1, b - a - 1)
        case _ => ()
      }
      state.update(ShardState(fresh.last))
    }
    out.iterator
  }

  /** Monitor a (possibly streaming) change-event frame. `shardCol` is the
    * delivery-ordering unit (a binlog shard / WAL segment id); state is one
    * long per shard. Works on batch frames too (state starts empty). */
  def detectGaps(events: DataFrame, shardCol: String): Dataset[GapReport] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(shardCol).cast("string").as("shard"), col("lsn").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: String, rows: Iterator[(String, Long)], state: GroupState[ShardState]) =>
          report(shard, rows.map(_._2), state)
      }
  }
}
