package graft

import graft.cdc.{Engine, EventGen, MergeApply}
import graft.lake.{Catalog, LakeTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** spark-submit entry point — the engine's operational CLI (the analogue of
  * `etl run` / `etl reindex`, /root/reference/etl/command.py:164).
  *
  * {{{
  * spark-submit --class graft.Main <jar> gen     --out WAL_DIR --events N --segments K [--seed S]
  * spark-submit --class graft.Main <jar> ingest  --wal WAL_DIR --table DIR --checkpoint CKPT
  *                                               [--mode mor|cow] [--continuous SECONDS]
  *                                               [--buckets B] [--compact-every K] [--salt S]
  * spark-submit --class graft.Main <jar> compact --table DIR [--purge-tombstones]
  * spark-submit --class graft.Main <jar> vacuum  --table DIR
  * spark-submit --class graft.Main <jar> catalog --store DIR
  * spark-submit --class graft.Main <jar> state   --table DIR [--as-of SNAPSHOT]
  * }}}
  */
object Main {

  private def parse(args: Array[String]): (String, Map[String, String]) = {
    require(args.nonEmpty,
      "usage: <gen|ingest|compact|vacuum|catalog|state> [--k v ...]")
    val cmd = args.head
    val opts = args.tail.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
      case Array(k) if k.startsWith("--")    => k.stripPrefix("--") -> "true"
    }.toMap
    (cmd, opts)
  }

  def main(args: Array[String]): Unit = {
    val (cmd, o) = parse(args)
    val spark = SparkSession.builder()
      .appName(s"graft-$cmd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cmd match {
      case "gen" =>
        val cfg = EventGen.Config(
          nEvents = o("events").toLong,
          nUrls = o.getOrElse("urls", (o("events").toLong / 20).max(1000L).toString).toLong,
          seed = o.getOrElse("seed", "42").toLong,
          parallelism = o.getOrElse("parallelism", "64").toInt)
        EventGen.writeWalSegments(spark, cfg, o("out"),
          o.getOrElse("segments", "8").toInt)
        println(s"wrote ${o("events")} events to ${o("out")}")

      case "ingest" =>
        val tableDir = o("table")
        val table = new LakeTable(tableDir)
        if (!table.exists)
          Engine.createPagesTable(tableDir,
            o.getOrElse("buckets", "32").toInt)
        val mode = o.getOrElse("mode", "mor") match {
          case "cow" => MergeApply.CopyOnWrite
          case _     => MergeApply.MergeOnRead
        }
        val trigger = o.get("continuous")
          .map(s => Trigger.ProcessingTime(s"$s seconds"))
          .getOrElse(Trigger.AvailableNow())
        val q = Engine.runStream(spark, o("wal"), o("checkpoint"), table,
          trigger = trigger,
          saltBuckets = o.getOrElse("salt", "0").toInt,
          mode = mode,
          compactEvery = o.getOrElse("compact-every", "8").toInt)
        q.awaitTermination()
        val m = table.metadata
        println(s"ingested: snapshot=${m.currentSnapshotId.getOrElse(-1L)} " +
          s"batches=${m.snapshots.count(_.batchId >= 0)}")

      case "compact" =>
        val id = MergeApply.compact(spark, new LakeTable(o("table")),
          purgeTombstones = o.contains("purge-tombstones"))
        println(id.map(i => s"compacted into snapshot $i").getOrElse("nothing to compact"))

      case "vacuum" =>
        val n = new LakeTable(o("table")).vacuum()
        println(s"vacuum deleted $n unreferenced data files")

      case "catalog" =>
        Catalog.index(spark, o("store")).show(1000, truncate = false)

      case "state" =>
        val table = new LakeTable(o("table"))
        val df = table.read(spark,
          asOfSnapshot = o.get("as-of").map(_.toLong))
        println(s"rows=${df.count()}")
        df.show(20, truncate = 60)

      case other => throw new IllegalArgumentException(s"unknown command: $other")
    }
    spark.stop()
  }
}
