package graft

import graft.cdc._
import graft.ops.Checksums
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end CDC slice (SURVEY.md §7.2): synthetic WAL → merge-apply →
  * final state equals an independent max-by-LSN reduction; exactly-once on
  * duplicate batch; deletes drop rows; late events are discarded; extracted
  * text matches golden bytes.
  *
  * Mirrors the reference's replay/crash tests
  * (/root/reference/tests/test_steps.py:64-120) and checksum-skip
  * (/root/reference/etl/grapher/to_db.py:217-220).
  */
class CdcSpec extends SparkSpec {

  val pageCols = Seq("url", "warc_ts", "html", "text", "lang", "_lsn")

  def checksum(df: DataFrame): Long = Checksums.tableChecksum(
    df.withColumn("html", sha2(col("html"), 256)), pageCols)

  test("replay: merge-apply over 3 batches equals independent reduction") {
    val cfg = EventGen.Config(nEvents = 30000, nUrls = 2000, nDomains = 40,
      seed = 7, parallelism = 4)
    val walDir = tmpDir("wal")
    val segs = EventGen.writeWalSegments(spark, cfg, walDir, 3)
    val table = Engine.createPagesTable(tmpDir("lake") + "/pages", numBuckets = 8)

    val stats = Engine.replaySegments(spark, segs, table)
    assert(stats.map(_.skipped) == Seq(false, false, false))

    val got = table.read(spark)
    val want = Engine.goldenFinalState(
      spark.read.schema(Engine.eventSchema).parquet(walDir + "/*"))
    assert(got.count() == want.count())
    assert(checksum(got) == checksum(want))
  }

  test("exactly-once: re-applying a committed batch changes nothing") {
    val cfg = EventGen.Config(nEvents = 5000, nUrls = 500, seed = 11, parallelism = 4)
    val walDir = tmpDir("wal2")
    val segs = EventGen.writeWalSegments(spark, cfg, walDir, 2)
    val table = Engine.createPagesTable(tmpDir("lake2") + "/pages", numBuckets = 4)
    Engine.replaySegments(spark, segs, table)
    val before = checksum(table.read(spark))
    val versionBefore = table.metadata.version

    // re-deliver batch 1
    val dup = MergeApply(spark, table,
      spark.read.schema(Engine.eventSchema).parquet(segs(1)), batchId = 1L)
    assert(dup.skipped)
    assert(table.metadata.version == versionBefore)
    assert(checksum(table.read(spark)) == before)
  }

  test("LWW: within and across batches, highest LSN wins; delete removes") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    def ev(lsn: Long, op: String, url: String, text: String) =
      graft.model.ChangeEvent(lsn, op, url, ts, Array.emptyByteArray, text, "en")
    val b0 = Seq(
      ev(1, "I", "u1", "v1"), ev(2, "U", "u1", "v2"),
      ev(3, "I", "u2", "w1"), ev(4, "I", "u3", "x1")).toDS.toDF
    val b1 = Seq(
      ev(5, "D", "u2", null), // delete existing
      ev(0, "U", "u1", "stale"), // late event, lower LSN than applied (2)
      ev(6, "U", "u3", "x2"),
      ev(7, "D", "u9", null) // delete of never-seen key = noop
    ).toDS.toDF

    val table = Engine.createPagesTable(tmpDir("lake3") + "/pages", numBuckets = 4)
    val s0 = MergeApply(spark, table, b0, 0L)
    assert(s0.inserted == 3 && s0.updated == 0 && s0.deleted == 0)
    val s1 = MergeApply(spark, table, b1, 1L)
    assert(s1.deleted == 1 && s1.updated == 1 && s1.keptLate == 1)

    val out = table.read(spark).select("url", "text", "_lsn")
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("u1", "v2", 2L), ("u3", "x2", 6L)))
  }

  test("per-url invariant: extractText(html) == text byte-identically") {
    import spark.implicits._
    val cfg = EventGen.Config(nEvents = 2000, nUrls = 300, seed = 3, parallelism = 4)
    val events = EventGen.events(spark, cfg)
    val bad = events
      .map(e => (e.url,
        graft.functions.TextExtract.extractText(e.html) == e.text))
      .filter(!_._2)
      .count()
    assert(bad == 0L)
  }

  test("streaming: file-source tail + foreachBatch reaches the same state") {
    val cfg = EventGen.Config(nEvents = 8000, nUrls = 600, seed = 23, parallelism = 4)
    val walDir = tmpDir("wal4")
    EventGen.writeWalSegments(spark, cfg, walDir, 4)
    val table = Engine.createPagesTable(tmpDir("lake4") + "/pages", numBuckets = 4)
    val q = Engine.runStream(spark, walDir, tmpDir("ckpt4"), table,
      maxFilesPerTrigger = Some(8))
    q.awaitTermination()

    val want = Engine.goldenFinalState(
      spark.read.schema(Engine.eventSchema).parquet(walDir + "/*"))
    assert(checksum(table.read(spark)) == checksum(want))
  }

  test("checkpoint resume: restart mid-stream converges to the same state") {
    val cfg = EventGen.Config(nEvents = 8000, nUrls = 600, seed = 29, parallelism = 4)
    val walDir = tmpDir("wal5")
    val segs = EventGen.writeWalSegments(spark, cfg, walDir, 4)
    val ckpt = tmpDir("ckpt5")
    val table = Engine.createPagesTable(tmpDir("lake5") + "/pages", numBuckets = 4)

    // phase 1: only first two segments visible; stream drains and stops
    val staged = tmpDir("staged5")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(new org.apache.hadoop.conf.Configuration())
    def stage(i: Int): Unit = fs.rename(
      new org.apache.hadoop.fs.Path(segs(i)),
      new org.apache.hadoop.fs.Path(s"$staged/segment-$i"))
    stage(2); stage(3)
    val q1 = Engine.runStream(spark, walDir, ckpt, table)
    q1.awaitTermination()
    val midCount = table.read(spark).count()
    assert(midCount > 0)

    // phase 2: remaining segments appear; resume from the same checkpoint
    fs.rename(new org.apache.hadoop.fs.Path(s"$staged/segment-2"),
      new org.apache.hadoop.fs.Path(segs(2)))
    fs.rename(new org.apache.hadoop.fs.Path(s"$staged/segment-3"),
      new org.apache.hadoop.fs.Path(segs(3)))
    val q2 = Engine.runStream(spark, walDir, ckpt, table)
    q2.awaitTermination()

    val want = Engine.goldenFinalState(
      spark.read.schema(Engine.eventSchema).parquet(walDir + "/*"))
    assert(checksum(table.read(spark)) == checksum(want))
  }

  test("schema evolution: add column + rename keeps old files readable") {
    import spark.implicits._
    val ts = new java.sql.Timestamp(0L)
    def ev(lsn: Long, op: String, url: String, text: String) =
      graft.model.ChangeEvent(lsn, op, url, ts, Array.emptyByteArray, text, "en")
    val table = Engine.createPagesTable(tmpDir("lake6") + "/pages", numBuckets = 4)
    MergeApply(spark, table,
      Seq(ev(1, "I", "u1", "t1"), ev(2, "I", "u2", "t2")).toDS.toDF, 0L)

    // add a column mid-log
    table.addColumn("fetch_status", "int")
    val b1 = Seq(ev(3, "U", "u2", "t2b"), ev(4, "I", "u3", "t3")).toDS.toDF
      .withColumn("fetch_status", lit(200))
    MergeApply(spark, table, b1, 1L)

    val afterAdd = table.read(spark)
      .select("url", "text", "fetch_status")
      .as[(String, String, Option[Int])].collect().sortBy(_._1)
    assert(afterAdd.toSeq == Seq(
      ("u1", "t1", None), ("u2", "t2b", Some(200)), ("u3", "t3", Some(200))))

    // rename text → body and back (FIXTURES.md F6): data files untouched
    table.renameColumn("text", "body")
    val r1 = table.read(spark).select("url", "body")
      .as[(String, String)].collect().sortBy(_._1)
    assert(r1.toSeq == Seq(("u1", "t1"), ("u2", "t2b"), ("u3", "t3")))
    table.renameColumn("body", "text")
    assert(table.read(spark).columns.contains("text"))
  }
}
