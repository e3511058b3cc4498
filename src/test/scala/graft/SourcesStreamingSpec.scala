package graft

import graft.functions.MathFuncs
import graft.model.{TableMeta, VariableMeta}
import graft.sources.TableIO
import graft.streaming.IngestMetrics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Table IO sidecars, math scalar functions, and streaming ingest metrics. */
class SourcesStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("table write/read round-trips data + metadata sidecar") {
    val df = Seq(("usa", 2020, 1.5), ("usa", 2021, 2.5), ("fra", 2020, 3.0))
      .toDF("country", "year", "gdp")
    val meta = TableMeta("gdp_table", Some("GDP"), Seq("country", "year"),
      Map("gdp" -> VariableMeta(title = Some("GDP"), unit = Some("USD"))))
    val dir = tmpDir("tio")
    TableIO.write(df, dir, meta)
    val (back, metaBack) = TableIO.read(spark, dir, safeTypes = true)
    assert(metaBack == meta)
    assert(back.as[(String, Long, Double)].collect().toSet ==
      df.as[(String, Int, Double)].collect().map(t => (t._1, t._2.toLong, t._3)).toSet)
  }

  test("write rejects bad names, missing pk, duplicate pk") {
    val meta = TableMeta("t", primaryKey = Seq("k"))
    intercept[IllegalArgumentException] {
      TableIO.write(Seq((1, 2)).toDF("Bad Name", "k"), tmpDir("tio2"), meta)
    }
    intercept[IllegalArgumentException] {
      TableIO.write(Seq((1, 2)).toDF("a", "b"), tmpDir("tio3"), meta)
    }
    intercept[IllegalArgumentException] {
      TableIO.write(Seq((1, 1), (1, 2)).toDF("k", "v"), tmpDir("tio4"), meta)
    }
  }

  test("csv format round-trip via sidecar dispatch") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "n")
    val dir = tmpDir("tio5")
    TableIO.write(df, dir, TableMeta("t", primaryKey = Seq("k")),
      format = "csv", repack = false)
    val (back, meta) = TableIO.read(spark, dir)
    assert(meta.shortName == "t")
    assert(back.count() == 2 && back.columns.toSeq == Seq("k", "n"))
  }

  test("feather (Arrow IPC) round-trip incl. nulls, dates, timestamps, sidecar dispatch") {
    import graft.sources.FeatherIO
    val df = Seq[(String, Option[Long], Option[Double], Boolean)](
      ("a", Some(1L), Some(1.5), true),
      ("b", None, None, false),
      ("c", Some(-7L), Some(2.25), true)
    ).toDF("k", "n", "x", "f")
      .withColumn("d", to_date(lit("2023-05-04")))
      .withColumn("ts", to_timestamp(lit("2023-05-04 12:34:56.123456")))
    val path = tmpDir("feather") + "/t.feather"
    FeatherIO.write(df, path)
    val back = FeatherIO.read(spark, path)
    assert(back.schema == df.schema.copy(fields =
      df.schema.fields.map(_.copy(nullable = true))))
    val rows = back.orderBy("k").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(1) == 1L && rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(0).getDouble(2) == 1.5 && rows(2).getLong(1) == -7L)
    assert(rows(0).getDate(4).toString == "2023-05-04")
    assert(rows(0).getTimestamp(5).getNanos == 123456000)
    // sidecar format dispatch round-trips feather like csv/json/parquet
    val dir = tmpDir("tio-feather")
    TableIO.write(df.select("k", "n", "x"), dir,
      TableMeta("t", primaryKey = Seq("k")), format = "feather", repack = false)
    val (b2, meta) = TableIO.read(spark, dir)
    assert(meta.shortName == "t" && b2.count() == 3)
    assert(b2.columns.toSeq == Seq("k", "n", "x"))
  }

  test("xlsx reader: shared/inline strings, numbers, booleans, blanks, entities") {
    import graft.sources.ExcelIO
    // a real .xlsx is a ZIP of XML parts — plant one with the JDK zip writer
    val path = tmpDir("xlsx") + "/t.xlsx"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst><si><t>name</t></si><si><t>qty</t></si>""" +
        """<si><t>alpha</t></si><si><t>beta &amp; &lt;xml&gt;</t></si>""" +
        """<si><r><t>rich</t></r><r><t>-text</t></r></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>3.5</v></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>3</v></c></row>""" + // blank qty
        """<row r="4"><c r="A4" t="s"><v>4</v></c><c r="B4" t="b"><v>1</v></c></row>""" +
        """<row r="5"><c r="A5" t="inlineStr"><is><t>inline</t></is></c><c r="B5"><v>7</v></c></row>""" +
        """</sheetData></worksheet>""")
    zos.close()
    val df = ExcelIO.read(spark, path)
    assert(df.columns.toSeq == Seq("name", "qty"))
    val rows = df.as[(String, Option[String])].collect().toSeq
    assert(rows == Seq(
      ("alpha", Some("3.5")),
      ("beta & <xml>", None),          // XML entities decoded; blank → null
      ("rich-text", Some("true")),     // rich-text runs concatenated; bool
      ("inline", Some("7"))))          // inline string, no shared table hit
  }

  test("math funcs: bard, sig figs, power of ten") {
    val df = Seq((100.0, 101.0), (0.0, 0.0), (12345.0, 12345.0))
      .toDF("a", "b")
    val r = df.select(
      round(MathFuncs.bard($"a", $"b"), 6).as("bard"),
      MathFuncs.roundToSigFigs($"a", 2).as("sig"),
      MathFuncs.roundToNearestPowerOfTen($"a").as("p10"))
      .collect()
    assert(math.abs(r(0).getDouble(0) - 1.0 / 201.0) < 1e-6)
    assert(r(2).getDouble(1) == 12000.0)
    assert(r(2).getDouble(2) == 10000.0)
    assert(MathFuncs.humanize(2.5e9) == "2.5 billion")
  }

  test("streaming ingest metrics: watermarked tumbling windows over the WAL") {
    val cfg = cdc.EventGen.Config(nEvents = 5000, nUrls = 500, seed = 13,
      parallelism = 4)
    val walDir = tmpDir("wal-metrics")
    cdc.EventGen.writeWalSegments(spark, cfg, walDir, 2)

    val stream = spark.readStream.schema(cdc.Engine.eventSchema)
      .option("recursiveFileLookup", "true").parquet(walDir)
    val q = IngestMetrics.perWindow(stream, "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ingest_metrics")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ckpt-metrics"))
      .start()
    q.awaitTermination()

    val got = spark.sql("SELECT sum(events), sum(deletes) FROM ingest_metrics")
      .as[(Long, Long)].collect().head
    assert(got._1 == 5000)
    // batch-mode parity: same aggregation over the same data
    val batch = IngestMetrics.perWindow(
      spark.read.schema(cdc.Engine.eventSchema).parquet(walDir + "/*"))
    assert(batch.agg(sum($"events")).as[Long].collect().head == 5000)
    assert(got._2 == batch.agg(sum($"deletes")).as[Long].collect().head)
  }

  test("session windows group recrawl bursts per url") {
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val evs = Seq(
      (1L, "U", "u1", ts(0)), (2L, "U", "u1", ts(60)),   // session A
      (3L, "U", "u1", ts(3600)),                          // session B (gap)
      (4L, "U", "u2", ts(0))
    ).toDF("lsn", "op", "url", "warc_ts")
    val s = IngestMetrics.updateSessions(evs, gap = "5 minutes")
      .orderBy("url", "session_start")
      .select("url", "updates").as[(String, Long)].collect()
    assert(s.toSeq == Seq(("u1", 2L), ("u1", 1L), ("u2", 1L)))
  }

  test("catalog index lists lake tables from manifests only") {
    val store = tmpDir("catalog")
    val t1 = cdc.Engine.createPagesTable(s"$store/pages_a", 4)
    cdc.MergeApply(spark, t1, Seq(graft.model.ChangeEvent(
      1L, "I", "u1", new java.sql.Timestamp(0), Array.emptyByteArray, "t", "en"))
      .toDS.toDF, 0L)
    cdc.Engine.createPagesTable(s"$store/pages_b", 2)
    val idx = graft.lake.Catalog.index(spark, store)
      .orderBy("table")
      .select("table", "currentSnapshotId", "deltaFiles")
      .as[(String, Long, Int)].collect()
    assert(idx.map(_._1).toSeq == Seq("pages_a", "pages_b"))
    assert(idx(0)._2 == 1L && idx(0)._3 >= 1)
    assert(idx(1)._2 == -1L)
  }

  test("readFwf slices fixed-width columns; readRecords builds from maps") {
    val dir = tmpDir("fwf")
    val lines = Seq(
      "NAME      YEARVAL ",
      "usa       20201.50",
      "france    20212.25")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.txt"),
      lines.mkString("\n").getBytes("UTF-8"))
    val df = TableIO.readFwf(spark, dir + "/data.txt",
      Seq(("name", 0, 10), ("year", 10, 14), ("v", 14, 18)), skipRows = 1)
    val got = df.select("name", "year", "v")
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("france", "2021", "2.25"), ("usa", "2020", "1.50")))

    val rec = TableIO.readRecords(spark, Seq("a", "b"),
      Seq(Map("a" -> "1", "b" -> "x"), Map("a" -> "2")))
    val rows = rec.as[(Option[String], Option[String])].collect().toSet
    assert(rows == Set((Some("1"), Some("x")), (Some("2"), None)))
  }

  test("StataIO reads dta 117 and 118: types, names, missing sentinels") {
    import graft.sources.StataIO
    // golden fixtures written by the PUBLIC pandas to_stata writer
    // (versions 117 and 118), committed under src/test/resources/stata
    for (ver <- Seq(117, 118)) {
      val path = getClass.getResource(s"/stata/fixture$ver.dta").getPath
      val df = StataIO.read(spark, path)
      assert(df.columns.toSeq ==
        Seq("country", "year", "small", "mid", "v", "f"))
      assert(df.schema("year").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(df.schema("small").dataType ==
        org.apache.spark.sql.types.ByteType)
      val rows = df
        .select("country", "year", "small", "mid", "v", "f")
        .as[(String, Int, Byte, Short, Option[Double], Float)]
        .collect().sortBy(_._2)
      assert(rows.toSeq == Seq(
        ("usa", 2020, 1.toByte, 10.toShort, Some(1.5), 0.5f),
        ("france", 2021, 2.toByte, 20.toShort, Some(2.25), 1.5f),
        ("germany", 2022, 3.toByte, 30.toShort, None, 2.5f))) // NaN → Stata missing → null
    }
  }

  test("StataIO: a glob of .dta files with differing schemas fails loudly") {
    import graft.sources.StataIO
    // ADVICE r4: schema comes from the first file, so a glob mixing schemas
    // must throw, never silently write values into the wrong columns
    val dir = tmpDir("stata-glob")
    for (f <- Seq("fixture117.dta", "mismatch117.dta"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(getClass.getResource(s"/stata/$f").getPath),
        java.nio.file.Paths.get(dir, f))
    val e = intercept[Exception] { StataIO.read(spark, dir).collect() }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(messages.contains("schema mismatch"), s"got: $messages")
  }

  test("readFwf: trailing newline adds no phantom row; interior blanks kept") {
    val dir = tmpDir("fwf-nl")
    // the NORMAL file shape: ends with a newline
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "data.txt"),
      "HDR\nusa \nfra \n".getBytes("UTF-8"))
    val df = TableIO.readFwf(spark, dir + "/data.txt",
      Seq(("name", 0, 4)), skipRows = 1)
    assert(df.as[String].collect().sorted.toSeq == Seq("fra", "usa"))
    // interior empty line preserved (only the final newline is special)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "blank.txt"),
      "HDR\nusa \n\nfra \n".getBytes("UTF-8"))
    val df2 = TableIO.readFwf(spark, dir + "/blank.txt",
      Seq(("name", 0, 4)), skipRows = 1)
    assert(df2.as[String].collect().sorted.toSeq == Seq("", "fra", "usa"))
  }

  test("WAL contiguity monitor: gaps and late events across micro-batches") {
    import graft.streaming.WalMonitor
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val events = in.toDF.toDF("shard", "lsn")
    val q = WalMonitor.detectGaps(events, "shard")
      .writeStream.outputMode("append")
      .format("memory").queryName("wal_gaps")
      .option("checkpointLocation", tmpDir("ckpt-gaps"))
      .start()
    // batch 1: contiguous 1..3 on shard a; internal gap on shard b (1,2,5)
    in.addData(("a", 1L), ("a", 2L), ("a", 3L), ("b", 1L), ("b", 2L), ("b", 5L))
    q.processAllAvailable()
    // batch 2: shard a skips to 7 (cross-batch gap) and redelivers 2 (late)
    in.addData(("a", 7L), ("a", 2L))
    q.processAllAvailable()
    q.stop()
    val got = spark.sql("SELECT shard, kind, from, to, n FROM wal_gaps")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("b", "gap", 3L, 4L, 2L),   // internal gap in batch 1
      ("a", "gap", 4L, 6L, 3L),   // cross-batch gap (state carried 3)
      ("a", "late", 2L, 2L, 1L))) // redelivery below the high watermark
    // batch mode runs with empty state — internal gaps only
    val batch = WalMonitor.detectGaps(
      Seq(("c", 1L), ("c", 4L)).toDF("shard", "lsn"), "shard")
      .collect().toSeq
    assert(batch == Seq(WalMonitor.GapReport("c", "gap", 2L, 3L, 2L)))
  }

  test("hot-domain monitor surfaces the Zipf head") {
    val cfg = cdc.EventGen.Config(nEvents = 5000, nUrls = 500, seed = 13,
      skew = 3.0, parallelism = 4)
    val events = cdc.EventGen.events(spark, cfg).toDF
    val hot = IngestMetrics.hotDomains(events, 5)
      .as[(String, Long)].collect()
    assert(hot.length == 5)
    assert(hot.head._2 > cfg.nEvents / cfg.nDomains) // head is above uniform
    assert(hot.head._1 == "site0.example.com") // power-law concentrates at 0
  }
}
