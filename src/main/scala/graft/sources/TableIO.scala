package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.{TableMeta, VariableMeta}
import graft.ops.{Names, Repack, TableOps}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Plain-table IO with metadata sidecars — the Spark re-expression of the
  * reference's `Table.to_*`/`read_*` + `.meta.json` discipline
  * (/root/reference/lib/catalog/owid/catalog/core/tables.py:185-355) and
  * `Dataset.add`'s write-time checks (datasets.py:137-207):
  * underscore-valid names, primary key present and unique, dtypes repacked.
  *
  * The lake-table format (graft.lake) is the engine's catalog layer; this
  * is the edge-format layer for snapshot-style inputs/outputs
  * (csv/json/parquet), mirroring the reference's format zoo
  * (tables.py:2431-2749) for the formats that matter at scale.
  */
object TableIO {

  private val mapper = new ObjectMapper()

  /** Write a table + its `.meta.json` sidecar. Checks mirror Dataset.add:
    * all column names underscore-valid, pk present + unique. `repack`
    * narrows dtypes before write (storage-side, lossless). */
  def write(
      df: DataFrame,
      dir: String,
      meta: TableMeta,
      format: String = "parquet",
      repack: Boolean = true
  ): Unit = {
    val bad = df.columns.filterNot(Names.isValid)
    require(bad.isEmpty, s"non-underscore column names: ${bad.mkString(", ")}")
    val missingPk = meta.primaryKey.filterNot(df.columns.contains)
    require(missingPk.isEmpty, s"primary key missing: $missingPk")
    if (meta.primaryKey.nonEmpty)
      require(TableOps.duplicateKeyCount(df, meta.primaryKey) == 0,
        s"non-unique primary key ${meta.primaryKey}") // NonUniqueIndex analogue
    val out = if (repack) Repack.repack(df) else df
    val writer = out.write.mode("overwrite")
    format match {
      case "parquet" => writer.parquet(s"$dir/data.parquet")
      case "csv"     => writer.option("header", "true").csv(s"$dir/data.csv")
      case "json"    => writer.json(s"$dir/data.json")
      case "feather" => FeatherIO.write(out, s"$dir/data.feather")
      case other     => throw new IllegalArgumentException(s"format: $other")
    }
    writeSidecar(dir, meta, format)
  }

  /** Read a table back with its metadata; format dispatched from the
    * sidecar (Table.read analogue, tables.py:224-274). `safeTypes` widens
    * repacked columns back to long/double (repack.to_safe_types). */
  def read(spark: SparkSession, dir: String, safeTypes: Boolean = false): (DataFrame, TableMeta) = {
    val (meta, format) = readSidecar(spark, dir)
    val df = format match {
      case "parquet" => spark.read.parquet(s"$dir/data.parquet")
      case "csv" => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(s"$dir/data.csv")
      case "json"    => spark.read.json(s"$dir/data.json")
      case "feather" => FeatherIO.read(spark, s"$dir/data.feather")
      case "stata"   => StataIO.read(spark, s"$dir/data.dta") // reader-only (like the reference)
    }
    (if (safeTypes) Repack.toSafeTypes(df) else df, meta)
  }

  /** Fixed-width file reader — `read_fwf` (tables.py:2472): one distributed
    * text scan, columns sliced by (start, end) character positions in the
    * projection (codegen substring, no UDF). `colSpecs` is
    * (name, startInclusive, endExclusive), 0-based, pandas colspecs
    * semantics. Values are trimmed; types left as string (cast downstream,
    * as the reference does via repack/astype). */
  def readFwf(
      spark: SparkSession,
      path: String,
      colSpecs: Seq[(String, Int, Int)],
      skipRows: Int = 0
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(colSpecs.nonEmpty, "readFwf: empty colSpecs")
    val bad = colSpecs.map(_._1).filterNot(Names.isValid)
    require(bad.isEmpty, s"non-underscore column names: ${bad.mkString(", ")}")
    val body =
      if (skipRows <= 0) spark.read.text(path)
      else {
        // header lines: drop the first k lines of each file. Line numbering
        // must follow byte offsets, but Spark packs a multi-split file's
        // splits into partitions in size order, so window-over-
        // monotonically_increasing_id is NOT offset-ordered. wholetext reads
        // each file as one row (exact line order by construction); FWF files
        // with header rows are snapshot-ingest units, so the one-file-in-
        // memory bound is acceptable and documented here.
        // strip exactly ONE trailing newline before splitting: a file ending
        // with "\n" (the normal case) must not yield a phantom empty last
        // line (spark.read.text emits none); interior empty lines are kept
        spark.read.option("wholetext", "true").text(path)
          .select(posexplode(split(regexp_replace(col("value"), "\r?\n$", ""), "\r?\n"))
            .as(Seq("__pos", "value")))
          .where(col("__pos") >= skipRows).drop("__pos")
      }
    body.select(colSpecs.map { case (name, start, end) =>
      trim(substring(col("value"), start + 1, end - start)).as(name)
    }: _*)
  }

  /** In-memory records → table — `read_records`/`read_dict`
    * (tables.py:2520-2560): rows as maps over a declared column order. */
  def readRecords(
      spark: SparkSession,
      columns: Seq[String],
      records: Seq[Map[String, String]]
  ): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = org.apache.spark.sql.types.StructType(
      columns.map(c => StructField(c, StringType)))
    val rows = records.map(r => Row.fromSeq(columns.map(c => r.get(c).orNull)))
    spark.createDataFrame(rows.asJava, schema)
  }

  // ------------------------------------------------------------- sidecar io

  def writeSidecar(dir: String, meta: TableMeta, format: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("short_name", meta.shortName)
    meta.title.foreach(n.put("title", _))
    n.put("format", format)
    n.put("is_public", meta.isPublic)
    val pk = n.putArray("primary_key")
    meta.primaryKey.foreach(pk.add)
    val fields = n.putObject("fields")
    meta.fields.foreach { case (c, vm) =>
      val f = fields.putObject(c)
      vm.title.foreach(f.put("title", _))
      vm.unit.foreach(f.put("unit", _))
      vm.shortUnit.foreach(f.put("short_unit", _))
      vm.description.foreach(f.put("description", _))
      val pl = f.putArray("processing_log")
      vm.processingLog.foreach(pl.add)
    }
    val p = new Path(dir, "table.meta.json")
    val fs = p.getFileSystem(new Configuration())
    val o = fs.create(p, true)
    try o.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(n))
    finally o.close()
  }

  def readSidecar(spark: SparkSession, dir: String): (TableMeta, String) = {
    val p = new Path(dir, "table.meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val n = try mapper.readTree(in) finally in.close()
    def opt(x: com.fasterxml.jackson.databind.JsonNode, f: String) =
      Option(x.get(f)).map(_.asText())
    val fields = Option(n.get("fields")).map { fn =>
      fn.properties().asScala.map { e =>
        val v = e.getValue
        e.getKey -> VariableMeta(
          title = opt(v, "title"), unit = opt(v, "unit"),
          shortUnit = opt(v, "short_unit"),
          description = opt(v, "description"),
          processingLog = Option(v.get("processing_log"))
            .map(_.elements().asScala.map(_.asText()).toList).getOrElse(Nil))
      }.toMap
    }.getOrElse(Map.empty[String, VariableMeta])
    val meta = TableMeta(
      shortName = n.get("short_name").asText(),
      title = opt(n, "title"),
      primaryKey = Option(n.get("primary_key"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
      fields = fields,
      isPublic = Option(n.get("is_public")).forall(_.asBoolean()))
    (meta, opt(n, "format").getOrElse("parquet"))
  }
}
