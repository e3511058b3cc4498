package graft.ops

import graft.meta.{MetaLayering, MetaTable}
import graft.model.VariableMeta
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grapher publish adaptation — the reference's grapher-channel pipeline
  * (/root/reference/etl/grapher/helpers.py): entity-id resolution, table
  * adaptation, and the per-variable table fan-out. The reference resolves
  * entities against a MySQL dim table; here the entities dim is a DataFrame
  * (id, name, code) — same semantics, lake-native.
  */
object Grapher {

  /** Resolve country names/codes to entity ids against the entities dim —
    * `country_to_entity_id` (helpers.py:354-400). The dim is small
    * (countries of the world): broadcast join, no shuffle of the data side.
    *
    * `createEntities = true` assigns new ids to unmatched names,
    * deterministically: maxId + dense rank of the new name (the analogue of
    * inserting into the entities table). With false, unmatched rows fail the
    * post-join assertion (one slim count, mirrored from the reference's
    * "Some countries have not been mapped" assert). */
  def countryToEntityId(
      df: DataFrame,
      entities: DataFrame, // (id long, name string, code string)
      countryCol: String = "country",
      by: String = "name",
      createEntities: Boolean = false
  ): DataFrame = {
    require(by == "name" || by == "code", s"by: $by")
    val dim0 = entities.select(
      col("id").cast("long").as("__eid"), col(by).as("__ekey"))
    val dim =
      if (!createEntities) dim0
      else {
        // new names get ids above the current max, ordered by name —
        // deterministic. Driver-side like the reference's entity inserts
        // (helpers.py:389-395): the set is bounded by entity cardinality
        // (countries), never by row count.
        val spark = df.sparkSession
        import spark.implicits._
        val maxId = dim0.agg(coalesce(max(col("__eid")), lit(0L)))
          .collect()(0).getLong(0)
        val fresh = df.select(col(countryCol).as("__ekey")).distinct()
          .join(dim0, Seq("__ekey"), "left_anti")
          .as[String].collect().sorted
          .zipWithIndex.map { case (n, i) => (maxId + i + 1, n) }
        dim0.unionByName(fresh.toSeq.toDF("__eid", "__ekey"))
      }
    val joined = df.join(broadcast(dim), df(countryCol) === dim("__ekey"), "left")
    // unmatched-country assert evaluated IN the projection (raise_error on
    // the first null id), not as an eager collect at plan-build time — the
    // reference's "Some countries have not been mapped" assert without an
    // extra full pass over df before the real action
    joined
      .withColumn("entityId",
        when(col("__eid").isNull, raise_error(concat(
          lit("Some countries have not been mapped: "), col(countryCol))))
          .otherwise(col("__eid")))
      .drop("__eid", "__ekey")
  }

  /** Garden → grapher table adaptation — `_adapt_table_for_grapher`
    * (helpers.py:425-475): unique-title assertion is the caller's metadata
    * concern; here: require (country, year), resolve entityId, attach
    * entityCode/entityName, drop the raw country column. */
  def adaptTableForGrapher(
      df: DataFrame,
      entities: DataFrame
  ): DataFrame = {
    require(df.columns.contains("country") && df.columns.contains("year"),
      "Table must have columns country and year.")
    require(!df.columns.contains("entity_id") && !df.columns.contains("entityId"),
      "Table must not have column entity_id.")
    val withId = countryToEntityId(df, entities, "country", "name",
      createEntities = true)
    val codes = entities.select(
      col("id").cast("long").as("entityId"),
      col("code").as("entityCode"), col("name").as("entityName"))
    // left join: entities created on the fly have no code row; keep name
    withId
      .join(broadcast(codes), Seq("entityId"), "left")
      .withColumn("entityName", coalesce(col("entityName"), col("country")))
      .drop("country")
  }

  /** Sub-yearly (dated) table → grapher adaptation —
    * `adapt_table_with_dates_to_grapher` (helpers.py:618-689): dates are
    * encoded as days-since-zeroDay integers in an int `year` column, and
    * each value column's display metadata records `zeroDay` (ISO date of the
    * earliest observation) and `timeInterval` so grapher can decode them.
    *
    * zeroDay is ONE slim min() aggregate (a model-sized scalar the metadata
    * needs driver-side anyway — the same shape as the q_date_funcs
    * agg+broadcast, never a global window over the data). */
  def adaptTableWithDatesForGrapher(
      mt: MetaTable,
      dateColumn: String = "date",
      countryColumn: String = "country",
      timeInterval: String = "day",
      dropDateColumn: Boolean = true
  ): MetaTable = {
    require(mt.df.columns.contains(dateColumn), s"missing column $dateColumn")
    val df0 =
      if (mt.df.columns.contains("year")) mt.df.drop("year") else mt.df
    val zeroRow = df0.agg(min(to_date(col(dateColumn))).as("z")).collect()(0)
    require(!zeroRow.isNullAt(0), s"no non-null $dateColumn values")
    val zeroDay = zeroRow.getDate(0).toString // ISO yyyy-MM-dd
    val withYear = df0.withColumn("year",
      datediff(to_date(col(dateColumn)), lit(zeroDay).cast("date")).cast("int"))
    val out = if (dropDateColumn) withYear.drop(dateColumn) else withYear
    val valueCols = df0.columns.filterNot(c => c == dateColumn || c == countryColumn)
    val fields = valueCols.foldLeft(mt.meta.fields) { (fs, c) =>
      val vm = fs.getOrElse(c, VariableMeta())
      fs + (c -> vm.copy(display = vm.display ++
        Map("timeInterval" -> timeInterval, "zeroDay" -> zeroDay)))
    }
    MetaTable(out, mt.meta.copy(fields = fields))
  }

  /** Metadata-aware grapher adaptation (`_adapt_table_for_grapher`,
    * helpers.py:425-475): asserts variable titles are unique, auto-adapts a
    * `date` column through [[adaptTableWithDatesForGrapher]], then resolves
    * entities like the DataFrame overload. */
  def adaptTableForGrapher(mt: MetaTable, entities: DataFrame): MetaTable = {
    val titles = mt.meta.fields.values.flatMap(_.title).toSeq
    val dups = titles.groupBy(identity).collect { case (t, vs) if vs.size > 1 => t }
    require(dups.isEmpty, s"Variable titles are not unique: ${dups.toSeq.sorted}")
    val dated =
      if (!mt.df.columns.contains("date")) mt
      else {
        require(!mt.df.columns.contains("year"),
          "Table cannot have both `date` and `year` columns.")
        adaptTableWithDatesForGrapher(mt)
      }
    MetaTable(adaptTableForGrapher(dated.df, entities), dated.meta)
  }

  /** Per-variable fan-out WITH per-dimension-combo rendered metadata — the
    * composition of `_yield_wide_table` (helpers.py:31-123) and
    * `VariableMeta.render` (`_metadata_for_dimensions`, helpers.py:126-156):
    * for every (value column × dimension combo) emit
    * (short_name, long table, rendered VariableMeta) where
    *  - short_name = underscore(column__dim1_value1__…)
    *    (`_underscore_column_and_dimensions`, helpers.py:234);
    *  - a non-Jinja title gets the "Title - Dim: value" default
    *    (`_title_column_and_dimensions`, helpers.py:225-231), a Jinja title
    *    is rendered with the combo's dim dict;
    *  - short names and rendered titles must be UNIQUE across emitted
    *    variables (helpers.py:189-195, 441-446).
    *
    * Dim combos are enumerated driver-side from a distinct() — bounded by
    * dimension cardinality (sex × age …), never by row count, exactly like
    * the reference's groupby. All-null variables are skipped
    * (helpers.py:91-95). */
  def yieldWideTablesWithMeta(
      mt: MetaTable,
      entityCols: Seq[String],
      dimCols: Seq[String],
      valueCols: Seq[String]
  ): Seq[(String, DataFrame, VariableMeta)] =
    yieldWideEntries(mt, entityCols, dimCols, valueCols)
      .map(e => (e.shortName, e.table, e.meta))

  /** One emitted grapher variable: source column, dim combo, derived short
    * name, the long per-variable table, rendered metadata. */
  final case class WideEntry(column: String, dims: Map[String, String],
      shortName: String, table: DataFrame, meta: VariableMeta)

  private[graft] def yieldWideEntries(
      mt: MetaTable,
      entityCols: Seq[String],
      dimCols: Seq[String],
      valueCols: Seq[String]
  ): Seq[WideEntry] = {
    val df = mt.df
    // ONE aggregation pass yields BOTH the dim combos and each variable's
    // non-null count per combo (the all-null skip, helpers.py:91-95) --
    // constant job count in combos x columns, vs one eager isEmpty job per
    // (combo, column) pair plus a distinct() collect. Result size is
    // bounded by dimension cardinality (sex x age ...), never row count.
    val countCols = valueCols.map(c => count(col(c)).as(s"__cnt_$c"))
    val comboRows: Seq[(Map[String, String], Map[String, Long])] =
      (if (dimCols.isEmpty)
        df.agg(countCols.head, countCols.tail: _*).collect().toSeq
      else
        df.groupBy(dimCols.map(col): _*)
          .agg(countCols.head, countCols.tail: _*).collect().toSeq)
        .map { r =>
          val dims = dimCols.zipWithIndex.flatMap { case (d, i) =>
            if (r.isNullAt(i)) None else Some(d -> r.get(i).toString)
          }.toMap
          val cnts = valueCols.map(c => c -> r.getLong(r.fieldIndex(s"__cnt_$c"))).toMap
          (dims, cnts)
        }
        .sortBy { case (m, _) => dimCols.map(m.getOrElse(_, "")).mkString("\u0000") }
    val isJinja = (s: String) => s.contains("{{") || s.contains("{%")
    val out = for {
      (dims, nonNullCounts) <- comboRows
      c <- valueCols
      subset = dimCols.foldLeft(df) { (d, dc) =>
        dims.get(dc) match {
          case Some(v) => d.filter(col(dc).cast("string") === v)
          case None    => d.filter(col(dc).isNull)
        }
      }
      if nonNullCounts(c) > 0 // skip all-null variables -- no extra job
    } yield {
      val orderedDims = dimCols.flatMap(d => dims.get(d).map(d -> _))
      val shortName = (Names.underscore(c) +: orderedDims.map { case (d, v) =>
        Names.underscore(s"${d}_$v")
      }).mkString("__") // parts underscored separately — the __ separator survives
      val long = subset
        .select((entityCols.map(col) :+ col(c).as(shortName)): _*)
        .where(col(shortName).isNotNull)
      val vm0 = mt.meta.fields.getOrElse(c, VariableMeta())
      val titled = vm0.title match {
        case Some(t) if !isJinja(t) && orderedDims.nonEmpty =>
          val parts = orderedDims.map { case (d, v) =>
            s"${d.replace('_', ' ').capitalize}: $v"
          }
          vm0.copy(title = Some((t +: parts).mkString(" - ")))
        case _ => vm0
      }
      def r(o: Option[String]) = o.map(MetaLayering.render(_, dims))
      val rendered = titled.copy(
        title = r(titled.title), unit = r(titled.unit),
        shortUnit = r(titled.shortUnit), description = r(titled.description),
        display = titled.display.map { case (k, v) =>
          k -> MetaLayering.render(v, dims)
        })
      WideEntry(c, dims, shortName, long, rendered)
    }
    def assertUnique(what: String, vs: Seq[String]): Unit = {
      val dups = vs.groupBy(identity).collect { case (v, g) if g.size > 1 => v }
      require(dups.isEmpty, s"Duplicate variable $what: ${dups.toSeq.sorted}")
    }
    assertUnique("short names", out.map(_.shortName))
    assertUnique("titles", out.flatMap(_.meta.title))
    out
  }

  /** The reference's `long_to_wide_tables` (helpers.py:270-300) re-expressed
    * for a distributed sink: ONE partitioned write of the long table (no
    * driver loop over variables — `partitionBy(variable)` splits at write
    * time), where each partition directory IS the per-variable table. The
    * repartition bounds file counts to one per (variable) regardless of
    * input parallelism. Variable names must be valid underscored
    * identifiers (the reference validates each). */
  def writeLongAsWideTables(
      long: DataFrame, // columns: idCols..., variable, value
      outDir: String
  ): Unit = {
    require(Seq("variable", "value").forall(long.columns.contains),
      "long table needs `variable` and `value` columns")
    long
      .repartition(col("variable"))
      .write.mode("overwrite").partitionBy("variable").parquet(outDir)
  }

  /** Read back one variable's wide table from the partitioned fan-out:
    * idCols + a column named after the variable (helpers.py:285-295). */
  def readWideTable(
      spark: SparkSession,
      outDir: String,
      variable: String
  ): DataFrame = {
    require(Names.isValid(variable), s"invalid variable name: $variable")
    spark.read.parquet(s"$outDir/variable=$variable")
      .withColumnRenamed("value", variable)
  }

  /** End-to-end grapher publish — `GrapherStep.run`
    * (/root/reference/etl/steps/__init__.py:999-1129): adapt the table
    * (entity resolution, dates), fan out per-variable tables with rendered
    * per-dim-combo metadata, then publish with
    *  - ONE distributed write for ALL variables: the source is melted once
    *    (codegen'd Expand — no per-variable scan), short names resolved via
    *    a bounded literal map keyed on (column, dim values), and the long
    *    frame written `partitionBy(variable)` with DYNAMIC overwrite (only
    *    re-emitted variables' dirs are replaced);
    *  - a metadata sidecar per variable dir (the data_values + variables
    *    upsert of grapher/to_db.py:209-420);
    *  - GHOST cleanup (to_db.py:416): variable dirs from a previous publish
    *    that are no longer emitted are deleted, so re-publishing after a
    *    column/dim removal leaves no stale variable behind.
    * Idempotent: re-publishing the same table converges to the same dirs.
    * Value columns must share a numeric type (melt casts to the common
    * type; grapher indicators are numeric). Returns emitted short names. */
  /** The single-pass long fan-out at the heart of `publish`: melt every
    * value column once (codegen'd Expand — no per-variable scan), resolve
    * each row's grapher short name through a bounded literal map keyed on
    * (column, dim values) — `try_element_at` O(1)-depth lookup, never a
    * when-chain — and drop null values plus all-null variables (absent
    * keys). Oracle-gated via q_grapher_publish. */
  def publishLong(
      df: DataFrame,
      entries: Seq[WideEntry],
      entityCols: Seq[String],
      dimCols: Seq[String],
      valueCols: Seq[String]
  ): DataFrame = {
    val Sep = "\u0001"
    val NullMark = "\u0000null"
    val keyOf: (String, Map[String, String]) => String = (c, dims) =>
      (c +: dimCols.map(d => dims.getOrElse(d, NullMark))).mkString(Sep)
    val nameByKey: Map[String, String] =
      entries.map(e => keyOf(e.column, e.dims) -> e.shortName).toMap
    val keyExpr = concat_ws(Sep,
      (col("__col") +: dimCols.map(d =>
        coalesce(col(d).cast("string"), lit(NullMark)))): _*)
    Reshape.melt(df, entityCols ++ dimCols, valueCols,
        varName = "__col", valueName = "value")
      .where(col("value").isNotNull)
      .withColumn("variable", try_element_at(typedLit(nameByKey), keyExpr))
      .where(col("variable").isNotNull)
      .select((entityCols.map(col) :+ col("variable") :+ col("value")): _*)
  }

  def publish(
      mt: MetaTable,
      entities: DataFrame,
      outDir: String,
      dimCols: Seq[String] = Nil
  ): Seq[String] = publishDetailed(mt, entities, outDir, dimCols).emitted

  /** What a publish actually did: every emitted variable, the subset whose
    * DATA changed (partition dir rewritten), the metadata-only updates
    * (sidecar re-stamped, zero data IO), and the checksum-gated skips
    * (nothing touched). */
  final case class PublishReport(
      emitted: Seq[String], written: Seq[String],
      metaOnly: Seq[String], skipped: Seq[String])

  private def checksumPath(outDir: String, name: String) =
    new org.apache.hadoop.fs.Path(s"$outDir/_meta/variable=$name/_checksums.json")

  def publishDetailed(
      mt: MetaTable,
      entities: DataFrame,
      outDir: String,
      dimCols: Seq[String] = Nil
  ): PublishReport = {
    val spark = mt.df.sparkSession
    val adapted = adaptTableForGrapher(mt, entities)
    val entityCols = Seq("entityId", "entityCode", "entityName", "year")
      .filter(adapted.df.columns.contains)
    val valueCols = adapted.df.columns.toSeq
      .filterNot(c => entityCols.contains(c) || dimCols.contains(c))
    val entries = yieldWideEntries(adapted, entityCols, dimCols, valueCols)
    val long = publishLong(adapted.df, entries, entityCols, dimCols, valueCols)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // ---- checksum gate (to_db.py:209-220): skip rewriting variables whose
    // data AND metadata are unchanged since the last publish. Data hash is
    // order-invariant (sum of row hashes + count fold, to_db.py:378-380),
    // computed for ALL variables in ONE map-side-combinable aggregation over
    // the melted frame (output is variable-count-sized, never row-sized);
    // the metadata hash is a driver-side md5 of the rendered meta. At 100 TB
    // the win is write amplification: a republish with one changed column
    // rewrites one partition dir, not every variable's.
    val hashRows = long
      .select(col("variable"),
        Checksums.rowHash(long, entityCols :+ "value")
          .cast("decimal(38,0)").as("h"))
      .groupBy("variable")
      .agg(sum(col("h")).as("s"), count(lit(1)).as("n"))
      .collect()
    val dataHash: Map[String, String] = hashRows.map { r =>
      val s = if (r.isNullAt(1)) 0L else r.getDecimal(1).toBigInteger.longValue()
      r.getString(0) -> java.lang.Long.toHexString(
        s ^ (r.getLong(2) * 0x9e3779b97f4a7c15L))
    }.toMap
    def metaHashOf(e: WideEntry): String =
      Checksums.md5Hex((e.shortName, e.meta, entityCols).toString)
    // previous checksums are trusted only if the variable's DATA dir still
    // exists — a checksum whose data vanished must force a rewrite
    def prevChecksums(name: String): Option[(String, String)] = {
      val p = checksumPath(outDir, name)
      if (!fs.exists(p) ||
          !fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/variable=$name")))
        None
      else {
        // a truncated/corrupt checksum file (crash mid-create — fs.create
        // is not atomic) must read as "no previous checksum" and force that
        // variable's rewrite, not crash the whole publish
        scala.util.Try {
          val in = fs.open(p)
          try {
            val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
            (node.get("data").asText(), node.get("meta").asText())
          } finally in.close()
        }.toOption.filter(t => t._1 != null && t._2 != null)
      }
    }
    // the data gate and the metadata gate are independent, like the
    // reference's separate data_values / variables upserts: a metadata edit
    // re-stamps the sidecar with zero data IO, a data edit rewrites exactly
    // its own partition dir
    val prev = entries.map(e => e.shortName -> prevChecksums(e.shortName)).toMap
    val dataChanged = entries.filterNot(e => prev(e.shortName).exists(
      _._1 == dataHash.getOrElse(e.shortName, "absent")))
    val metaOnly = entries.filter(e => prev(e.shortName).exists(p =>
      p._1 == dataHash.getOrElse(e.shortName, "absent") && p._2 != metaHashOf(e)))
    val skippedEntries = entries.filter(e => prev(e.shortName).contains(
      (dataHash.getOrElse(e.shortName, "absent"), metaHashOf(e))))

    if (dataChanged.nonEmpty) {
      val changedNames = dataChanged.map(_.shortName)
      long
        .where(col("variable").isin(changedNames: _*))
        .repartition(col("variable"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("variable")
        .parquet(outDir)
    }

    // per-variable metadata sidecar + checksums for the CHANGED variables
    // only (bounded driver loop) — under `_meta/` so Spark's file index
    // never sees it as data. Checksums land after data+sidecar: a crash
    // between leaves a stale checksum that only costs one extra rewrite.
    (dataChanged ++ metaOnly).foreach { e =>
      graft.sources.TableIO.writeSidecar(
        s"$outDir/_meta/variable=${e.shortName}",
        graft.model.TableMeta(e.shortName, title = e.meta.title,
          primaryKey = entityCols, fields = Map(e.shortName -> e.meta)),
        "parquet")
      val out = fs.create(checksumPath(outDir, e.shortName), true)
      try out.write(
        s"""{"data":"${dataHash.getOrElse(e.shortName, "absent")}","meta":"${metaHashOf(e)}"}"""
          .getBytes("UTF-8"))
      finally out.close()
    }

    // ghost cleanup: delete variable dirs not re-emitted (to_db.py:416)
    val emitted = entries.map(_.shortName).toSet
    for (root <- Seq(new org.apache.hadoop.fs.Path(outDir),
        new org.apache.hadoop.fs.Path(outDir, "_meta")) if fs.exists(root))
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("variable=") &&
            !emitted.contains(n.stripPrefix("variable=")))
          fs.delete(st.getPath, true)
      }
    PublishReport(entries.map(_.shortName), dataChanged.map(_.shortName),
      metaOnly.map(_.shortName), skippedEntries.map(_.shortName))
  }
}
