package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader — the reference's `read_excel`
  * (/root/reference/lib/catalog/owid/catalog/core/tables.py:2431 zoo).
  *
  * An .xlsx file is a ZIP of XML parts; the JDK's java.util.zip +
  * javax.xml.stream decode it with ZERO new dependencies. Supported
  * surface (the snapshot-ingest subset): one worksheet, shared and inline
  * strings, numbers, booleans, blank cells; row 1 as header (like
  * pandas.read_excel default). All values come back as strings — types are
  * cast downstream (repack/astype), exactly the readFwf/csv discipline.
  * Driver-side parse: an excel snapshot is a single small ingest unit (the
  * reference loads it whole into pandas too); the lake path stays parquet.
  */
object ExcelIO {

  private def readEntry(zf: java.util.zip.ZipFile, name: String): Option[Array[Byte]] =
    Option(zf.getEntry(name)).map { e =>
      val in = zf.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  /** sharedStrings.xml → indexed string table (concatenating rich-text
    * runs' <t> fragments per <si>). */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val r = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t"  => inT = true
            case _    => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT && cur != null =>
          cur.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += cur.toString; cur = null
            case "t"  => inT = false
            case _    => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC7" → 0-based column index (A=0, Z=25, AA=26…). */
  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  /** sheet XML → rows of (colIdx → string value). */
  private def parseSheet(
      bytes: Array[Byte],
      shared: IndexedSeq[String]
  ): Seq[Map[Int, String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Map[Int, String]]
    val r = javax.xml.stream.XMLInputFactory.newInstance()
      .createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
    var row: scala.collection.mutable.Map[Int, String] = null
    var cellCol = -1; var cellType = ""; var inV = false
    var v: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = scala.collection.mutable.Map.empty
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r"))
                .map(colIndex).getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" | "t" => inV = true; v = new StringBuilder
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" =>
              inV = false
              if (row != null && cellCol >= 0) {
                val s = v.toString
                val value = cellType match {
                  case "s"            => shared(s.trim.toInt) // shared-string index
                  case "b"            => if (s.trim == "1") "true" else "false"
                  case _              => s // number / inline <t> / formula cache
                }
                row(cellCol) = value
              }
            case "row" => rows += row.toMap; row = null
            case _     => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.toSeq
  }

  /** Read one sheet of an .xlsx as a DataFrame of strings, row 1 = header.
    * `sheet` is 1-based (xl/worksheets/sheetN.xml). */
  def read(spark: SparkSession, path: String, sheet: Int = 1): DataFrame = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val shared = readEntry(zf, "xl/sharedStrings.xml")
        .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
      val sheetBytes = readEntry(zf, s"xl/worksheets/sheet$sheet.xml")
        .getOrElse(throw new IllegalArgumentException(
          s"no sheet $sheet in $path"))
      val rows = parseSheet(sheetBytes, shared)
      require(rows.nonEmpty, s"empty sheet $sheet in $path")
      val headerCells = rows.head
      val nCols = headerCells.keys.max + 1
      val names = (0 until nCols).map(i =>
        headerCells.getOrElse(i, s"col_$i"))
      require(names.distinct.size == names.size,
        s"duplicate header names: ${names.mkString(", ")}")
      val schema = StructType(names.map(n => StructField(n, StringType)))
      val data = rows.tail.map(m =>
        Row.fromSeq((0 until nCols).map(i => m.get(i).orNull)))
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(data.asJava, schema)
    } finally zf.close()
  }
}
