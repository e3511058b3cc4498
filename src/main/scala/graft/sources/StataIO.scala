package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Stata .dta reader — the reference's `read_stata`
  * (/root/reference/lib/catalog/owid/catalog/core/tables.py:2431-2749 format
  * zoo), built from scratch on the PUBLIC dta-117/118 format description
  * (Stata's published "Description of .dta file format"): an XML-tagged
  * binary with fixed sections.
  *
  * Parsed sections: `<header>` (release 117|118, byteorder LSF|MSF, K vars,
  * N rows), `<variable_types>` (uint16 per var: 65526 double, 65527 float,
  * 65528 int32, 65529 int16, 65530 int8, 1..2045 fixed-width str#),
  * `<varnames>` (129-byte UTF-8 slots in 118, 33-byte in 117) and `<data>`
  * (row-major fixed width). Stata MISSING sentinels decode to null
  * (double > 8.988e307, float > 1.701e38, int32 > 2147483620,
  * int16 > 32740, int8 > 100). strL (type 32768) fails loudly — the
  * out-of-row blob section is not a tabular ingest shape.
  *
  * Shape mirrors [[FeatherIO]]: the schema comes from one file's header
  * (driver-side), files decode on executors via the binaryFile source with
  * a STREAMING row iterator (per-file heap = raw bytes + one row). A .dta
  * snapshot is a single modest ingest unit in the reference; the lake holds
  * parquet.
  */
object StataIO {

  private final case class Meta(
      release: Int, bigEndian: Boolean, nVars: Int, nRows: Long,
      types: Array[Int], names: Array[String])

  private def findTag(b: Array[Byte], tag: String, from: Int = 0): Int = {
    val t = tag.getBytes("US-ASCII")
    var i = from
    while (i <= b.length - t.length) {
      var j = 0
      while (j < t.length && b(i + j) == t(j)) j += 1
      if (j == t.length) return i
      i += 1
    }
    -1
  }

  private def parseMeta(b: Array[Byte]): Meta = {
    require(findTag(b, "<stata_dta>") == 0, "not a dta 117/118 file")
    val relAt = findTag(b, "<release>") + "<release>".length
    val release = new String(b, relAt, 3, "US-ASCII").toInt
    require(release == 117 || release == 118,
      s"dta release $release unsupported (117/118 only)")
    val boAt = findTag(b, "<byteorder>") + "<byteorder>".length
    val bigEndian = new String(b, boAt, 3, "US-ASCII") == "MSF"
    def buf(at: Int, len: Int) = {
      val bb = java.nio.ByteBuffer.wrap(b, at, len)
      bb.order(if (bigEndian) java.nio.ByteOrder.BIG_ENDIAN
               else java.nio.ByteOrder.LITTLE_ENDIAN)
      bb
    }
    val kAt = findTag(b, "<K>") + 3
    val nVars = buf(kAt, 2).getShort & 0xFFFF
    val nAt = findTag(b, "<N>") + 3
    val nRows =
      if (release == 118) buf(nAt, 8).getLong
      else (buf(nAt, 4).getInt & 0xFFFFFFFFL)
    val tAt = findTag(b, "<variable_types>") + "<variable_types>".length
    val types = Array.tabulate(nVars)(i => buf(tAt + 2 * i, 2).getShort & 0xFFFF)
    require(!types.contains(32768),
      "dta strL columns are unsupported (out-of-row blob section)")
    val slot = if (release == 118) 129 else 33
    val vAt = findTag(b, "<varnames>") + "<varnames>".length
    val names = Array.tabulate(nVars) { i =>
      val raw = b.slice(vAt + slot * i, vAt + slot * (i + 1))
      val end = raw.indexOf(0.toByte) match { case -1 => raw.length; case e => e }
      new String(raw, 0, end, if (release == 118) "UTF-8" else "ISO-8859-1")
    }
    Meta(release, bigEndian, nVars, nRows, types, names)
  }

  private def sparkType(t: Int): DataType = t match {
    case 65526                  => DoubleType
    case 65527                  => FloatType
    case 65528                  => IntegerType
    case 65529                  => ShortType
    case 65530                  => ByteType
    case w if w >= 1 && w <= 2045 => StringType
    case other => throw new IllegalArgumentException(s"dta type $other unsupported")
  }

  private def width(t: Int): Int = t match {
    case 65526 => 8; case 65527 => 4; case 65528 => 4
    case 65529 => 2; case 65530 => 1; case w => w
  }

  def sparkSchema(bytes: Array[Byte]): StructType = {
    val m = parseMeta(bytes)
    StructType(m.names.zip(m.types).map { case (n, t) => StructField(n, sparkType(t)) })
  }

  /** Streaming row iterator over one file's bytes. `expected` (when given)
    * is the driver-side schema every file in a glob must match — a .dta set
    * with differing column order/types must fail loudly, not silently write
    * values into the wrong columns. */
  private def decode(bytes: Array[Byte], expected: Option[StructType] = None): Iterator[Row] = {
    val m = parseMeta(bytes)
    expected.foreach { exp =>
      val got = StructType(m.names.zip(m.types).map { case (n, t) => StructField(n, sparkType(t)) })
      require(got == exp,
        s"dta glob schema mismatch: file has ${got.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")} " +
        s"but first file had ${exp.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")}")
    }
    val dataAt = findTag(bytes, "<data>") + "<data>".length
    val rowWidth = m.types.map(width).sum.toLong
    // Long-arithmetic bounds check: a corrupt header claiming huge nRows must
    // fail with a clear error, not wrap an Int offset into garbage reads.
    require(dataAt + m.nRows * rowWidth <= bytes.length,
      s"dta data section out of bounds: need ${dataAt + m.nRows * rowWidth} bytes " +
      s"(${m.nRows} rows x $rowWidth), file has ${bytes.length}")
    val order = if (m.bigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN
    val charset = if (m.release == 118) "UTF-8" else "ISO-8859-1"
    new Iterator[Row] {
      private var r = 0L
      override def hasNext: Boolean = r < m.nRows
      override def next(): Row = {
        var off = (dataAt + r * rowWidth).toInt
        val vals = new Array[Any](m.nVars)
        var i = 0
        while (i < m.nVars) {
          val t = m.types(i)
          val bb = java.nio.ByteBuffer.wrap(bytes, off, width(t)).order(order)
          vals(i) = t match {
            case 65526 =>
              val v = bb.getDouble; if (v > 8.988465674311579e307) null else v
            case 65527 =>
              val v = bb.getFloat; if (v > 1.7014117e38f) null else v
            case 65528 =>
              val v = bb.getInt; if (v > 2147483620) null else v
            case 65529 =>
              val v = bb.getShort; if (v > 32740) null else v
            case 65530 =>
              val v = bb.get; if (v > 100) null else v
            case w =>
              val raw = bytes.slice(off, off + w)
              val end = raw.indexOf(0.toByte) match { case -1 => w; case e => e }
              new String(raw, 0, end, charset)
          }
          off += width(t)
          i += 1
        }
        r += 1
        Row.fromSeq(vals.toSeq)
      }
    }
  }

  /** Read .dta file(s) at `path` (file or glob). Schema from the first
    * file's header; per-file decode on executors. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val first = files.select("content").head().getAs[Array[Byte]](0)
    val schema = sparkSchema(first)
    val enc = Encoders.row(schema)
    files.select("content").mapPartitions { it =>
      it.flatMap(r => decode(r.getAs[Array[Byte]](0), Some(schema)))
    }(enc)
  }
}
