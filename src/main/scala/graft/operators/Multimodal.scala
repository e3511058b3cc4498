package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by batched per-partition map functions
  * (the Scala analogue of `mapInPandas` — one decoder instance per
  * partition, rows streamed through it).
  *
  * Decoders are pluggable, routed on the typed `kind` column: BMP and WAV
  * decode FOR REAL (pure-JVM header parsers below, zero external deps);
  * compressed codecs (jpeg/mp4/...) remain STUBBED (no codec libraries
  * exist in this container): `decodeStub` derives deterministic fake
  * features from the bytes. The Spark-side contract — schema, binary
  * column handling, partition-level batching, feature struct shape — is
  * identical on both paths; swapping a stub for a JNI/OpenCV decoder
  * changes only the function body.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(id: Long, kind: String, media: Array[Byte])

  /** Extracted features (what a real decoder would emit). */
  final case class MediaFeatures(
      id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,    // STUB: derived, not decoded
      height: Int,   // STUB: derived, not decoded
      n_frames: Int, // STUB: frame-sample count a video decoder would yield
      digest: String
  )

  /** STUB decoder ===========================================================
    * A real implementation would decode the codec here (???). Deterministic
    * fake: dimensions from a hash of the bytes, frame count from length.
    * Marked stub per the builder contract. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val n = if (r.media == null) 0L else r.media.length.toLong
    val digest = graft.ops.Checksums.md5Hex(
      if (r.media == null) "" else new String(r.media, "ISO-8859-1"))
    val h = Integer.parseInt(digest.substring(0, 4), 16)
    MediaFeatures(
      id = r.id,
      kind = r.kind,
      n_bytes = n,
      width = 64 + (h % 256),
      height = 64 + (h >> 8),
      n_frames = (n / 256 + 1).toInt,
      digest = digest)
  }

  /** REAL decoder: BMP header parse (pure JVM, zero external deps).
    * Validates the 'BM' magic, reads width/height as little-endian int32 at
    * offsets 18/22 (BITMAPINFOHEADER); a negative height encodes top-down
    * row order → absolute value. Single image → n_frames = 1. */
  def decodeBmp(r: MediaRow): MediaFeatures = {
    val b = r.media
    require(b != null && b.length >= 26 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
      s"not a BMP payload (id=${r.id})")
    def le32(off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    MediaFeatures(
      id = r.id, kind = r.kind, n_bytes = b.length.toLong,
      width = le32(18), height = math.abs(le32(22)), n_frames = 1,
      digest = graft.ops.Checksums.md5Hex(new String(b, "ISO-8859-1")))
  }

  /** REAL decoder: WAV (RIFF) header parse. Validates 'RIFF'/'WAVE', reads
    * the fmt chunk (channels LE16 @+2, sample rate LE32 @+4, block align
    * LE16 @+12 within the chunk body) and walks the chunk list to the
    * 'data' chunk. Feature mapping for audio: width = sample rate (Hz),
    * height = channel count, n_frames = sample frames (data bytes /
    * block align). */
  def decodeWav(r: MediaRow): MediaFeatures = {
    val b = r.media
    def tag(off: Int): String =
      if (b.length < off + 4) "" else new String(b, off, 4, "US-ASCII")
    require(b != null && b.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"not a WAV payload (id=${r.id})")
    def le16(off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    def le32(off: Int): Int =
      le16(off) | ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    var off = 12
    var channels = 0; var sampleRate = 0; var blockAlign = 0; var dataLen = -1L
    while (off + 8 <= b.length && dataLen < 0) {
      val id = tag(off); val size = le32(off + 4)
      id match {
        case "fmt " =>
          channels = le16(off + 10); sampleRate = le32(off + 12)
          blockAlign = le16(off + 20)
        case "data" => dataLen = size.toLong
        case _      => ()
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    require(dataLen >= 0 && blockAlign > 0, s"malformed WAV (id=${r.id})")
    MediaFeatures(
      id = r.id, kind = r.kind, n_bytes = b.length.toLong,
      width = sampleRate, height = channels,
      n_frames = (dataLen / blockAlign).toInt,
      digest = graft.ops.Checksums.md5Hex(new String(b, "ISO-8859-1")))
  }

  /** Pluggable decoder dispatch, routed on the typed `kind` metadata column
    * (never magic-sniffing the payload — a text body may begin with 'BM').
    * image/bmp and audio/wav decode for real; every other kind takes the
    * declared stub. */
  def decode(r: MediaRow): MediaFeatures = r.kind match {
    case "image/bmp" => decodeBmp(r)
    case "audio/wav" => decodeWav(r)
    case _           => decodeStub(r)
  }

  /** Batched feature extraction: one decoder per partition, rows streamed —
    * the mapInPandas-shaped plumbing. Binary payloads never shuffle: the
    * map runs in the scan stage; only the (small) feature rows move on.
    * `decoder` defaults to the kind-routed dispatch (real BMP/WAV parsers,
    * stub otherwise). */
  def extractFeatures(
      spark: SparkSession,
      media: Dataset[MediaRow],
      decoder: MediaRow => MediaFeatures = decode
  ): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (expensive handle reuse)
      rows.map(decoder)
    }
  }

  /** Frame sampling plumbing: one row per sampled frame index, stride-based
    * (every `stride`-th frame up to `maxFrames` per media row) — the
    * sequence+explode fan-out a video pipeline feeds to the decoder. The
    * decode of each sampled frame is the stubbed step; the row explosion,
    * bounds and ordering are the real Spark-side contract. */
  def sampleFrames(
      features: DataFrame, // needs (id, n_frames)
      stride: Int,
      maxFrames: Int
  ): DataFrame = {
    require(stride >= 1 && maxFrames >= 1)
    val lastFrame = least(col("n_frames") - 1,
      lit((maxFrames - 1).toLong * stride))
    features
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), lastFrame.cast("long"), lit(stride.toLong)))))
  }

  /** Repartition media rows so each OUTPUT partition's payload volume is
    * bounded by `targetBytesPerPartition` (± one row) — binary columns
    * dominate size, so balancing by row count (plain round-robin) leaves
    * byte-skewed partitions when payload sizes vary by orders of magnitude.
    *
    * Scheme (one tiny stats job + one shuffle, fully distributed):
    *  1. per-input-partition byte totals → driver (numPartitions rows);
    *  2. running byte sum within each input partition (window partitioned by
    *     `spark_partition_id`, never a global window) + the partition's
    *     prefix offset = a global byte offset per row;
    *  3. chunk = floor(offset / target); an IDENTITY partitioner on the
    *     chunk id (chunk i → partition i) makes every output partition
    *     exactly one ≈target-byte chunk. This is the one step Spark SQL
    *     can't express (repartitionByRange samples by ROW count and
    *     repartition hashes, both re-skew), so it drops to an RDD
    *     `Partitioner` for the shuffle only.
    */
  def repartitionByPayload(
      df: DataFrame,
      bytesCol: String,
      targetBytesPerPartition: Long
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withPid = df.withColumn("__pid", spark_partition_id())
    val perPart = withPid.groupBy("__pid")
      .agg(sum(col(bytesCol)).as("__bytes"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = perPart.scanLeft(0L)(_ + _._2)
    val offsetMap = perPart.map(_._1).zip(offsets).toMap
    val total = offsets.lastOption.getOrElse(0L)
    val target = math.max(1L, targetBytesPerPartition)
    val parts = math.max(1, (total / target).toInt + 1)
    // map-literal lookup, not a when-chain: a fold of P when() branches makes
    // the expression tree O(P) — at 10k input partitions that's a 10k-deep
    // CaseWhen that blows up analysis and codegen. element_at on a map
    // literal is a single O(1)-depth expression whatever P is.
    val offsetExpr = coalesce(
      try_element_at(typedLit(offsetMap), col("__pid")), lit(0L))
    val w = Window.partitionBy("__pid")
      .orderBy(monotonically_increasing_id())
      .rowsBetween(Window.unboundedPreceding, 0)
    val chunked = withPid
      .withColumn("__chunk",
        least(floor((offsetExpr + sum(col(bytesCol)).over(w)) / lit(target)),
          lit(parts - 1L)))
      .drop("__pid")
    val chunkIdx = chunked.schema.fieldIndex("__chunk")
    val outSchema = org.apache.spark.sql.types.StructType(
      chunked.schema.filterNot(_.name == "__chunk"))
    val identity = new org.apache.spark.Partitioner {
      override def numPartitions: Int = parts
      override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
    }
    val rdd = chunked.rdd
      .map(r => r.getLong(chunkIdx) ->
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq.patch(chunkIdx, Nil, 1)))
      .partitionBy(identity)
      .map(_._2)
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
