package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is partition-layout dependent (same data, different
  * partitioning → different sample) — useless for carving reproducible
  * train/val/test splits at 100 TB. Hash sampling keys the decision on the
  * ROW's identity: stable under repartitioning, re-runs, and engine
  * changes, and evaluated in the scan stage (no shuffle, pushes nothing).
  */
object Sampling {

  /** Keep a row iff the first 8 md5 hex chars of `id || '#' || seed`, read
    * as a 32-bit value, fall below fraction·2^32. Engine-portable (md5 hex
    * matches across engines — same rows selected by the DuckDB oracle). */
  def hashSample(
      df: DataFrame,
      idCol: String,
      fraction: Double,
      seed: Int = 42
  ): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction: $fraction")
    // first 8 md5 hex chars = top 32 bits of the digest: one md5_pair128
    // digest + shift instead of hex-encode + substring + conv string-parse
    // per row — same selected rows bit-for-bit (oracle hash-gated)
    val h = shiftrightunsigned(
      graft.functions.Md5Pair128
        .md5_pair128(col(idCol).cast("string"), lit(s"#$seed"))("a")
        .bitwiseXOR(lit(Long.MinValue)), 32)
    df.where(h < math.round(fraction * 4294967296.0))
  }
}
