package graft

import graft.operators.{Ann, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall evidence for the xxhash64 PRODUCTION hash paths (the DuckDB
  * oracle gates the md5 bases; this measures the paths 100 TB runs use)
  * against exact ground truth on the driver-generated documents +
  * embeddings tables:
  *
  *  - minhash(xxhash64) 8-hash / 4-band LSH candidates vs exact n-gram
  *    Jaccard ≥ 0.5 pairs;
  *  - simhashWide(xxhash64) 4×16-bit banded candidates vs exact 64-bit
  *    Hamming ≤ 3 pairs (pigeonhole says recall MUST be 1.0 — measured to
  *    prove the implementation honors it);
  *  - multi-probe sign-LSH ANN top-1 vs brute-force cosine top-1 (and the
  *    single-probe recall for the multi-probe delta).
  *
  * Prints one JSON line. Env: SPARK_GRAFT_SF_DIR (default sf0.01),
  * SPARK_GRAFT_CPUS. */
object RecallBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()

    // ---- minhash LSH vs exact Jaccard ≥ 0.5 --------------------------------
    val exactJac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.5).select("i", "j").as[(Long, Long)].collect().toSet
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8, n = 3)
    val mhCand = Dedup.minhashLshPairs(sigs, "doc_id", 8, bands = 4)
      .as[(Long, Long)].collect().toSet
    val mhRecall =
      if (exactJac.isEmpty) -1.0
      else exactJac.count(mhCand.contains).toDouble / exactJac.size

    // ---- simhash banding vs exact Hamming ≤ 3 ------------------------------
    val wide = Dedup.simhashWide(docs, "doc_id", "text").cache()
    val l = wide.select(col("doc_id").as("i") +:
      (0 until 4).map(c => col(s"sim$c").as(s"a$c")): _*)
    val r = wide.select(col("doc_id").as("j") +:
      (0 until 4).map(c => col(s"sim$c").as(s"b$c")): _*)
    val ham = (0 until 4).map(c =>
      bit_count(col(s"a$c").bitwiseXOR(col(s"b$c")))).reduce(_ + _)
    // exact all-pairs Hamming (distributed cross join — the measurement
    // oracle, quadratic by design; fine at sf0.01 scale)
    val exactHam = l.crossJoin(r).where(col("i") < col("j"))
      .where(ham <= 3).select("i", "j").as[(Long, Long)].collect().toSet
    val shCand = Dedup.simhashWidePairs(wide, "doc_id", maxHamming = 3)
      .select("i", "j").as[(Long, Long)].collect().toSet
    val shRecall =
      if (exactHam.isEmpty) -1.0
      else exactHam.count(shCand.contains).toDouble / exactHam.size

    // ---- multi-probe ANN top-1 vs brute force ------------------------------
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    val queries = emb.orderBy("vec_id").limit(100).cache()
    def top1(df: DataFrame): Map[Long, Long] =
      df.select("qid", "tid", "cos").as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (q, ts) => q -> ts.maxBy(t => (t._3, -t._2))._2 }
    val truth = top1(Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 1))
    def annRecall(multiProbe: Boolean): Double = {
      val got = top1(Ann.lshTopK(queries, emb, "vec_id", "embedding", 1, dim,
        planes = 4, multiProbe = multiProbe))
      truth.count { case (q, t) => got.get(q).contains(t) }.toDouble / truth.size
    }
    val single = annRecall(false); val multi = annRecall(true)

    println(
      s"""{"metric":"production_hash_recall","sf":"$sfDir","docs":$nDocs,""" +
      s""""minhash_lsh":{"exact_pairs":${exactJac.size},"candidates":${mhCand.size},"recall":${f"$mhRecall%.4f"}},""" +
      s""""simhash_banding":{"exact_pairs":${exactHam.size},"candidates":${shCand.size},"recall":${f"$shRecall%.4f"}},""" +
      s""""ann_lsh_top1":{"queries":${truth.size},"single_probe_recall":${f"$single%.4f"},"multi_probe_recall":${f"$multi%.4f"}}}""")
    spark.stop()
  }
}
