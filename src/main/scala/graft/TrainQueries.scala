package graft

import graft.functions.TextAnalysis
import graft.operators.{Ann, Dedup, Multimodal, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the `documents` and `embeddings`
  * tables: dedup family, similarity search, text analysis, multimodal
  * plumbing — each with a DuckDB oracle.
  */
object TrainQueries {
  import Queries.t

  // DuckDB shingle CTE shared by the dedup oracles (3-gram word shingles,
  // distinct per doc) — mirrors Dedup.shingles.
  private val shingleCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
      |       FROM toks, UNNEST(GENERATE_SERIES(1, len(l)-2)) AS u(i)
      |       WHERE len(l) >= 3)""".stripMargin

  // ------------------------------------------------------------- exact dedup

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedupGroups(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("h")

  val qDedupExactSql: String =
    """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
      |FROM documents GROUP BY 1 ORDER BY h""".stripMargin

  // ----------------------------------------------------------- n-gram jaccard

  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5, maxDf = 64)
      .orderBy("i", "j")

  // document-frequency cap mirrored: shingles in > 64 docs are dropped in
  // BOTH engines before the self-join (Dedup.ngramJaccardPairs maxDf)
  val qNgramJaccardSql: String =
    s"""WITH $shingleCte,
       |shc AS (SELECT sh.* FROM sh
       |        JOIN (SELECT shingle FROM sh GROUP BY shingle
       |              HAVING COUNT(*) <= 64) ok USING (shingle)),
       |cnt AS (SELECT doc_id, COUNT(*) AS c FROM shc GROUP BY 1),
       |pairs AS (
       |  SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS common
       |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i, j, jaccard FROM (
       |  SELECT i, j, ROUND(common * 1.0 / (ca.c + cb.c - common), 6) AS jaccard
       |  FROM pairs JOIN cnt ca ON i = ca.doc_id JOIN cnt cb ON j = cb.doc_id)
       |WHERE jaccard >= 0.5 ORDER BY i, j""".stripMargin

  // ------------------------------------------------------------ minhash + lsh

  def qMinhashSig(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashSignatures(t(spark, dir, "documents"), "doc_id", "text",
        numHashes = 8, n = 3, md5Based = true)
      .orderBy("doc_id")

  val qMinhashSigSql: String = {
    val hashes = (0 until 8)
      .map(k => s"MIN(md5(shingle || '#$k')) AS h$k").mkString(",\n  ")
    s"""WITH $shingleCte
       |SELECT doc_id,
       |  $hashes
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def qMinhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSignatures(t(spark, dir, "documents"), "doc_id",
      "text", numHashes = 8, n = 3, md5Based = true)
    Dedup.minhashLshPairs(sig, "doc_id", numHashes = 8, bands = 4)
      .orderBy("i", "j")
  }

  val qMinhashLshPairsSql: String = {
    val hashes = (0 until 8)
      .map(k => s"MIN(md5(shingle || '#$k')) AS h$k").mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      s"SELECT doc_id, $b AS band, md5(h${2 * b} || '|' || h${2 * b + 1}) AS bk FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH $shingleCte,
       |sig AS (SELECT doc_id, $hashes FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects)
       |SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
       |ORDER BY i, j""".stripMargin
  }

  // ---------------------------------------------------------------- simhash

  def qSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(spark, dir, "documents"), "doc_id", "text", bits = 16)
      .orderBy("doc_id")

  /** SimHash banded near-dup candidates, Hamming ≤ 3 over a 64-bit
    * signature split into 4×16-bit bands (the scale parametrization:
    * band-key space 2^16 per band, so LSH buckets shrink as the corpus
    * grows — vs the 16-bit variant's constant 16-value band space whose
    * candidates grow n²/16). md5-based basis here so DuckDB mirrors it
    * bit-for-bit; production default is the xxhash64 basis
    * (Dedup.simhashWide md5Based=false, covered by TrainOpsSpec). */
  def qSimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.simhashWide(t(spark, dir, "documents"), "doc_id", "text",
      md5Based = true)
    Dedup.simhashWidePairs(sig, "doc_id", maxHamming = 3)
      .orderBy("i", "j")
  }

  val qSimhashPairsSql: String = {
    val bandJoins = (0 until 4).map(c => s"s1.sim$c = s2.sim$c").mkString(" OR ")
    val hamming = (0 until 4)
      .map(c => s"bit_count(xor(s1.sim$c, s2.sim$c))").mkString(" + ")
    s"""WITH sims AS ($qSimhashWideInner)
       |SELECT DISTINCT s1.doc_id AS i, s2.doc_id AS j,
       |  CAST($hamming AS INTEGER) AS hamming
       |FROM sims s1 JOIN sims s2
       |  ON s1.doc_id < s2.doc_id AND ($bandJoins)
       |WHERE $hamming <= 3
       |ORDER BY i, j""".stripMargin
  }

  /** The wide (4×16-bit chunk) simhash in portable SQL: chunk c's 16-bit
    * basis value is hex chars [4c+1, 4c+4] of md5(token). */
  private lazy val qSimhashWideInner: String = {
    def hexVal(c: Int): String =
      (1 to 4).map { p =>
        val mult = math.pow(16, 4 - p).toLong
        s"(STRPOS('0123456789abcdef', SUBSTR(md5(tok), ${c * 4 + p}, 1)) - 1) * $mult"
      }.mkString(" + ")
    val hvCols = (0 until 4).map(c => s"${hexVal(c)} AS v$c").mkString(",\n    ")
    val bitSums = (for { c <- 0 until 4; b <- 0 until 16 } yield
      s"SUM(CASE WHEN (v$c // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s${c}_$b")
      .mkString(",\n    ")
    val sigs = (0 until 4).map { c =>
      (0 until 16)
        .map(b => s"(CASE WHEN s${c}_$b > 0 THEN ${1L << b} ELSE 0 END)")
        .mkString(" + ") + s" AS sim$c"
    }.mkString(",\n  ")
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
       |hv AS (SELECT doc_id,
       |    $hvCols
       |  FROM toks),
       |sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id)
       |SELECT doc_id,
       |  $sigs
       |FROM sums""".stripMargin
  }

  private lazy val qSimhashInner: String = {
    val hexVal =
      (1 to 4).map { p =>
        val mult = math.pow(16, 4 - p).toLong
        s"(STRPOS('0123456789abcdef', SUBSTR(md5(tok), $p, 1)) - 1) * $mult"
      }.mkString(" + ")
    val bitSums = (0 until 16)
      .map(b => s"SUM(CASE WHEN (v // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(",\n    ")
    val sig = (0 until 16)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
       |hv AS (SELECT doc_id, $hexVal AS v FROM toks),
       |sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id)
       |SELECT doc_id, $sig AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  val qSimhashSql: String = qSimhashInner

  /** Transitive duplicate clusters over the simhash near-dup pairs: every
    * doc in a pair labeled with the min doc id of its connected component
    * (Dedup.dupClusters — the keep-one-per-group terminal step). */
  def qDupClusters(spark: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.simhashWide(t(spark, dir, "documents"), "doc_id", "text",
      md5Based = true)
    val pairs = Dedup.simhashWidePairs(sig, "doc_id", maxHamming = 3)
    Dedup.dupClusters(pairs.select("i", "j")).orderBy("id")
  }

  val qDupClustersSql: String = {
    val bandJoins = (0 until 4).map(c => s"s1.sim$c = s2.sim$c").mkString(" OR ")
    val hamming = (0 until 4)
      .map(c => s"bit_count(xor(s1.sim$c, s2.sim$c))").mkString(" + ")
    s"""WITH RECURSIVE sims AS ($qSimhashWideInner),
       |pairs AS (
       |  SELECT DISTINCT s1.doc_id AS i, s2.doc_id AS j
       |  FROM sims s1 JOIN sims s2
       |    ON s1.doc_id < s2.doc_id AND ($bandJoins)
       |  WHERE $hamming <= 3),
       |edges AS (SELECT i AS a, j AS b FROM pairs
       |          UNION SELECT j, i FROM pairs),
       |reach(id, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
       |  UNION
       |  SELECT e.a, re.r FROM edges e JOIN reach re ON e.b = re.id)
       |SELECT id, MIN(r) AS label FROM reach GROUP BY id ORDER BY id""".stripMargin
  }

  /** Deterministic 25% hash sample (split-stable train/val carving). */
  def qHashSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.hashSample(
      t(spark, dir, "documents").select(col("doc_id"), col("lang")),
      "doc_id", 0.25, seed = 7)
      .orderBy("doc_id")

  val qHashSampleSql: String = {
    val hexVal = (1 to 8).map { p =>
      val mult = math.pow(16, 8 - p).toLong
      s"(STRPOS('0123456789abcdef', SUBSTR(md5(doc_id::VARCHAR || '#7'), $p, 1)) - 1) * $mult"
    }.mkString(" + ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE $hexVal < ${math.round(0.25 * 4294967296.0)}
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-doc duplicated-3-gram fraction (Gopher repetition filter). */
  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextAnalysis.duplicateNgramFrac(col("text"), 3)
          .as("dup_frac"))
      .orderBy("doc_id")

  val qRepetitionSql: String =
    s"""WITH $shingleCte,
       |dn AS (SELECT doc_id, COUNT(*) AS d FROM sh GROUP BY 1)
       |SELECT t.doc_id,
       |  CASE WHEN len(l) - 2 >= 1
       |       THEN ROUND(1.0 - d * 1.0 / (len(l) - 2), 6) END AS dup_frac
       |FROM toks t LEFT JOIN dn ON t.doc_id = dn.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Contamination vs a benchmark set (= the shingles of docs 0-9 here):
    * fraction of each doc's distinct shingles found in the benchmark. */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val bench = Dedup.shingles(docs.filter(col("doc_id") < 10), "doc_id", "text", 3)
      .select("shingle")
    Dedup.contaminationFrac(docs, "doc_id", "text", bench, 3)
      .orderBy("doc_id")
  }

  val qContaminationSql: String =
    s"""WITH $shingleCte,
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 10)
       |SELECT doc_id,
       |  ROUND(SUM(CASE WHEN shingle IN (SELECT shingle FROM bench)
       |            THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS contaminated_frac
       |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Top-50 corpus vocabulary with counts (BPE/vocab trainer input). */
  def qVocabTopK(spark: SparkSession, dir: String): DataFrame =
    graft.functions.TextAnalysis.topKTokens(t(spark, dir, "documents"), "text", 50)
      .orderBy(col("cnt").desc, col("tok"))

  val qVocabTopKSql: String =
    """SELECT tok, COUNT(*) AS cnt
      |FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
      |WHERE LEN(tok) > 0
      |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50""".stripMargin

  // --------------------------------------------------------------- ANN / cos

  private val cosSql =
    """ROUND(list_dot_product(qv::DOUBLE[], tv::DOUBLE[]) /
      |    (SQRT(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))
      |     * SQRT(list_dot_product(tv::DOUBLE[], tv::DOUBLE[]))), 6)""".stripMargin

  /** Brute-force cosine top-10 for 3 query vectors (the ANN baseline). */
  def qAnnTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Ann.bruteForceTopK(emb.filter(col("vec_id") < 3), emb,
        "vec_id", "embedding", k = 10)
      .orderBy(col("qid"), col("cos").desc, col("tid"))
  }

  val qAnnTopKSql: String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
       |tt AS (SELECT vec_id AS tid, embedding AS tv FROM embeddings)
       |SELECT qid, tid, cos FROM (
       |  SELECT qid, tid, $cosSql AS cos
       |  FROM tt, q WHERE qid <> tid)
       |QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, tid) <= 10
       |ORDER BY qid, cos DESC, tid""".stripMargin

  /** Embedding near-dup within coarse cells (IVF-style pruning by label),
    * cells capped at 48 members via id-modulus sub-bucketing (mirrored in
    * the oracle). */
  def qEmbeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDup(t(spark, dir, "embeddings"), "vec_id", "embedding",
        "label", threshold = 0.3, maxCellSize = 48)
      .orderBy("i", "j")

  val qEmbeddingNearDupSql: String =
    s"""WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
       |e AS (SELECT embeddings.*, CAST(CEIL(n / 48.0) AS BIGINT) AS nsub
       |      FROM embeddings JOIN c USING (label))
       |SELECT i, j, cos FROM (
       |  SELECT a.vec_id AS i, b.vec_id AS j,
       |    ${cosSql.replace("qv", "a.embedding").replace("tv", "b.embedding")} AS cos
       |  FROM e a JOIN e b
       |    ON a.label = b.label AND a.vec_id % a.nsub = b.vec_id % b.nsub
       |   AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.3 ORDER BY i, j""".stripMargin

  // ------------------------------------------------------------ text analysis

  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val doc = t(spark, dir, "documents")
    val withCounts = doc.select(
      col("doc_id"),
      TextAnalysis.markerCount(col("text"), TextAnalysis.markers(0)._2)
        .cast("long").as("c_en"),
      TextAnalysis.markerCount(col("text"), TextAnalysis.markers(1)._2)
        .cast("long").as("c_es"),
      TextAnalysis.markerCount(col("text"), TextAnalysis.markers(2)._2)
        .cast("long").as("c_de"))
    withCounts
      .withColumn("pred",
        TextAnalysis.langPred(col("c_en"), col("c_es"), col("c_de")))
      .orderBy("doc_id")
  }

  val qLangIdSql: String =
    """SELECT doc_id, c_en, c_es, c_de,
      |  CASE WHEN c_en >= c_es AND c_en >= c_de THEN 'en'
      |       WHEN c_es >= c_de THEN 'es' ELSE 'de' END AS pred
      |FROM (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and'))) AS c_en,
      |    len(list_filter(string_split(text,' '), x -> x IN ('el','la','de','y'))) AS c_es,
      |    len(list_filter(string_split(text,' '), x -> x IN ('der','die','das','und'))) AS c_de
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  def qQualityScore(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.punctCount(col("text")).cast("long").as("punct_cnt"),
        TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val qQualityScoreSql: String =
    """SELECT doc_id, n_tokens, punct_cnt,
      |  ROUND(c_en * 1.0 / n_tokens, 6) AS stop_ratio,
      |  ROUND(0.4 * LEAST(1.0, n_tokens / 100.0)
      |      + 0.3 * (1.0 - LEAST(1.0, (c_en * 1.0 / n_tokens) * 5.0))
      |      + 0.3 * LEAST(1.0, punct_cnt / 10.0), 6) AS quality
      |FROM (
      |  SELECT doc_id,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    len(regexp_extract_all(text, '[.,!?]')) AS punct_cnt,
      |    len(list_filter(string_split(text,' '), x -> x IN ('the','a','of','and'))) AS c_en
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  def qTokenCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).cast("long").as("ws_tokens"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  val qTokenCountSql: String =
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val qFingerprintSql: String =
    """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- multimodal

  /** Binary-column plumbing: text bytes as the opaque payload, features via
    * the per-partition decode stub (Multimodal.extractFeatures). */
  def qMultimodal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = t(spark, dir, "documents")
      .select(col("doc_id").as("id"), lit("text/utf-8").as("kind"),
        encode(col("text"), "UTF-8").as("media"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFeatures(spark, media)
      .toDF()
      .select(col("id").as("doc_id"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"), col("digest"))
      .orderBy("doc_id")
  }

  val qMultimodalSql: String = {
    val hexVal =
      (1 to 4).map { p =>
        val mult = math.pow(16, 4 - p).toLong
        s"(STRPOS('0123456789abcdef', SUBSTR(md5(text), $p, 1)) - 1) * $mult"
      }.mkString(" + ")
    s"""SELECT doc_id, n_bytes,
       |  64 + v % 256 AS width,
       |  64 + v // 256 AS height,
       |  n_bytes // 256 + 1 AS n_frames, digest
       |FROM (
       |  SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes,
       |    $hexVal AS v, md5(text) AS digest
       |  FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // -------------------------------------------------------------- registry

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_dedup_exact" -> ((qDedupExact _, qDedupExactSql)),
    "q_ngram_jaccard" -> ((qNgramJaccard _, qNgramJaccardSql)),
    "q_minhash_sig" -> ((qMinhashSig _, qMinhashSigSql)),
    "q_minhash_lsh_pairs" -> ((qMinhashLshPairs _, qMinhashLshPairsSql)),
    "q_simhash" -> ((qSimhash _, qSimhashSql)),
    "q_simhash_pairs" -> ((qSimhashPairs _, qSimhashPairsSql)),
    "q_dup_clusters" -> ((qDupClusters _, qDupClustersSql)),
    "q_hash_sample" -> ((qHashSample _, qHashSampleSql)),
    "q_vocab_topk" -> ((qVocabTopK _, qVocabTopKSql)),
    "q_repetition" -> ((qRepetition _, qRepetitionSql)),
    "q_contamination" -> ((qContamination _, qContaminationSql)),
    "q_ann_topk" -> ((qAnnTopK _, qAnnTopKSql)),
    "q_embedding_neardup" -> ((qEmbeddingNearDup _, qEmbeddingNearDupSql)),
    "q_lang_id" -> ((qLangId _, qLangIdSql)),
    "q_quality_score" -> ((qQualityScore _, qQualityScoreSql)),
    "q_token_count" -> ((qTokenCount _, qTokenCountSql)),
    "q_fingerprint" -> ((qFingerprint _, qFingerprintSql)),
    "q_multimodal" -> ((qMultimodal _, qMultimodalSql))
  )
}
