package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language-ID (marker n-gram
  * heuristic), quality scoring, token counting, document fingerprinting.
  * All pure column algebra (codegen'd) — per-row maps that run inside the
  * scan stage at any scale.
  */
object TextAnalysis {

  /** Language marker sets (function-word heuristic). */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "das", "und")
  )

  private def toks(text: Column): Column = split(text, " ")

  /** Count of tokens from a marker set. The obvious
    * `size(filter(split(...), isin))` is a higher-order function —
    * CodegenFallback with an interpreted per-element predicate over a
    * materialized token array; `token_set_count` is one codegen'd byte
    * pass (see TokenSetCountExpr), value-identical. */
  def markerCount(text: Column, words: Seq[String]): Column =
    TokenSetCount.token_set_count(text, words)

  /** Predicted language via explicit comparison chain (deterministic ties:
    * en > es > de). */
  def langPred(cEn: Column, cEs: Column, cDe: Column): Column =
    when(cEn >= cEs && cEn >= cDe, "en")
      .when(cEs >= cDe, "es")
      .otherwise("de")

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish token count: words | digit runs | single non-alnum marks. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Punctuation count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?]"), lit(0)))

  /** Stopword ratio against the `en` marker set. */
  def stopwordRatio(text: Column): Column =
    round(markerCount(text, markers.head._2).cast("double") /
      wsTokenCount(text), 6)

  /** Composite quality score in [0,1]: length, stopword, punctuation
    * signals (the reference-style heuristic filter for web text). */
  def qualityScore(text: Column): Column = {
    val nTok = wsTokenCount(text).cast("double")
    val stop = markerCount(text, markers.head._2).cast("double") / nTok
    val punct = punctCount(text).cast("double")
    round(
      lit(0.4) * least(lit(1.0), nTok / 100.0) +
        lit(0.3) * (lit(1.0) - least(lit(1.0), stop * 5.0)) +
        lit(0.3) * least(lit(1.0), punct / 10.0),
      6)
  }

  /** Document fingerprint: digest of whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Gopher-style repetition signal: fraction of DUPLICATED word n-grams,
    * 1 − distinct/total (0 = no repetition, →1 = highly repetitive — the
    * filter that catches boilerplate/spam pages). Single scan-stage
    * expression: total from the token count, distinct via the native
    * word_ngrams expression (hash-set dedup in one pass). NULL for docs
    * with fewer than n tokens. */
  def duplicateNgramFrac(text: Column, n: Int = 3): Column = {
    val total = size(split(text, " ")) - (n - 1)
    val dist = size(NgramExpression.word_ngrams(text, n))
    when(total >= 1,
      round(lit(1.0) - dist.cast("double") / total, 6)).otherwise(lit(null))
  }

  /** Corpus vocabulary: the k most frequent tokens with counts — the
    * token-frequency pass a BPE/vocab trainer starts from. One explode +
    * one hash aggregation (map-side partial: hot tokens collapse per
    * partition before the shuffle), then a driver-bounded top-k. Ties
    * broken by token for a deterministic cut. */
  def topKTokens(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      k: Int
  ): org.apache.spark.sql.DataFrame =
    df.select(explode(split(col(textCol), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(k)
}
