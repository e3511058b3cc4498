package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the ngram-jaccard pipeline (throwaway profiling
  * tool): times shingling, the df-cap, the self-join, and cached variants. */
object DebugJaccard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[jac] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val sh = Dedup.shingles(doc, "doc_id", "text", 3)
    time("shingles count (warm1)") { sh.count() }
    time("shingles count (warm2)") { sh.count() }
    time("full query maxDf=64") {
      Dedup.ngramJaccardPairs(doc, "doc_id", "text", 3, 0.5, 64)
        .write.format("noop").mode("overwrite").save()
    }
    time("full query no cap") {
      Dedup.ngramJaccardPairs(doc, "doc_id", "text", 3, 0.5, 0)
        .write.format("noop").mode("overwrite").save()
    }
    val cached = sh.cache()
    time("cache shingles") { cached.count() }
    time("join from cached") {
      val counts = cached.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      val a = cached.select(col("doc_id").as("i"), col("shingle"))
      val b = cached.select(col("doc_id").as("j"), col("shingle"))
      val common = a.join(b, Seq("shingle")).where(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("common"))
      common
        .join(counts.select(col("doc_id").as("i"), col("c").as("ci")), Seq("i"))
        .join(counts.select(col("doc_id").as("j"), col("c").as("cj")), Seq("j"))
        .select(col("i"), col("j"),
          round(col("common") / (col("ci") + col("cj") - col("common")), 6).as("jaccard"))
        .where(col("jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
