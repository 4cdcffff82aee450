package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Dedup

/** Ad-hoc perf diagnosis for the dedup hot path: times each stage of the
  * text-dedup pipeline in isolation so a bench regression can be pinned to
  * shingling, signatures, banding, the pair join, or the CC loop.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    t("docs.count")(docs.count())
    t("normalize+tokens")(docs.select(explode(graft.operators.TextAnalysis.tokens(col("text")))).count())
    t("shingles explode")(docs.select(explode(Dedup.shingles(col("text")))).count())
    t("minhashSignatures")(Dedup.minhashSignatures(docs).count())
    t("minhashLshPairs")(Dedup.minhashLshPairs(docs).count())
    t("ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs).count())
    val pairs = Dedup.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").localCheckpoint()
    t("clustersFromPairs")(Dedup.clustersFromPairs(docs, pairs).count())
    t("curation enrichment only") {
      import graft.operators.TextAnalysis
      docs.select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          TextAnalysis.langPredOf(col("toks")).as("lang_pred"),
          TextAnalysis.qualityOf(col("text"), col("toks")).as("quality"),
          size(col("toks")).as("n_tokens"))
        .count()
    }
    t("curatedCorpus")(graft.operators.Curation.curatedCorpus(docs).count())
    spark.stop()
  }
}
