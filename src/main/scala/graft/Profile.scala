package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.operators.Dedup

/** Ad-hoc perf diagnosis for hot paths: times each stage of a pipeline in
  * isolation so a bench regression can be pinned to a stage. Modes
  * (arg 0): `dedup` (default) — the text-dedup chain; `sage` — the
  * GraphSAGE sampling chain (round-15 verdict item 1: the
  * graph_sage_sample 10x smoke ratio drifted 7.1x → 10.5x with a wide
  * spread; this isolates the adjacency build from the hop joins).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("dedup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      graft.engine.OpCache.release(spark)
      spark.catalog.clearCache()
    }
    if (mode == "sage") { sageProfile(spark, sfDir); spark.stop(); return }
    val docs = Tables.documents(spark, sfDir)
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

  /** Stage isolation for graph_sage_sample: per stage, 3 samples each
    * (the watch item is recording VARIANCE, so one sample per stage
    * can't adjudicate it).
    */
  private def sageProfile(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Graph
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      graft.engine.OpCache.release(spark)
      spark.catalog.clearCache()
    }
    val edges = Graph.sharedTradeEdges(
      Tables.orders(spark, sfDir), Tables.lineitem(spark, sfDir),
      cacheKey = sfDir)
    val seeds = Tables.customer(spark, sfDir)
      .where(col("c_custkey") % 97 === 1)
      .select(concat(lit("c:"), col("c_custkey")).as("seed"))
    t("edges (published) scan")(edges.count())
    t("seeds.count")(seeds.count())
    for (i <- 1 to 3) {
      // the |E|-shaped part: symmetrize + distinct + per-source window
      t(s"adjacency build #$i")(Graph.sageAdjacency(edges, 3).count())
      // the serving part: hop joins against the PUBLISHED adjacency
      val adj = Graph.sharedSageAdjacency(edges, cacheKey = sfDir)
      t(s"hops on published adj #$i")(
        Graph.sageSample(edges, seeds, adjacency = Some(adj)).count())
      // the pre-round-16 query shape: adjacency rebuilt inline per call
      t(s"full inline sageSample #$i")(Graph.sageSample(edges, seeds).count())
      // the bench spelling (orderBy + full-width hash fold)
      t(s"query w/ published adj #$i") {
        val df = Graph.sageSample(edges, seeds, adjacency = Some(adj))
          .orderBy("seed", "hop", "parent", "branch")
        df.selectExpr("bit_xor(xxhash64(struct(*)))").collect(); df.count()
      }
    }
  }
}
