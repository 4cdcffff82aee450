package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Partitioning

/** End-to-end training-data curation: the LLM-pipeline operators composed
  * the way a production corpus build runs them — language ID → quality
  * gate → near-dup canonicalization → token accounting — as ONE
  * declarative plan.
  *
  * Scale shape: every per-document metric is a column EXPRESSION
  * ([[TextAnalysis.langPredOf]]/[[TextAnalysis.qualityOf]]), so the whole
  * enrichment is a single map stage over one scan — no metric-frame
  * self-joins. The only shuffles are the ones near-dup clustering
  * inherently needs (the prefix-filtered pair join + the label-propagation
  * rounds over the tiny pair set); the final canonical/language/quality
  * filter is free. At 100 TB the enrichment stays embarrassingly parallel
  * and the clustering cost is bounded by the candidate-pair graph, not the
  * corpus.
  */
object Curation {

  /** Curated corpus: keep each near-dup cluster's canonical document
    * (smallest doc_id in the cluster), require predicted-English and a
    * minimum composite quality, report per-doc token counts.
    *
    * Clustering runs over the FULL corpus before the language/quality
    * filters so the canonical choice is stable under filter changes — the
    * usual production ordering (dedup once, re-filter cheaply per corpus
    * recipe).
    */
  def curatedCorpus(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val enriched = Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), col("text"),
        TextAnalysis.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        TextAnalysis.langPredOf(col("toks")).as("lang_pred"),
        TextAnalysis.qualityOf(col("text"), col("toks")).as("quality"),
        size(col("toks")).as("n_tokens"))
    Dedup.nearDupClusters(docs)
      .join(enriched, "doc_id")
      .where(col("doc_id") === col("cluster_id") &&
        col("lang_pred") === "en" && col("quality") >= minQuality)
      .select(col("doc_id"), col("lang_pred"), col("quality"), col("n_tokens"))
  }
}
