package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{OpCache, Partitioning, PublishGuard}
import graft.functions.OracleRound

/** Byte-pair-encoding tokenizer TRAINING and SERVING — the missing half
  * of the token-counting surface ([[TextAnalysis.lexTokens]] counts with a
  * fixed lexer; this LEARNS the subword vocabulary from the corpus, the
  * way real LLM tokenizers are built).
  *
  * Scale design (100 TB): the corpus contributes exactly ONE shuffle — the
  * word-frequency aggregation. Everything iterative (the merge-learning
  * loop) runs over the WORD table (vocab-sized, ~10⁷ rows for web text,
  * independent of corpus row count), because pair statistics over words ×
  * frequencies are identical to pair statistics over the raw token stream.
  * Each round is: one map-side pair explode + partial-agg'd count, a
  * 1-ROW driver pull (the argmax pair), and a map-only literal `replace`
  * over the vocab — k rounds, k bounded jobs, lineage cut per round.
  * Serving applies the k learned merges as a chain of k codegen'd literal
  * `replace`es over the DISTINCT words of the serving corpus (merges run
  * once per distinct word, not once per occurrence) and joins back.
  *
  * Word symbolization rides in ONE STRING per word —
  * `"||a||b||c||"` for the symbol sequence [a, b, c] — so that applying a
  * merge (a, b) → ab is the literal replace `"|a||b|"` → `"|ab|"`:
  * left-to-right non-overlapping literal replacement is exactly BPE's
  * greedy merge application, the doubled delimiter keeps adjacent matches
  * from consuming each other's boundary, and the pattern's outer pipes
  * anchor symbol boundaries (symbols are [a-z0-9]+, so `|` never occurs
  * inside one). Both engines' `replace` share these semantics, which is
  * what makes TRAINING itself oracle-replayable, not just serving.
  *
  * No counterpart in the reference (its text handling is JSON field
  * extraction, srapk_structure_streaming.py:141-148).
  */
object Bpe {

  /** One learned merge: at `rank`, (lhs, rhs) → lhs+rhs, chosen with
    * `count` weighted occurrences (the round's argmax).
    */
  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** Words below this corpus frequency don't vote in training (the
    * standard min_frequency knob; hapax noise otherwise dominates the
    * pair tail). Serving tokenizes EVERY word regardless.
    */
  val MinFreq = 2

  private def initialSyms(word: Column): Column =
    concat(lit("||"), regexp_replace(word, "(.)", "$1||"))

  private def symsOf(ws: Column): Column =
    filter(split(ws, "\\|\\|"), x => length(x) > 0)

  private def applyMerge(ws: Column, lhs: String, rhs: String): Column =
    call_function("replace", ws, lit(s"|$lhs||$rhs|"), lit(s"|$lhs$rhs|"))

  private def corpusWords(docs: DataFrame): DataFrame =
    Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)

  /** Train `numMerges` BPE merges. Returns them rank-ordered; ties on
    * pair count break lexicographically on (lhs, rhs) so training is
    * deterministic in any engine.
    */
  def trainMerges(docs: DataFrame, numMerges: Int): Seq[Merge] = {
    // checkpointWithHandle, NOT bare localCheckpoint + Dataset.unpersist:
    // unpersist() only clears CacheManager entries, while localCheckpoint
    // persists an INTERNAL RDD the Dataset API offers no release for —
    // the bare form leaked one vocab-sized RDD per merge round on every
    // cold training (caught by CacheSpec the first time a fresh
    // environment trained the published table inside the suite)
    var (words, freeWords) = OpCache.checkpointWithHandle(
      corpusWords(docs)
        .groupBy(col("word")).agg(count(lit(1)).as("freq"))
        .where(col("freq") >= MinFreq)
        .select(col("freq"), initialSyms(col("word")).as("ws")))
    // corpus lineage ends at the checkpoint; the loop is vocab-only
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (r <- 1 to numMerges) {
        val syms = symsOf(col("ws"))
        val n = size(syms)
        val idx = when(n >= 2, sequence(lit(1), n - 1))
          .otherwise(array().cast("array<int>"))
        val best = words
          .select(col("freq"), explode(transform(idx, i =>
            struct(element_at(syms, i).as("a"),
              element_at(syms, i + 1).as("b")))).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1).collect()
        require(best.nonEmpty,
          s"corpus exhausted all adjacent pairs at merge $r of $numMerges")
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(r, a, b, cnt)
        val (next, freeNext) = OpCache.checkpointWithHandle(
          words.withColumn("ws", applyMerge(col("ws"), a, b)))
        freeWords() // keep the k-round lineage flat, blocks freed per round
        words = next
        freeWords = freeNext
      }
      out.toSeq
    } finally freeWords()
  }

  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, Seq[Merge])]()

  private def docsFingerprint(docs: DataFrame): PublishGuard.Fingerprint =
    PublishGuard.fingerprint(docs, Seq(col("doc_id"), col("text")))

  private def writeMergeTable(
      spark: SparkSession, merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
      .coalesce(1)
      .write.parquet(path)
  }

  /** Canonical published path for a merge table — numMerges is a
    * training hyperparameter and rides the path (the round-15
    * params-in-path discipline), so a changed merge budget trains fresh
    * instead of silently serving the old table.
    */
  def mergesPath(baseDir: String, slug: String, numMerges: Int = 24): String =
    s"$baseDir/${slug}_m$numMerges"

  /** Read-through accessor for the published merge table — same
    * materialized-view contract as [[Similarity.publishedArtifact]].
    * Table rows: (rank, lhs, rhs, merged, pair_count), rank 1..numMerges.
    */
  def publishedMerges(
      docs: DataFrame,
      baseDir: String,
      slug: String,
      numMerges: Int = 24): Seq[Merge] = {
    val spark = docs.sparkSession
    val path = mergesPath(baseDir, slug, numMerges)
    Similarity.publishedArtifact[Seq[Merge]](
      spark, path, s"bpe|$numMerges|$MinFreq",
      docsFingerprint(docs), mergeCache,
      train = () => trainMerges(docs, numMerges),
      write = (m, p) => writeMergeTable(spark, m, p),
      load = () => spark.read.parquet(path).orderBy("rank").collect()
        .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(4))).toSeq,
      what = s"published BPE merges '$slug'")
  }

  /** The published merge table as a DataFrame (the `text_bpe_merges`
    * surface): training's full audit trail, k rows.
    */
  def mergeTable(
      docs: DataFrame, baseDir: String, slug: String,
      numMerges: Int = 24): DataFrame = {
    val merges = publishedMerges(docs, baseDir, slug, numMerges)
    import docs.sparkSession.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** The k-merge replace chain as one codegen'd column expression. */
  private def segmentChain(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(initialSyms(word)) { (c, m) => applyMerge(c, m.lhs, m.rhs) }

  /** Subword token counts per document under the published merges:
    * distinct serving words run the merge chain once, then rejoin the
    * (doc, word) stream and aggregate — (n_words, n_subwords,
    * subwords-per-word). The corpus-side cost is the word explode plus
    * one join keyed on word; the merge chain itself is vocab-sized work.
    */
  def tokenizeStats(
      docs: DataFrame, baseDir: String, slug: String,
      numMerges: Int = 24): DataFrame = {
    val merges = publishedMerges(docs, baseDir, slug, numMerges)
    val words = corpusWords(docs)
    val vocab = words.select(col("word")).distinct()
      .select(col("word"),
        size(symsOf(segmentChain(col("word"), merges))).as("n_syms"))
    words.join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_syms")).as("n_subwords"))
      .select(col("doc_id"), col("n_words"), col("n_subwords"),
        OracleRound.roundN(col("n_subwords") / col("n_words"), 6)
          .as("subword_ratio"))
  }

  /** The `topK` most frequent corpus words with their learned
    * segmentations — the human-readable face of the vocabulary (and the
    * oracle surface that pins the SEGMENTATION STRINGS, not just counts).
    * (freq DESC, word) ordering makes the cut deterministic under ties.
    */
  def topSegmentations(
      docs: DataFrame, baseDir: String, slug: String,
      numMerges: Int = 24, topK: Int = 20): DataFrame = {
    val merges = publishedMerges(docs, baseDir, slug, numMerges)
    corpusWords(docs)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(topK)
      .select(col("word"), col("freq"),
        concat_ws(" ", symsOf(segmentChain(col("word"), merges)))
          .as("segmentation"))
  }
}
