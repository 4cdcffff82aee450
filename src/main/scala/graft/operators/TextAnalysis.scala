package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleRound

/** Text-analysis operators for a large-scale training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * All operators are pure column expressions (whole-stage codegen'd — no
  * UDFs), so they scale linearly with input: no shuffle except the final
  * per-document projection, which is none at all. At 100 TB these run
  * map-only over the parquet scan.
  *
  * The normalization/tokenization base here is shared with the dedup
  * operators (graft.operators.Dedup) so "same document" means the same thing
  * across the pipeline.
  */
object TextAnalysis {

  /** Canonical normalization: lowercase, non-alphanumeric runs → single
    * space, trimmed. Kept deliberately simple so it is expressible in both
    * Spark and the DuckDB oracle (regexp_replace + 'g' flag there).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column =
    split(normalize(text), " ")

  /** BPE-ish lexer tokens: letter runs, digit runs, or single
    * non-alphanumeric marks — a cheap proxy for subword token counting.
    */
  def lexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Small per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Deterministic, oracle-expressible; not a production lexicon.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo", "you", "zai"))

  /** Stopwords for the quality score (English-centric, like the data). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are")

  /** `lang_pred` as a single column expression over a token-array column —
    * the composable form of [[languageId]] (same markers, same max-score +
    * fixed-priority tie-break; OperatorsSpec asserts the two agree on every
    * testdata document). Lets pipelines add language ID as one map-stage
    * column instead of a join against the languageId frame.
    */
  def langPredOf(toks: Column): Column = {
    val d = array_distinct(toks)
    val scores = langMarkers.map { case (_, ws) =>
      size(array_intersect(d, array(ws.map(lit): _*)))
    }
    val best = scores.reduce((a, b) => greatest(a, b))
    langMarkers.zip(scores).foldLeft(when(best <= 0, "und")) {
      case (acc, ((l, _), s)) => acc.when(s === best, lit(l))
    }.otherwise("und")
  }

  /** Composite quality score as a single column expression — the composable
    * form of [[qualityScore]]'s `quality` column (same rounded signals;
    * OperatorsSpec asserts agreement on every testdata document).
    */
  def qualityOf(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val nPunct = (length(text) -
      length(regexp_replace(text, "[^a-z0-9 ]", ""))).cast("double")
    val punctRatio =
      OracleRound.roundN(nPunct / greatest(length(text).cast("double"), lit(1.0)), 4)
    val distinctRatio =
      OracleRound.roundN(size(array_distinct(toks)).cast("double") / nTok, 4)
    OracleRound.roundN(
      when(size(toks) >= 10, lit(0.4)).otherwise(lit(0.0)) +
        when(punctRatio <= 0.1, lit(0.3)).otherwise(lit(0.0)) +
        distinctRatio * 0.3, 4)
  }

  /** Token counting: whitespace tokens + BPE-ish lexer tokens + distinct
    * token count per document. Map-only.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct_tokens"),
      size(lexTokens(col("text"))).as("n_lex_tokens"),
      length(col("text")).as("n_chars_raw"))
  }

  /** Language ID: score = number of *distinct* marker words present, argmax
    * across languages with a fixed priority order for ties (en, de, es, fr,
    * zh, then 'und' when no marker hits at all).
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = array_distinct(tokens(col("text")))
    val scored = docs.select(
      (col("doc_id") +: col("lang").as("lang_actual") +:
        langMarkers.map { case (l, ws) =>
          size(array_intersect(toks, array(ws.map(lit): _*))).as(s"s_$l")
        }): _*)
    val best = langMarkers.map { case (l, _) => col(s"s_$l") }
      .reduce((a, b) => greatest(a, b))
    // `when` chains evaluate in order, so the first language (in langMarkers
    // order) reaching the max score wins — deterministic tie-break.
    val predOrdered = langMarkers.foldLeft(when(best <= 0, "und")) {
      case (acc, (l, _)) => acc.when(col(s"s_$l") === best, lit(l))
    }.otherwise("und")
    scored.select(
      (col("doc_id") +: col("lang_actual") +: predOrdered.as("lang_pred") +:
        langMarkers.map { case (l, _) => col(s"s_$l") }): _*)
  }

  /** Quality scoring: length/punctuation/stopword/repetition signals with a
    * composite 0..1 score. All ratios rounded for oracle stability.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val raw = col("text")
    val toks = tokens(raw)
    val nTok = size(toks).cast("double")
    val nStop = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("double")
    // punctuation = anything that normalization deletes (besides spaces)
    val nPunct = (length(raw) -
      length(regexp_replace(raw, "[^a-z0-9 ]", ""))).cast("double")
    val distinctRatio = size(array_distinct(toks)).cast("double") / nTok
    val df = docs.select(
      col("doc_id"),
      length(raw).as("n_chars"),
      size(toks).as("n_tokens"),
      OracleRound.roundN(nPunct / greatest(length(raw).cast("double"), lit(1.0)), 4).as("punct_ratio"),
      OracleRound.roundN(nStop / greatest(nTok, lit(1.0)), 4).as("stop_hits_ratio"),
      OracleRound.roundN(distinctRatio, 4).as("distinct_ratio"))
    // composite: long enough, low punctuation, some lexical diversity
    df.withColumn("quality",
      OracleRound.roundN(
        when(col("n_tokens") >= 10, lit(0.4)).otherwise(lit(0.0)) +
          when(col("punct_ratio") <= 0.1, lit(0.3)).otherwise(lit(0.0)) +
          col("distinct_ratio") * 0.3, 4))
  }

  /** Document fingerprinting, oracle-checkable half: md5 of the normalized
    * text (exact-dup key) and md5 of the sorted distinct token set
    * (bag-of-words key, order-insensitive).
    */
  def fingerprints(docs: DataFrame): DataFrame = {
    val norm = normalize(col("text"))
    val bag = concat_ws(" ", array_sort(array_distinct(tokens(col("text")))))
    docs.select(
      col("doc_id"),
      md5(norm).as("fp_exact"),
      md5(bag).as("fp_bag"))
  }

  /** Top-N terms per document by frequency (deterministic tie-break on the
    * term itself) — integer counts only, so oracle-exact. Term statistics
    * are the building block for TF-IDF-style scoring; counts stay integer
    * here because cross-engine log()/division on doubles is not
    * reproducible bit-for-bit.
    */
  def topTerms(docs: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("term"))
    counts
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= n)
      .select("doc_id", "rank", "term", "tf")
  }

  /** Corpus heavy hitters with the approx sketch bounded in-query — the
    * [[SqlSurface.approxUserCounts]] (HLL) / GK-percentile pattern for
    * frequent items, completing the sketch family: `approx_top_k`'s raw
    * result depends on tracking/merge internals and tie order, so it can
    * never hash-match an external oracle. The query therefore emits the
    * EXACT deterministic top-k (count desc, term asc) plus two booleans
    * pinning the sketch to its PUBLISHED guarantee, not to exactness:
    * frequent-items sketches bound per-item count error by O(N /
    * maxTracked) (N = token total), so each boolean asserts the sketch
    * estimates within `4·N/maxTracked` of exact — per tracked item, and
    * element-wise between the sorted sketch/exact top-k count arrays.
    * On data whose vocabulary fits the tracker (the test fixtures) the
    * error is exactly 0 and the bound is trivially tight; on regenerated
    * or scaled corpora the gate stays a breakage detector instead of
    * failing on legitimate sketch error (round-6 advice — the old
    * booleans pinned exact equality). Real drift still flips a boolean
    * and fails the driver's hash gate.
    *
    * Scale: token counts fold map-side to vocab-sized partials; the
    * sketch is one `approx_top_k` aggregate (O(maxTracked) state); the
    * check joins are vocab- or k-bounded. The two single-row check
    * frames broadcast onto the k output rows.
    */
  def topKSketchChecked(
      docs: DataFrame, k: Int = 10, maxTracked: Int = 1000): DataFrame = {
    require(maxTracked >= k,
      s"approx_top_k requires maxItemsTracked ($maxTracked) >= k ($k)")
    val toks = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(explode(tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val topk = exact.orderBy(col("cnt").desc, col("term")).limit(k)
    // single-row sketch-error budget: 4·N/maxTracked (conservative over
    // the space-saving/frequent-items ≤ ~3.5·N/maxMapSize guarantee)
    val bound = toks.agg(
      (count(lit(1)) * 4.0 / maxTracked).as("err_bound"))
    val skItems = toks
      .agg(expr(s"approx_top_k(term, $k, $maxTracked)").as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item").as("s_term"), col("e.count").as("s_cnt"))
    val itemsOk = skItems
      .join(exact, col("s_term") === col("term"), "left")
      .crossJoin(broadcast(bound))
      .agg(coalesce(min(abs(col("s_cnt") - col("cnt")) <= col("err_bound")),
        lit(false)).as("sketch_counts_within_bound"))
    val multisetOk = skItems
      .agg(sort_array(collect_list(col("s_cnt"))).as("s_counts"))
      .crossJoin(topk.agg(sort_array(collect_list(col("cnt"))).as("e_counts")))
      .crossJoin(broadcast(bound))
      .select((size(col("s_counts")) === size(col("e_counts")) &&
        forall(zip_with(col("s_counts"), col("e_counts"),
          (a, b) => abs(a - b) <= col("err_bound")), x => x))
        .as("sketch_topk_within_bound"))
    topk
      .crossJoin(broadcast(itemsOk))
      .crossJoin(broadcast(multisetOk))
      .select(col("term"), col("cnt"),
        col("sketch_counts_within_bound"), col("sketch_topk_within_bound"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** Repetition signals (Gopher-rule style): per document, the total
    * bigram count, the most frequent bigram's count, and their ratio — a
    * high top-bigram fraction marks boilerplate/template text that the
    * distinct-token ratio in [[qualityScore]] misses. Bigrams here are
    * NON-distinct (repetition is the point). Two partial-agg shuffles:
    * (doc, bigram) counts, then a per-doc max/sum fold; docs with fewer
    * than two tokens come back with zeros via the left join.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val perBigram = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
    val perDoc = perBigram.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"), max(col("tf")).as("top_bigram_tf"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_tf"), lit(0L)).as("top_bigram_tf"),
        OracleRound.round4(
          coalesce(col("top_bigram_tf"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_bigrams"), lit(0L)).cast("double"), lit(1.0)))
          .as("top_bigram_frac"))
  }

  /** Bigram novelty: per document, the fraction of its (non-distinct)
    * bigram occurrences whose corpus-wide FIRST occurrence (min doc_id)
    * is this document — low novelty marks text assembled from n-grams
    * the corpus already contains (boilerplate, near-template), the
    * memorization-risk signal next to [[repetitionStats]]' within-doc
    * view. Bigrams travel as xxhash64 longs through both shuffles
    * (fixed-width keys; collision odds ≈ bigrams²/2⁶⁴, and the oracle
    * computes the string form so any effect surfaces as a mismatch).
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val perDocBg = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(bigrams).as("bg"))
      .select(col("doc_id"), xxhash64(col("bg")).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("tf"))
    val firstDoc = perDocBg.groupBy(col("bg"))
      .agg(min(col("doc_id")).as("first_doc"))
    val perDoc = perDocBg.join(firstDoc, "bg")
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(when(col("first_doc") === col("doc_id"), col("tf")).otherwise(0L))
          .as("n_novel"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        OracleRound.round4(
          coalesce(col("n_novel"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_bigrams"), lit(0L)).cast("double"), lit(1.0)))
          .as("novelty"))
  }

  /** Per-source unigram KL divergence from the corpus distribution —
    * KL(P_source ‖ P_corpus) = Σ_t p_s(t)·ln(p_s(t)/p_c(t)) — the mixture
    * diagnostic a corpus build publishes per snapshot: a source drifting
    * away from the blend (or collapsing to boilerplate) moves its KL.
    * Every p_c(t) > 0 wherever p_s(t) > 0 by construction (the corpus
    * contains the source), so the sum is always finite.
    *
    * Scale shape: tokens fold to (source, term) counts map-side before
    * the first exchange; the corpus marginals are vocab-sized; the single
    * one-row total broadcasts. No corpus-sized shuffle anywhere.
    */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    val bySource = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cs"))
    val srcTotals = bySource.groupBy(col("source")).agg(sum(col("cs")).as("ns"))
    val corpus = bySource.groupBy(col("term")).agg(sum(col("cs")).as("ct"))
    val total = corpus.agg(sum(col("ct")).as("nt"))
    val ps = col("cs").cast("double") / col("ns").cast("double")
    val pc = col("ct").cast("double") / col("nt").cast("double")
    bySource
      .join(corpus, "term")
      .join(srcTotals, "source")
      .crossJoin(broadcast(total))
      .groupBy(col("source"))
      .agg(
        max(col("ns")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        OracleRound.round4(sum(ps * log(ps / pc))).as("kl"))
  }

  /** Gopher-style heuristic filter ladder: the word-statistics gates a
    * pre-training curation pass applies before any model-based scoring —
    * mean word length in a sane band, no single token dominating the
    * document, bounded numeric-token fraction, and a minimum length. Each
    * signal is emitted alongside a per-gate boolean and the combined
    * `gopher_pass`, so downstream telemetry can report *which* gate
    * rejected a document, not just that one did.
    *
    * Shape: the length/numeric signals are pure column expressions
    * (map-only); the top-token fraction reuses the (doc, term) posting
    * fold — two partial-agg shuffles, same as [[repetitionStats]].
    */
  def gopherFilters(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("double")
    val meanWordLen = OracleRound.round4(
      aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") /
        greatest(nTok, lit(1.0)))
    val numericFrac = OracleRound.round4(
      size(filter(toks, x => x.rlike("^[0-9]+$"))).cast("double") /
        greatest(nTok, lit(1.0)))
    val signals = docs.select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      meanWordLen.as("mean_word_len"),
      numericFrac.as("numeric_frac"))
    val topTok = termFrequencies(docs)
      .groupBy(col("doc_id"))
      .agg(max(col("tf")).as("top_tf"), sum(col("tf")).as("sum_tf"))
      .select(col("doc_id"),
        OracleRound.round4(col("top_tf").cast("double") /
          greatest(col("sum_tf").cast("double"), lit(1.0))).as("top_token_frac"))
    signals.join(topTok, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_tokens"), col("mean_word_len"),
        col("numeric_frac"),
        coalesce(col("top_token_frac"), lit(0.0)).as("top_token_frac"))
      .withColumn("len_ok", col("n_tokens") >= 20)
      .withColumn("word_len_ok",
        col("mean_word_len") >= 2.0 && col("mean_word_len") <= 10.0)
      .withColumn("numeric_ok", col("numeric_frac") <= 0.2)
      .withColumn("repetition_ok", col("top_token_frac") <= 0.2)
      .withColumn("gopher_pass",
        col("len_ok") && col("word_len_ok") && col("numeric_ok") &&
          col("repetition_ok"))
  }

  /** Per-(doc, term) term frequencies — the shared base of [[termStats]]
    * and [[tfidf]]: one explode plus one (doc_id, term) partial-agg
    * shuffle.
    */
  /** Hash-row `d`'s CMS bucket as a column expression — the same md5
    * 52-bit-prefix derivation as [[graft.functions.CountMinAgg.bucket]]
    * (one definition, three engines: JVM aggregate, Spark column, DuckDB
    * hex fold).
    */
  private def cmsBucketCol(d: Int, term: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$d:"), term)), 1, 13), 16, 10)
      .cast("long") % width

  /** Count-Min-sketched term frequencies, checked against exact counts:
    * ONE bounded-state pass ([[graft.functions.CountMinAgg]], depth×width
    * longs of aggregate state) builds the sketch; the matrix (a bounded
    * driver pull, like the IVF centroids) then serves point estimates as
    * literal-array lookups inside codegen. Output: the `topK` most
    * frequent terms with exact count, CMS estimate, and the overcount
    * est−exact (structurally ≥ 0 — CMS never undercounts; the DuckDB
    * oracle rebuilds the same counters by md5-bucket GROUP BY and matches
    * the estimates exactly).
    *
    * At 100 TB the point is the shape: the exact side needs a per-term
    * shuffle, the sketch side is ONE map-side-folded aggregate whose
    * state never grows — the frequency summary you keep when the key
    * space doesn't fit anywhere.
    */
  def cmsTermFrequencies(
      docs: DataFrame, depth: Int = 3, width: Int = 256,
      topK: Int = 20): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val terms = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(explode(tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    val counters = terms
      .select(expr(s"graft_cms(term, $depth, $width)").as("c"))
      .head.getAs[scala.collection.Seq[Long]]("c")
    val est = (0 until depth).map { d =>
      val row = typedLit(counters.slice(d * width, (d + 1) * width).toSeq)
      element_at(row, (cmsBucketCol(d, col("term"), width) + 1).cast("int"))
    }.reduce(least(_, _))
    terms.groupBy(col("term")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("term")).limit(topK)
      .select(col("term"), col("exact"), est.as("cms_est"),
        (est - col("exact")).as("overcount"))
  }

  private def termFrequencies(docs: DataFrame): DataFrame =
    graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus-level term statistics: per term, the document frequency `df`
    * (how many documents contain it) and collection frequency `cf` (total
    * occurrences) — the building block TF-IDF weighting needs beyond
    * per-document counts. Two partial-agg shuffles (never a distinct over
    * the raw token stream): tokens fold to (doc, term, tf) first, so the
    * per-term pass aggregates one row per posting, not per occurrence.
    */
  def termStats(docs: DataFrame): DataFrame =
    termFrequencies(docs)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))

  /** TF-IDF per (document, term): integer `tf` and `df` plus the classic
    * weight tf · ln(N/df), rounded at the oracle edge (OracleRound — ln is
    * the one non-exactly-rounded op here, identical modulo 1 ulp across
    * engines, and the fixed floor-rounding keeps both sides on the same
    * decimal). N arrives as a broadcast single-row aggregate, so the plan
    * stays fully lazy — no driver-side count.
    *
    * The tf frame feeds both the df aggregation and the final join —
    * materialized once via OpCache (slim rows: id, term, count).
    */
  def tfidf(docs: DataFrame): DataFrame = {
    val tf = graft.engine.OpCache.materialize(termFrequencies(docs))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        OracleRound.round4(col("tf") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("tfidf"))
  }

  /** PMI collocations: the corpus's strongest two-word associations —
    * adjacent bigrams scored by pointwise mutual information
    * ln(N·c(ab) / (c(a)·c(b))) over the token stream, with a minimum
    * bigram count floor so rare accidents don't dominate (the classic
    * Church–Hanks association measure, re-derived). The collocation
    * table is corpus telemetry (multi-word expressions, domain phrases)
    * and a tokenizer-merge candidate list.
    *
    * Scale shape: one bigram partial-agg over the (linear) adjacent-pair
    * stream, one unigram partial-agg, two broadcast-sized joins of the
    * FILTERED bigram list against the unigram counts (the ≥minCount
    * survivors are vocabulary-sized, not corpus-sized), and a top-k
    * TakeOrderedAndProject — never a global sort. PMI is integer counts
    * closed by one division inside ln, rounded 4 dp (the BM25/KL ln
    * precedent); ranking uses the ROUNDED score with a bigram tie-break,
    * so the cut is cross-engine deterministic.
    */
  def collocations(
      docs: DataFrame, minCount: Long = 5, topK: Int = 20): DataFrame = {
    // NOT materialized (round-18 A/B, rejected): caching this frame for
    // its two consumers measured 1.5 s vs 1.0 s — persisting the token
    // arrays costs more than the duplicated tokenize pass at any scale
    // where the arrays dominate the text
    val base = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c1"))
    val nTotal = uni.agg(sum(col("c1")).as("n_tokens"))
    val bi = base.where(size(col("toks")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - 2),
        i => struct(element_at(col("toks"), i + 1).as("a"),
          element_at(col("toks"), i + 2).as("b")))).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minCount)
    bi
      .join(uni.select(col("term").as("a"), col("c1").as("ca")), Seq("a"))
      .join(uni.select(col("term").as("b"), col("c1").as("cb")), Seq("b"))
      .crossJoin(broadcast(nTotal))
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        OracleRound.round4(log(
          col("n_tokens").cast("double") * col("cab") /
            (col("ca").cast("double") * col("cb")))).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Per-document keyword extraction: each document's top-`k` terms by
    * TF-IDF (rounded score, then term as the tie-break — a deterministic
    * cut). The "what is this document about" summary column a curation
    * pipeline publishes next to the corpus; one window over the
    * (doc, term) posting frame, partitioned by document (fine-grained,
    * never global).
    */
  def keywords(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tfidf(docs)
      .withColumn("kw_rank", row_number().over(w))
      .where(col("kw_rank") <= k)
      .select(col("doc_id"), col("kw_rank"), col("term"), col("tfidf"))
  }

  /** Quality-decile telemetry: documents ranked by composite quality
    * (doc_id tie-break) and cut into ten equal-count buckets — the
    * monitoring table a corpus build publishes per snapshot so
    * distribution drift is visible release-over-release.
    *
    * Scale shape: a global `ntile(10)` is one window reducer, so the
    * decile is instead derived from the EXACT distributed global rank
    * ([[graft.engine.GlobalOrder.withGlobalRank]]: range exchange +
    * per-partition windows + broadcast offsets) and ntile's own bucket
    * arithmetic — with N rows, the first N mod 10 buckets take
    * ceil(N/10) rows, the rest floor(N/10). Bit-identical to
    * `ntile(10) OVER (ORDER BY quality, doc_id)` (the DuckDB oracle keeps
    * that form), at full parallelism.
    */
  def qualityDeciles(docs: DataFrame): DataFrame = {
    val scored = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), qualityOf(col("text"), col("toks")).as("quality"))
    graft.engine.GlobalOrder.withNtile(scored,
        Seq(col("quality"), col("doc_id")), 10, "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
  }

  /** [[qualityDeciles]] sharded by a key column (e.g. `source`): deciles
    * within each shard through a PARTITIONED ntile — one reducer per
    * shard, the form for watching per-source distribution drift. At a
    * corpus scale where even one source overwhelms a reducer, compose
    * with [[graft.engine.GlobalOrder.withNtile]] per shard instead.
    */
  def qualityDecilesBySource(docs: DataFrame, shardCol: String = "source"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol)).orderBy(col("quality"), col("doc_id"))
    graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col(shardCol), col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col(shardCol), col("doc_id"),
        qualityOf(col("text"), col("toks")).as("quality"))
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col(shardCol), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
  }

  /** CCNet-style perplexity buckets: every document assigned to one of
    * `buckets` equal-count NLL terciles (1 = head/most-fluent … 3 =
    * tail/noisiest) by the corpus-self unigram LM score — the classic
    * head/middle/tail split a CommonCrawl curation publishes, and the
    * knob training mixes are cut with. Exact distributed ntile
    * ([[graft.engine.GlobalOrder.withNtile]]) over [[unigramLogProb]];
    * ties broken by doc_id. Zero-token docs carry no LM evidence and are
    * absent, matching unigramLogProb's domain.
    */
  def nllBuckets(docs: DataFrame, buckets: Int = 3): DataFrame =
    graft.engine.GlobalOrder.withNtile(unigramLogProb(docs),
        Seq(col("nll"), col("doc_id")), buckets, "bucket")
      .select(col("doc_id"), col("nll"), col("bucket"))

  /** Unigram language-model scoring (CCNet-style perplexity filtering):
    * train the corpus's own unigram model (term probability = collection
    * frequency / total tokens) and score every document by its per-token
    * negative log-likelihood — low-NLL documents read like the corpus,
    * high-NLL ones are outliers/noise; thresholding on this is the classic
    * LM quality gate.
    *
    * Scale shape: the model IS [[termStats]]'s cf column (vocab-sized);
    * documents fold to (doc, term, tf) postings first, so the model join
    * and the per-doc fold both move one row per posting. The corpus total
    * is a single-row aggregate broadcast into the plan — fully lazy, no
    * driver action.
    */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val tf = graft.engine.OpCache.materialize(termFrequencies(docs))
    val model = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val total = model.agg(sum(col("cf")).as("total"))
    tf.join(model, "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        OracleRound.round4(
          -(sum(col("tf").cast("double") *
              log(col("cf").cast("double") / col("total").cast("double"))) /
            sum(col("tf")).cast("double"))).as("nll"))
  }

  /** Interpolated bigram LM scoring — the next step from
    * [[unigramLogProb]] toward real perplexity filtering: score interior
    * token positions by ln(λ·p(w|prev) + (1−λ)·p(w)) with
    * Jelinek-Mercer smoothing (λ = 0.75), both distributions trained on
    * the corpus itself. Documents fold to (doc, prev, w, tf) bigram
    * postings; the model sides are two partial-agg tables (bigram and
    * context counts) joined back by equi-keys — no shuffle carries raw
    * text. Docs with fewer than two tokens come back with zeros.
    */
  def bigramLogProb(docs: DataFrame, lambda: Double = 0.75): DataFrame = {
    val toks = col("toks")
    val bigramStructs = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("p"), element_at(toks, i + 1).as("w"))))
      .otherwise(array().cast("array<struct<p:string,w:string>>"))
    // (doc, context-key, word-key, tf) — token strings are hashed to
    // 64-bit keys BEFORE the first shuffle (same policy as the jaccard
    // shingle pipeline: fixed-width longs through every exchange;
    // collision odds ≈ vocab²/2⁶⁴, and the string-form DuckDB oracle
    // would surface any effect as a hash mismatch). Feeds the bigram
    // model AND the scoring join.
    val docBg = graft.engine.OpCache.materialize(
      graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), explode(bigramStructs).as("b"))
        .select(col("doc_id"),
          xxhash64(col("b.p")).as("pk"),
          xxhash64(col("b.p"), col("b.w")).as("bk"),
          xxhash64(col("b.w")).as("wk"))
        .groupBy(col("doc_id"), col("pk"), col("bk"), col("wk"))
        .agg(count(lit(1)).as("tf")))
    val big = docBg.groupBy(col("bk")).agg(sum(col("tf")).as("cb"))
    val ctx = docBg.groupBy(col("pk")).agg(sum(col("tf")).as("cp"))
    val uni = graft.engine.OpCache.materialize(
      termFrequencies(docs).groupBy(col("term")).agg(sum(col("tf")).as("cw"))
        .select(xxhash64(col("term")).as("wk"), col("cw")))
    val total = uni.agg(sum(col("cw")).as("total"))
    val prob =
      lit(lambda) * (col("cb").cast("double") / col("cp").cast("double")) +
        lit(1.0 - lambda) * (col("cw").cast("double") / col("total").cast("double"))
    val scored = docBg
      .join(big, Seq("bk"))
      .join(ctx, Seq("pk"))
      .join(uni, Seq("wk"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_bigrams"),
        OracleRound.round4(
          -(sum(col("tf").cast("double") * log(prob)) /
            sum(col("tf")).cast("double"))).as("nll2"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll2"), lit(0.0)).as("nll2"))
  }

  /** Rolling-hash shingle fingerprints (winnowing-style): hash every k-word
    * shingle with xxhash64, keep the minimum per window of w consecutive
    * shingle hashes. Output is the distinct set of kept hashes per doc —
    * the classic MOSS/winnowing document signature. Not SQL-expressible in
    * the oracle (xxhash64 is Spark-specific) → rows-only check.
    */
  def winnowedFingerprints(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame = {
    // each stage materializes its array as an attribute before the next
    // HOF captures it — a lambda re-evaluates captured expression subtrees
    // per element, so inlining `tokens`/`hashes` would re-tokenize the doc
    // once per shingle (and re-hash every shingle once per window)
    graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), transform(
        sequence(lit(0), greatest(size(col("toks")) - k, lit(0))),
        i => xxhash64(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))).as("hashes"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("hashes")) - w, lit(0))),
        i => array_min(slice(col("hashes"), i + 1, lit(w))))).as("winnowed"))
      .select(
        col("doc_id"),
        sort_array(col("winnowed")).as("fingerprint_hashes"),
        size(col("winnowed")).as("n_fingerprints"))
  }

  /** [[winnowedFingerprints]] keyed on an md5-derived 60-bit shingle hash —
    * the ORACLE-EXPRESSIBLE variant (same pattern as
    * `Dedup.simhashSqlSignatures`): hash = the first 15 hex digits of
    * md5(shingle) read as a base-16 integer, which DuckDB reproduces with
    * a per-digit fold; 60 bits keeps every value inside signed BIGINT on
    * both engines. The winnow itself — min per w-window of consecutive
    * shingle hashes, distinct, sorted — is identical arithmetic to the
    * xxhash64 production form (which stays the scale default: one integer
    * hash vs an md5 per shingle). Fingerprints serialize to a CSV string
    * at the oracle edge (the driver's pandas compare cannot hash ndarray
    * cells), with the count alongside.
    */
  def winnowedFingerprintsSql(docs: DataFrame, k: Int = 3, w: Int = 4): DataFrame =
    graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), transform(
        sequence(lit(0), greatest(size(col("toks")) - k, lit(0))),
        i => conv(substring(
            md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k)))), 1, 15),
          16, 10).cast("long")).as("hashes"))
      .select(col("doc_id"), array_distinct(transform(
        sequence(lit(0), greatest(size(col("hashes")) - w, lit(0))),
        i => array_min(slice(col("hashes"), i + 1, lit(w))))).as("winnowed"))
      .select(
        col("doc_id"),
        concat_ws(",", transform(sort_array(col("winnowed")), h => h.cast("string")))
          .as("fingerprints"),
        size(col("winnowed")).as("n_fingerprints"))

  /** BM25 retrieval: top-`topDocs` documents per query term under the
    * Okapi BM25 weight
    * idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * The query set is derived deterministically from the corpus itself —
    * the `nQueries` highest-collection-frequency non-stopword terms (term
    * asc tie-break) — so the operator is self-contained and
    * oracle-replayable; a production caller passes its own term list.
    *
    * Scale shape: corpus stats (N, avgdl) are a broadcast single-row
    * aggregate; the query terms are a broadcast `limit nQueries` frame, so
    * the scoring join is a BROADCAST semi-selective probe into the postings
    * (only rows whose term is queried survive the join — the fact-side
    * postings never shuffle on term for serving). Scores are rounded to
    * 4 dp BEFORE ranking in both engines, so the rank order itself is
    * cross-engine deterministic (score desc, doc_id asc).
    */
  def bm25TopK(docs: DataFrame, nQueries: Int = 5, topDocs: Int = 10,
               k1: Double = 1.2, b: Double = 0.75,
               queryTable: Option[DataFrame] = None): DataFrame = {
    val tf = graft.engine.OpCache.materialize(termFrequencies(docs))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    // external serving: the caller's own query terms (a `term` column)
    // instead of the corpus-derived probe — the same join shape, the
    // query side stays a broadcast frame, the fact side untouched. Terms
    // absent from the corpus have no postings and drop out naturally.
    val queries = queryTable match {
      case Some(qt) =>
        qt.select(col("term")).distinct().join(df, Seq("term"))
          .select(col("term"), col("df"))
      case None => df
        .where(!col("term").isin(stopwords.map(lit): _*))
        .orderBy(col("cf").desc, col("term"))
        .limit(nQueries)
        .select(col("term"), col("df"))
    }
    val dl = docs.select(col("doc_id"), size(tokens(col("text"))).as("dl"))
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      (sum(size(tokens(col("text")))) / count(lit(1))).as("avgdl"))
    val scored = tf
      .join(broadcast(queries), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("term").as("query_term"), col("doc_id"),
        OracleRound.roundN(
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
          4).as("score"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_term"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topDocs)
      .select(col("query_term"), col("rank"), col("doc_id"), col("score"))
  }

  /** Phrase search through a POSITIONAL index: occurrences of the
    * corpus's most frequent word trigram, located by joining per-term
    * position postings ((doc, pos) for word 1) ⋈ ((doc, pos+1) for
    * word 2) ⋈ ((doc, pos+2) for word 3) — the inverted-index phrase
    * plan, which touches only the queried terms' postings instead of
    * re-scanning text. The DuckDB oracle deliberately takes the OTHER
    * route (direct n-gram scan), so the hash-compare proves the
    * positional-join plan equivalent to a full scan.
    *
    * The phrase is derived in-query (top trigram by count, gram asc
    * tie-break — integer-deterministic in both engines) so the operator
    * is self-contained; a production caller passes its own phrase and
    * the postings come from a published index table.
    *
    * Scale shape: the trigram derivation is one gram fold (linear); the
    * match side filters postings to the three queried terms via one
    * broadcast, then joins on (doc, adjusted position) — shuffle volume
    * is the queried terms' posting mass, not the corpus.
    */
  def phraseMatches(docs: DataFrame): DataFrame = {
    // NOT materialized (round-18 A/B, rejected): caching this frame for
    // its two consumers measured 1.8 s vs 1.4 s — same trade as
    // [[collocations]]
    val base = graft.engine.Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val grams = base
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", slice(col("toks"), i + 1, lit(3))))))
    val top = grams.groupBy(col("col").as("phrase"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("phrase"))
      .limit(1)
      .select(col("phrase"),
        split(col("phrase"), " ").getItem(0).as("w1"),
        split(col("phrase"), " ").getItem(1).as("w2"),
        split(col("phrase"), " ").getItem(2).as("w3"))
    val postings = base.select(col("doc_id"), posexplode(col("toks")))
      .select(col("doc_id"), col("pos"), col("col").as("term"))
    val t = broadcast(top)
    def side(w: String, offset: Int) = postings.join(t, col("term") === col(w))
      .select(col("doc_id"), (col("pos") - offset).as("p0"),
        (if (offset == 0) col("phrase") else lit(null)).as(s"ph$offset"))
    val matches = side("w1", 0)
      .join(side("w2", 1).drop("ph1"), Seq("doc_id", "p0"))
      .join(side("w3", 2).drop("ph2"), Seq("doc_id", "p0"))
    matches.groupBy(col("doc_id"), col("ph0").as("phrase"))
      .agg(count(lit(1)).as("n_matches"), min(col("p0")).as("first_pos"))
  }

  /** Inverted index: per term, document frequency, collection frequency,
    * and the head of the postings list as `doc:tf` pairs (first
    * `maxPostings` by doc id — the full list is the same frame without the
    * slice; the head keeps oracle rows bounded). Terms below `minDf` are
    * dropped (hapax legomena dominate the vocabulary and index nothing
    * useful).
    *
    * Scale shape: one token-fold shuffle to (doc, term, tf), one per-term
    * shuffle building the postings — collect_list is bounded per group by
    * the term's df, and the slice caps the OUTPUT row, so only genuinely
    * hot terms carry big groups (at extreme scale those are exactly the
    * terms a stopword/df-ceiling filter drops before indexing).
    */
  def invertedIndex(docs: DataFrame, minDf: Long = 2, maxPostings: Int = 20): DataFrame =
    termFrequencies(docs)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"),
        slice(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
          1, maxPostings).as("head"))
      .where(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        concat_ws(",", transform(col("head"),
          p => concat(p.getField("doc_id"), lit(":"), p.getField("tf"))))
          .as("postings"))

  /** Zipf-law rank–frequency fit: OLS slope/intercept of ln(count) on
    * ln(rank) over the top `k` corpus terms — the companion diagnostic
    * to [[heapsGrowth]] (natural text sits near slope −1; a much
    * flatter slope flags template/boilerplate floods, a steeper one a
    * collapsed vocabulary). The corpus contributes ONE term-count
    * partial-agg; the top-k cut is (count desc, term asc) via
    * TakeOrderedAndProject (never a global sort), and the k-row tail —
    * rank assignment, the four OLS moment sums, the closed-form fit —
    * folds over a single collected k-row array (bounded driver-side
    * row, the life-table contract).
    *
    * Determinism: ranks come from the integer-exact (count, term)
    * order; each ln is rounded to 9 dp; the moment sums are SEQUENTIAL
    * folds in rank order (zero-init, ≡ the oracle's prepended 0.0), so
    * the 4 dp slope/intercept hash-match despite ln's 1-ulp libm drift.
    */
  def zipfFit(docs: DataFrame, k: Int = 200): DataFrame = {
    val counts = docs
      .select(explode(tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cf"))
      .orderBy(col("cf").desc, col("term")).limit(k)
    val r9 = (c: Column) => graft.functions.OracleRound.roundN(c, 9)
    val arr = counts
      .agg(sort_array(collect_list(struct((-col("cf")).as("ncf"), col("term"))))
        .as("a"))
      .select(size(col("a")).cast("long").as("n"),
        transform(col("a"), (s, i) => struct(
          r9(log((i + 1).cast("double"))).as("x"),
          r9(log((-s.getField("ncf")).cast("double"))).as("y"))).as("xy"))
    def fsum(f: Column => Column): Column =
      aggregate(col("xy"), lit(0.0), (acc, s) => acc + f(s))
    val sums = arr.select(col("n"),
      fsum(_.getField("x")).as("sx"), fsum(_.getField("y")).as("sy"),
      fsum(s => s.getField("x") * s.getField("y")).as("sxy"),
      fsum(s => s.getField("x") * s.getField("x")).as("sxx"))
    val nd = col("n").cast("double")
    val slope = (nd * col("sxy") - col("sx") * col("sy")) /
      (nd * col("sxx") - col("sx") * col("sx"))
    sums.select(col("n").as("n_terms"),
      graft.functions.OracleRound.roundN(slope, 4).as("slope"),
      graft.functions.OracleRound.roundN(
        (col("sy") - slope * col("sx")) / nd, 4).as("intercept"))
  }

  /** Heaps-law vocabulary growth: distinct-vocabulary size at corpus
    * prefixes (doc_id order, `buckets` equal-count checkpoints) — the
    * "is the corpus still teaching the tokenizer new words" telemetry
    * that sizes vocabularies and spots corpus exhaustion (a flattening
    * curve) or contamination (a late vocab spike). Entirely INTEGER
    * math — counts and doc-id thresholds, no tolerance anywhere.
    *
    * Shape: docs get prefix buckets via the exact distributed ntile
    * ([[graft.engine.GlobalOrder.withNtile]] — never a single-reducer
    * window); each term contributes only its FIRST document (one
    * min-agg), assigned to the earliest checkpoint covering it through
    * a ≤`buckets`-row broadcast cut table (the bounded-BNLJ family);
    * the cumulative curve folds over `buckets` rows, not the corpus.
    */
  def heapsGrowth(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val dDec = graft.engine.GlobalOrder.withNtile(
      docs.select(col("doc_id")), Seq(col("doc_id")), buckets, "bucket")
    val cuts = dDec.groupBy(col("bucket"))
      .agg(max(col("doc_id")).as("cut"), count(lit(1)).as("n_docs"))
    val first = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val firstBucket = first
      .join(broadcast(cuts.select(col("bucket"), col("cut"))),
        col("first_doc") <= col("cut"))
      .groupBy(col("term")).agg(min(col("bucket")).as("bucket"))
    val newTerms = firstBucket.groupBy(col("bucket"))
      .agg(count(lit(1)).as("new_terms"))
    // cumulative over the ≤buckets-row frame via a bounded self-join —
    // no unpartitioned window, even a tiny one
    cuts.as("a")
      .join(broadcast(cuts.as("b")), col("b.bucket") <= col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.n_docs")).as("n_docs_cum"))
      .as("l")
      .join(broadcast(newTerms.as("t")), col("t.bucket") <= col("l.bucket"))
      .groupBy(col("l.bucket"), col("l.n_docs_cum"))
      .agg(sum(col("t.new_terms")).as("vocab"))
      .select(col("bucket"), col("n_docs_cum"), col("vocab"))
      .orderBy(col("bucket"))
  }
}
