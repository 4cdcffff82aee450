package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{OpCache, Partitioning, PublishGuard}
import graft.functions.VectorOps

/** Similarity search over an embedding column (`array<float>`, dim 64).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the corpus, rank with a per-query window. The corpus side
  *    streams map-only (no corpus shuffle until the final per-query top-k,
  *    which TakeOrdered-style aggregates k rows per query). This is the
  *    oracle anchor and the right plan whenever |queries| is small.
  *  - [[lshTopK]]: random-hyperplane LSH (sign-bit buckets, multiple
  *    tables) — the 100 TB path. Corpus is bucketed once (map-only),
  *    queries probe their bucket per table, candidates = bucket matches,
  *    ranked by exact cosine. Candidate count ≈ T · n / 2^bits per query
  *    instead of n.
  *
  * Hyperplanes are generated from a fixed seed at plan-build time and
  * inlined as literals, so results are deterministic across runs/engines.
  */
object Similarity {

  /** Query-side base frame (vec_id, v, nrm, nv): either the first
    * `numQueries` corpus vectors (the default, self-serving eval shape)
    * or an EXTERNAL (vec_id, embedding) table — the retrieval deployment,
    * where the query set arrives from outside the corpus and is served
    * against the same published artifacts with the same deterministic
    * math. The query set must be bounded (it is broadcast, and the PQ
    * paths collect it to build per-query ADC tables); a query id equal to
    * a corpus id is treated as the same vector — the self-match exclusion
    * is id equality on either path.
    */
  private def queryBase(
      corpus: DataFrame, numQueries: Int,
      external: Option[DataFrame]): DataFrame =
    external match {
      case Some(q) =>
        q.select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
          .withColumn("nrm", VectorOps.l2Norm(col("v")))
          .withColumn("nv", transform(col("v"), x => x / col("nrm")))
      case None => corpus.where(col("vec_id") < numQueries)
    }

  /** Exact top-k by cosine for each query vector (queries = the first
    * `numQueries` corpus vectors by vec_id, or an external query table —
    * see [[queryBase]]; self-matches excluded).
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val queries = queryBase(e, numQueries, queryTable)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** Binary (sign-quantized) ANN top-k — the 1-bit-per-dimension
    * compression point of the quantization family (int8
    * [[quantizeInt8]] → PQ [[pqTopK]] → THIS): every vector compresses
    * to a 63-bit sign code (bit t set iff nv[t+1] > 0 — exactly the
    * [[bucketId]] sign loop driven with IDENTITY hyperplanes, so the
    * codegen'd [[graft.functions.LshBucketExpr]] does the binarization),
    * and candidates rank by Hamming distance `bit_count(code XOR
    * qcode)` — pure integer ops over ONE long per vector, the cheapest
    * scan the engine offers (~64× less data than the float vectors;
    * the standard shortlist stage before an exact rerank). Ties break
    * (hamming asc, vec_id asc); the ranking is a deterministic function
    * of the published sign codes, so the DuckDB oracle replays it
    * bit-for-bit — and its agreement with full-precision cosine is
    * MEASURED (SimilaritySpec recall floor), not assumed.
    *
    * Dimensions past 63 don't contribute (one 64-bit word, sign bit
    * reserved — the single-word binarization; multi-word codes are the
    * straightforward extension). Scale shape: the bounded query set
    * broadcasts and the corpus scans once, like [[bruteForceTopK]] —
    * but over 8-byte codes instead of dim·8-byte vectors.
    */
  def hammingTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val signPlanes = Array.tabulate(63) { t =>
      val p = new Array[Double](t + 1); p(t) = 1.0; p
    }
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nv", transform(col("v"), x => x / VectorOps.l2Norm(col("v"))))
      .withColumn("code", bucketId(col("nv"), signPlanes))
      .select(col("vec_id"), col("code"))
    // external queries binarize through the same sign loop; the internal
    // default is the corpus's first numQueries codes (the queryBase
    // convention, over the already-coded frame)
    val queries = queryTable match {
      case Some(qt) =>
        qt.select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
          .withColumn("nv",
            transform(col("v"), x => x / VectorOps.l2Norm(col("v"))))
          .withColumn("qcode", bucketId(col("nv"), signPlanes))
          .select(col("vec_id").as("query_id"), col("qcode"))
      case None => e.where(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id"))
    e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        bit_count(col("code").bitwiseXOR(col("qcode"))).cast("int").as("hamming"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "hamming")
  }

  /** Radius (range) similarity search: ALL corpus vectors with cosine ≥
    * `threshold` to each query — the range-query complement of the
    * top-k serving surface ("everything semantically this close", the
    * form dedup-before-ingest and contamination checks ask, where top-k
    * would silently cap the answer). Scoring is EXACTLY
    * [[bruteForceTopK]]'s sequential-fold cosine (bit-identical to the
    * oracle's list_reduce, so the threshold cuts the same set on both
    * engines); the bounded query set broadcasts and the corpus scans
    * once — deliberate: an EXACT radius answer may not miss a vector,
    * so no approximate index can prune it, and the grid-blocked /
    * IVF paths remain the scale cut for the approximate regime
    * ([[embeddingCosinePairsBlocked]] is this query's self-join twin).
    */
  def radiusSearch(
      embeddings: DataFrame,
      numQueries: Int = 10,
      threshold: Double = 0.3,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val queries = queryBase(e, numQueries, queryTable)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** k-NN label vote — the consumer side of the ANN surface: each query's
    * predicted label is the majority label among its exact top-k
    * neighbors (vote ties broken by the smaller label; the neighbor set
    * is [[bruteForceTopK]]'s, so the vote inherits its oracle check).
    * The classic embedding-quality eval a pipeline runs after computing
    * embeddings: label agreement of nearest neighbors. Scale shape: the
    * vote is a k·numQueries-row aggregate over the top-k output plus one
    * broadcast-sized label join — the corpus-side cost is bruteForceTopK's
    * (or any ANN variant swapped in its place).
    */
  def knnLabel(embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val topk = bruteForceTopK(embeddings, numQueries, k)
    val votes = topk
      .join(embeddings.select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    votes
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  /** Hard-negative mining — the contrastive-training data miner: for each
    * query vector, the top-k most-cosine-similar corpus vectors carrying a
    * DIFFERENT label (the near-misses a contrastive or triplet loss learns
    * the most from; easy random negatives are nearly information-free).
    * The scoring chain is exactly [[bruteForceTopK]]'s (bounded query set
    * broadcast, corpus map-only, sequential-fold cosine bit-identical to
    * the oracle's list_reduce) with the label-mismatch predicate pushed
    * into the candidate join — so the corpus-side cost is one scan and
    * the per-query state is the k-row window head. Exact by design: a
    * missed hard negative is a silently easier training batch, so the
    * exact scan is the gate and the IVF/LSH paths are the approximate
    * cut when |queries| grows (swap [[ivfTopK]]'s candidate former in
    * front of the same label predicate).
    */
  def hardNegatives(
      embeddings: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val queries = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("query_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val scored = e.join(broadcast(queries),
        col("vec_id") =!= col("query_id") &&
          col("label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"),
        col("vec_id"), col("label").as("neg_label"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "query_label", "rank", "vec_id", "neg_label", "cosine")
  }

  /** Per-label embedding centroids, one row per (label, dimension): the
    * class-prototype table an embedding-quality pass publishes (nearest-
    * centroid classification, per-class drift monitoring). posexplode →
    * (label, pos) partial-agg mean keeps every stage distributed: the
    * exchange carries labels × dim rows regardless of corpus size, and
    * the per-dimension sums combine map-side before the shuffle.
    */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("label"),
        posexplode(VectorOps.asDouble(col("embedding"))).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n_vecs"),
        graft.functions.OracleRound.round4(avg(col("x"))).as("dim_mean"))

  /** Per-label L2-norm statistics — the embedding QA telemetry that
    * catches collapsed or exploding vectors per class before they poison
    * similarity search. Norms are sequential HOF folds (bit-identical
    * cross-engine); the mean is rounded at the edge. Map-only + one
    * label-keyed partial aggregate.
    */
  def normStats(embeddings: DataFrame): DataFrame =
    Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("label"),
        VectorOps.l2Norm(VectorOps.asDouble(col("embedding"))).as("nrm"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        graft.functions.OracleRound.round4(avg(col("nrm"))).as("avg_norm"),
        graft.functions.OracleRound.round4(min(col("nrm"))).as("min_norm"),
        graft.functions.OracleRound.round4(max(col("nrm"))).as("max_norm"))

  /** PSI of the cluster-assignment distribution between two (cluster,
    * count) cohorts over a dense `nlist` grid — the shared core of
    * [[centroidDriftPublished]] (batch cohorts) and
    * [[graft.streaming.StreamOps.ivfDriftStats]] (rebase vs recent
    * batches of a maintained index). Same exactness discipline as
    * `Curation.driftPsi`: integer counts on the dense grid,
    * Laplace-smoothed shares as single IEEE expressions, cluster-sorted
    * sequential fold (init 0.0 ≡ the oracle's prepended 0.0), 4 dp —
    * tolerance-free cross-engine. One row out: (n_base, n_cur, psi,
    * drifted ≥ 0.2, the industry-standard "significant shift" cut).
    * Scale: inputs are nlist-sized partial-agg results; everything here
    * is constant-size work.
    */
  def psiOverClusterCounts(
      base: DataFrame, cur: DataFrame, nlist: Int): DataFrame = {
    val spark = base.sparkSession
    val grid = spark.range(nlist)
      .select(col("id").cast("int").as("cluster"))
      .join(base.select(col("cluster"), col("n").as("cb")), Seq("cluster"), "left")
      .join(cur.select(col("cluster"), col("n").as("cq")), Seq("cluster"), "left")
      .na.fill(0L, Seq("cb", "cq"))
    val tot = grid.agg(
      sum(col("cb")).as("nb"), sum(col("cq")).as("nc"))
    val p = (col("cb") + 1).cast("double") / (col("nb") + lit(nlist))
    val q = (col("cq") + 1).cast("double") / (col("nc") + lit(nlist))
    grid.crossJoin(broadcast(tot))
      .select(col("nb"), col("nc"),
        struct(col("cluster").as("band"), ((q - p) * log(q / p)).as("c")).as("bc"))
      .agg(
        max(col("nb")).as("n_base"), max(col("nc")).as("n_cur"),
        graft.functions.OracleRound.roundN(
          aggregate(sort_array(collect_list(col("bc"))), lit(0.0),
            (acc, s) => acc + s.getField("c")), 4).as("psi"))
      .withColumn("drifted", col("psi") >= 0.2)
  }

  /** PSI drift of the cluster-assignment distribution between two corpus
    * cohorts, both assigned against the SAME published IVF centroids —
    * the quantified "when to retrain" trigger for
    * [[graft.streaming.StreamOps.rotateIvfIndex]]: centroids frozen at
    * training time slowly mismatch a drifting corpus, and the first
    * symptom is the assignment distribution walking away from the
    * training-era one (hot lists overflow, probe recall decays). Cohorts
    * here are the even/odd vec_id halves — the deterministic batch
    * analog of training-era vs recent ingest (the streaming side,
    * [[graft.streaming.StreamOps.ivfDriftStats]], compares the rebase
    * partition against recent batch partitions of the live index).
    * Scale: map-only assignment (nlist dots per vector) + one
    * nlist-sized partial-agg; the PSI itself is constant-size work.
    */
  def centroidDriftPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val assigned = assignVectors(embeddings, cents)
      .select(col("vec_id"), col("cluster"))
    def cohort(rem: Int) = assigned
      .where(col("vec_id") % 2 === rem)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
    psiOverClusterCounts(cohort(0), cohort(1), cents.length)
  }

  /** Simplified (centroid) silhouette per cluster against the PUBLISHED
    * IVF centroids — the cluster-quality QA gate a pipeline runs before
    * promoting a trained index or trusting cluster-level curation
    * decisions (semantic prune, diversity sampling): per vector
    * a = cosine distance to its OWN centroid, b = the smallest cosine
    * distance to any OTHER centroid, s = (b − a) / max(a, b) ∈ [0, 1]
    * under nearest-centroid assignment (a ≤ b by construction; the
    * classic all-pairs silhouette is corpus² and the centroid form is
    * the standard tractable estimator). All dots are sequential folds
    * against the published table's centroid values, and the
    * per-vector s is rounded 6 dp before the per-cluster summary, so
    * an external engine reading the same table reproduces every
    * per-vector value bit-for-bit (the summary means are 4 dp over
    * identical inputs). Scale shape: map-only nlist dots per vector +
    * ONE nlist-sized partial aggregate — no join, no window, no pair
    * former anywhere.
    */
  def silhouettePublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val sil = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
      .withColumn("nv", transform(col("v"), x => x / col("nrm")))
      .withColumn("top2", probeStructs(col("nv"), cents, 2))
      .select(col("vec_id"),
        element_at(col("top2"), 1).getField("i").as("cluster"),
        (lit(1.0) - element_at(col("top2"), 1).getField("d")).as("a"),
        (lit(1.0) - element_at(col("top2"), 2).getField("d")).as("b"))
      .select(col("vec_id"), col("cluster"),
        graft.functions.OracleRound.roundN(
          when(greatest(col("a"), col("b")) === 0.0, lit(0.0))
            .otherwise((col("b") - col("a")) / greatest(col("a"), col("b"))),
          6).as("sil"))
    sil.groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_vecs"),
        graft.functions.OracleRound.round4(avg(col("sil"))).as("mean_sil"),
        min(col("sil")).as("min_sil"),
        max(col("sil")).as("max_sil"))
  }

  /** ANN index promotion gate — recall@k of the published-IVF search
    * against the exact scan, per query: the one-number eval that decides
    * whether an index version (its centroids, its nprobe) is allowed to
    * serve. `hits` = |IVF top-k ∩ exact top-k| (both sides already
    * oracle-checked chains: [[ivfTopKPublished]] / [[bruteForceTopK]]),
    * recall = hits / k — a single IEEE division, deterministic on any
    * engine. Scale shape: both sides are bounded-query-set scans (the
    * documented bruteForce theta join); the intersection is a k·|queries|-
    * row equi-join. The exact side is the gate's DEFINITION, so it cannot
    * be pruned — at 100 TB the eval runs on a sampled query set, not the
    * corpus, and its cost is |queries| scans exactly like serving.
    */
  def recallEvalPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3): DataFrame = {
    val exact = bruteForceTopK(embeddings, numQueries, k)
      .select(col("query_id"), col("vec_id"))
    val approx = ivfTopKPublished(embeddings, baseDir, slug, numQueries, k,
        nlist, nprobe, iters)
      .select(col("query_id"), col("vec_id"))
    exact
      .join(approx.withColumn("hit", lit(1L)),
        Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / k).as("recall"))
  }

  /** Matryoshka truncation eval — recall@k of an exact search run on the
    * FIRST `prefixDim` embedding dimensions against the full-dimension
    * exact scan, per query (Kusupati et al., "Matryoshka Representation
    * Learning", NeurIPS'22 — public literature): the eval that decides
    * how far a nested-representation index may truncate vectors before
    * retrieval quality degrades, i.e. how many bytes per vector the
    * serving tier actually has to store. Both sides are the
    * [[bruteForceTopK]] chain (bounded query set broadcast, corpus
    * map-only, sequential-fold cosine bit-identical to the oracle's
    * list_reduce) — the truncated side simply slices the array before
    * the fold, so its dots/norms are the exact prefix sums DuckDB
    * computes over the same slice. `hits` = |truncated top-k ∩ full
    * top-k| (the full scan is ground truth), recall = one IEEE
    * division. Scale shape: two bounded-query scans + a k·|queries|-row
    * equi-join — at 100 TB the eval runs on a sampled query set and its
    * cost is |queries| corpus scans, exactly like serving.
    */
  def truncationRecall(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      prefixDim: Int = 16): DataFrame = {
    val exact = bruteForceTopK(embeddings, numQueries, k)
      .select(col("query_id"), col("vec_id"))
    val truncated = bruteForceTopK(
        embeddings.select(col("vec_id"),
          slice(col("embedding"), 1, prefixDim).as("embedding")),
        numQueries, k)
      .select(col("query_id"), col("vec_id"))
    exact
      .join(truncated.withColumn("hit", lit(1L)),
        Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / k).as("recall"))
  }

  /** Cluster labeling — the corpus-exploration step after clustering
    * (WebOrganizer / topic-discovery style, public literature): each
    * published-IVF cluster is described by its `topN` most
    * DISTINCTIVE terms, ranked by lift = the term's in-cluster relative
    * frequency over its corpus-wide relative frequency (floor `minTf`
    * in-cluster occurrences so one-off tokens can't top the list).
    * Documents join the assignment on doc_id = vec_id (the corpus
    * contract: embeddings are row-aligned with documents). All counts
    * are integers; lift = (c_tf · g_total) / (c_total · g_tf) is one
    * IEEE multiply-divide over exact-in-double integers, rounded 6 dp
    * BEFORE the rank cut, so the top-N is bit-deterministic across
    * engines. Scale shape: map-only nlist dots per vector (assignment
    * against the published centroid literals) + one corpus equi-join +
    * token-grain partial aggs; the per-cluster and corpus totals are
    * nlist-sized/1-row broadcasts and the rank window partitions by
    * cluster (bounded by per-cluster vocabulary, never global).
    */
  def clusterTermsPublished(
      embeddings: DataFrame,
      docs: DataFrame,
      baseDir: String,
      slug: String,
      topN: Int = 5,
      minTf: Long = 3L,
      nlist: Int = 16,
      iters: Int = 3): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val assigned = assignVectors(embeddings, cents)
      .select(col("vec_id").as("doc_id"), col("cluster"))
    val toks = Partitioning.ensureParallelism(docs, col("doc_id"))
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .join(assigned, Seq("doc_id"))
    val ctf = toks.groupBy(col("cluster"), col("term"))
      .agg(count(lit(1)).as("c_tf"))
    val gtf = toks.groupBy(col("term")).agg(count(lit(1)).as("g_tf"))
    val ctot = toks.groupBy(col("cluster")).agg(count(lit(1)).as("c_total"))
    val gtot = toks.agg(count(lit(1)).as("g_total"))
    val scored = ctf
      .join(gtf, Seq("term"))
      .join(broadcast(ctot), Seq("cluster"))
      .crossJoin(broadcast(gtot))
      .where(col("c_tf") >= minTf)
      .select(col("cluster"), col("term"), col("c_tf"), col("g_tf"),
        graft.functions.OracleRound.roundN(
          (col("c_tf").cast("double") * col("g_total").cast("double")) /
            (col("c_total").cast("double") * col("g_tf").cast("double")),
          6).as("lift"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("lift").desc, col("c_tf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(col("cluster"), col("rank"), col("term"),
        col("c_tf"), col("g_tf"), col("lift"))
  }

  /** Contrastive triplet mining — the (anchor, positive, negative)
    * training-example former (Schroff et al. CVPR'15 FaceNet triplets,
    * public literature): per query the most-similar SAME-label vector
    * (the positive) and the most-similar DIFFERENT-label vector (the
    * hard negative, [[hardNegatives]]' top pick), plus the margin
    * pos − neg a triplet loss would see — margin ≤ 0 marks the
    * violations worth training on. ONE scored pass (the bruteForceTopK
    * chain) feeds BOTH rank-1 cuts; all cosines the sequential fold, so
    * the margin subtraction is bit-exact cross-engine.
    *
    * Scale shape: identical to [[bruteForceTopK]] — bounded query
    * broadcast, corpus map-only, two per-query windows over the same
    * scored frame; at 100 TB the mining cost is |queries| corpus scans.
    */
  def triplets(embeddings: DataFrame, numQueries: Int = 10): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val queries = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("v").as("qv"), col("nrm").as("qn"))
    val scored = OpCache.materialize(
      e.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("q_label"), col("vec_id"), col("label"),
          VectorOps.cosineWithNorms(
            VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm"))
            .as("cosine")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    def top1(pred: Column, idName: String, cosName: String) = scored
      .where(pred)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("query_id"), col("q_label").as("label"),
        col("vec_id").as(idName), col("cosine").as(cosName))
    top1(col("label") === col("q_label"), "pos_id", "pos_cos")
      .join(top1(col("label") =!= col("q_label"), "neg_id", "neg_cos")
          .drop("label"),
        Seq("query_id"))
      .select(col("query_id"), col("label"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
  }

  /** k-center greedy coreset (farthest-point sampling — Sener & Savarese
    * ICLR'18 "Active Learning for CNNs: A Core-Set Approach", public
    * literature): pick `k` vectors so every corpus vector is close to
    * some pick — seed = the smallest vec_id, then repeatedly take the
    * vector FARTHEST (max of min cosine distance, 9 dp-rounded before
    * the argmax, vec_id tie-break) from the picked set. The classic
    * 2-approximation to the k-center cover, the coreset/dataset-
    * distillation selection rule. Each step is ONE map-only corpus pass
    * (distances against ≤ k picked-vector literals) ending in a single
    * TakeOrdered-1 action — the k-means driver topology, exactly k
    * corpus scans and k·dim doubles pulled total; the output `mindist` is the
    * coverage radius AT pick time, the curve a coreset user reads to
    * choose k. At 100 TB the cost is k corpus scans, embarrassingly
    * parallel, no joins, no windows.
    */
  def kCenterCoreset(embeddings: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be positive")
    val base = OpCache.materialize(
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v")))
        .select(col("vec_id"),
          transform(col("v"), x => x / col("nrm")).as("nv")))
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getAs[scala.collection.Seq[Double]]("nv").toArray
    val seed = base.orderBy(col("vec_id")).limit(1).collect()
    require(seed.nonEmpty, "kCenterCoreset needs a non-empty corpus")
    var picked = List((seed(0).getLong(0), vecOf(seed(0)), Option.empty[Double]))
    (2 to k).foreach { _ =>
      val dists = picked.map { case (_, nv, _) =>
        graft.functions.OracleRound.roundN(
          lit(1.0) - VectorOps.dot(col("nv"), array(nv.map(lit): _*)), 9)
      }
      // ONE TakeOrdered action per pick: (mind desc, vec_id asc) limit 1
      // IS the rounded argmax with the min-id tie-break; a corpus
      // smaller than k degrades to fewer picks (the oracle's step CTEs
      // go empty the same way)
      val pick = base
        .where(!col("vec_id").isin(picked.map(_._1): _*))
        .select(col("vec_id"), col("nv"),
          (if (dists.size == 1) dists.head else least(dists: _*)).as("mind"))
        .orderBy(col("mind").desc, col("vec_id"))
        .limit(1).collect()
      pick.headOption.foreach { r =>
        picked = picked :+ ((r.getLong(0), vecOf(r), Some(r.getDouble(2))))
      }
    }
    embeddings.sparkSession.createDataFrame(
      picked.zipWithIndex.map { case ((id, _, d), i) => (i + 1, id, d) })
      .toDF("pick", "vec_id", "mindist")
  }

  /** Hybrid retrieval via reciprocal rank fusion (Cormack et al.
    * SIGIR'09, public literature): fuse the embedding top-`poolK` with a
    * lexical top-`poolK`, per query, by rrf = Σ 1/(rrfK + rank) over the
    * lists that retrieved the doc — the standard hybrid-search serving
    * shape (dense vector + sparse lexical, two candidate formers whose
    * fusion beats either alone). Queries are the first `numQueries`
    * corpus documents (doc_id = vec_id, the corpus row-alignment
    * contract). The lexical score is deliberately INTEGER —
    * Σ (N − df_t) over DISTINCT shared terms, so rarer terms weigh more
    * and the rank order is exact on any engine; the embedding rank is
    * the oracle-anchored [[bruteForceTopK]] chain; the fused score is a
    * two-term IEEE sum of reciprocals rounded 6 dp BEFORE the final cut.
    *
    * Scale shape: the corpus explodes to DISTINCT (doc, term) postings
    * ONCE (term-keyed shuffle, the inverted-index discipline); the
    * bounded query-term set broadcasts into the postings equi-join —
    * never doc × doc; the embedding side is the bounded-broadcast
    * corpus scan; fusion is a poolK·|queries|-row full outer join.
    */
  def hybridRrf(
      embeddings: DataFrame,
      docs: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      poolK: Int = 20,
      rrfK: Int = 60): DataFrame = {
    val emb = bruteForceTopK(embeddings, numQueries, poolK)
      .select(col("query_id"), col("vec_id"), col("rank").as("rank_emb"))
    val postings = OpCache.materialize(
      Partitioning.ensureParallelism(docs, col("doc_id"))
        .select(col("doc_id"),
          explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term")))
    val dfT = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val qTerms = postings.where(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    val lexScores = postings
      .join(broadcast(qTerms), Seq("term"))
      .where(col("doc_id") =!= col("query_id"))
      .join(dfT, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("n_docs") - col("df")).as("lex_score"))
    val wLex = Window.partitionBy(col("query_id"))
      .orderBy(col("lex_score").desc, col("doc_id"))
    val lex = lexScores
      .withColumn("rank_lex", row_number().over(wLex))
      .where(col("rank_lex") <= poolK)
      .select(col("query_id"), col("doc_id").as("vec_id"), col("rank_lex"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("vec_id"))
    emb.join(lex, Seq("query_id", "vec_id"), "full_outer")
      .withColumn("rrf", graft.functions.OracleRound.roundN(
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_emb")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        col("rank_emb").cast("int").as("rank_emb"),
        col("rank_lex").cast("int").as("rank_lex"), col("rrf"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein SIGIR'98,
    * public literature): greedily pick `k` of the top-`poolK` exact
    * candidates so each pick maximizes λ·rel(d) − (1−λ)·max_{s∈picked}
    * sim(d, s) — relevance traded against redundancy, the diversity
    * re-rank a retrieval tier runs AFTER the candidate former (near-dup
    * corpus hits otherwise fill the whole top-k). First pick = the top
    * candidate; every later step scores the REMAINING pool against the
    * picked set's pairwise cosines. All cosines are the bruteForce
    * sequential fold (bit-identical cross-engine); each step's score is
    * rounded 6 dp BEFORE its argmax cut, vec_id breaking ties.
    *
    * Scale shape: the greedy loop is inherently sequential and its
    * whole state is |queries|·poolK scored rows + their vectors — a
    * documented BOUNDED pull (the centroid/codebook class), so the
    * selection runs driver-side (the kCenterCoreset/epochPlan fill
    * topology; the first cut unrolled it as k−1 distributed argmax
    * steps, which spent ~10× the candidate former's cost on scheduling
    * grid-sized jobs). The corpus is touched only by the candidate
    * former. At 100 TB the re-rank cost is the serving tier's:
    * |queries| · poolK², independent of corpus size.
    */
  def mmrRerank(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      poolK: Int = 10,
      lambda: Double = 0.5): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val cand = bruteForceTopK(embeddings, numQueries, poolK)
      .select(col("query_id"), col("vec_id"), col("cosine").as("rel"))
    // bounded pulls (the centroid/codebook class): |queries|·poolK
    // scored rows, then the ≤ |queries|·poolK candidate VECTORS — the
    // greedy selection itself runs driver-side on poolK²-sized state
    // (the kCenterCoreset/epochPlan fill topology); the corpus is
    // touched only by the candidate former
    val candRows = cand.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = candRows.map(_._2).distinct.toSeq
    val vecs = e.where(col("vec_id").isin(ids: _*)).collect()
      .map { r =>
        (r.getLong(0),
          r.getAs[scala.collection.Seq[Double]]("v").toArray,
          r.getDouble(2))
      }
      .map { case (id, v, nrm) => id -> ((v, nrm)) }.toMap
    def dotJ(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def simJ(x: Long, y: Long): Double = {
      val (vx, nx) = vecs(x); val (vy, ny) = vecs(y)
      dotJ(vx, vy) / (nx * ny)
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val picks = candRows.groupBy(_._1).toSeq.flatMap { case (q, cands) =>
      val rel = cands.map(c => c._2 -> c._3).toMap
      var picked = List.empty[Long]
      // a pool smaller than k degrades to fewer picks — the oracle's
      // step CTEs go empty the same way
      (1 to math.min(k, rel.size)).map { t =>
        val scored = rel.keys.filterNot(picked.contains).map { d =>
          val pen = if (picked.isEmpty) 0.0
                    else picked.map(s => simJ(d, s)).max
          (d, r6(lambda * rel(d) - (1.0 - lambda) * pen))
        }.toSeq
        val (d, sc) = scored.minBy { case (v, m) => (-m, v) }
        picked = picked :+ d
        (q, d, t, sc)
      }
    }
    embeddings.sparkSession.createDataFrame(picks)
      .toDF("query_id", "vec_id", "pick", "mmr")
  }

  /** Nearest-centroid label agreement — the embedding-quality eval over
    * [[labelCentroids]]: every vector is classified by its most-cosine-
    * similar class prototype and scored against its true label, yielding
    * per-label prototype-classification accuracy. Centroid dimensions are
    * the ROUNDED means (the oracle-checked values), and both dot products
    * are sequential HOF folds, so the argmax is bit-deterministic across
    * engines. Scale shape: the centroid table is labels × dim (constant),
    * broadcast against a map-only corpus pass; the only corpus-keyed
    * exchange is the final per-label aggregate.
    */
  def centroidAgreement(embeddings: DataFrame): DataFrame = {
    val cents = labelCentroids(embeddings)
      .groupBy(col("label").as("c_label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("dim_mean")))),
        s => s.getField("dim_mean")).as("cv"))
      .withColumn("cn", VectorOps.l2Norm(col("cv")))
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), col("label"),
        VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("c_label"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("v"), col("cv")), col("nrm"), col("cn")).as("cos"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("c_label"))
    scored
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("label") === col("c_label"), 1L).otherwise(0L)).as("n_correct"),
        graft.functions.OracleRound.round4(
          sum(when(col("label") === col("c_label"), 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double")).as("accuracy"))
  }

  /** Deterministic random hyperplanes: `tables` × `bits` planes of `dim`
    * gaussian components, fixed seed.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Deterministic md5-keyed hyperplanes — the ORACLE-EXPRESSIBLE LSH
    * family (same pattern as `Dedup.simhashSqlSignatures`): component
    * (t, b, i) = 2·u − 1 with u = (first 13 hex digits of
    * md5("hp:t:b:i") read base-16) / 2^52. 13 hex digits = 52 bits keeps
    * the integer EXACTLY representable in a double, and division by a
    * power of two is exact scaling, so DuckDB reproduces every component
    * bit-for-bit from the same md5 — no RNG, no engine-specific seed.
    * Uniform (not gaussian) directions are still a valid sign-LSH family
    * (any origin-symmetric direction distribution works for sign buckets);
    * SimilaritySpec measures the recall against brute force.
    */
  def mdHyperplanes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (t, b, i) =>
      val hex = mdig.digest(s"hp:$t:$b:$i".getBytes("UTF-8"))
        .map(x => f"${x & 0xff}%02x").mkString
      val v = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      v.toDouble / 4503599627370496.0 * 2 - 1
    }
  }

  /** Sign-bit bucket id of vector column `v` for one table's planes —
    * one fused codegen'd pass over the plane matrix as task data
    * ([[graft.functions.LshBucketExpr]]; the per-plane literal-dot
    * spelling put bits·dim Literal nodes per table into the plan).
    */
  private[graft] def bucketId(v: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.LshBucketExpr(
      GraftBridge.expression(v), planes))
  }

  /** Spherical k-means coarse quantizer for IVF: deterministic init (the
    * first `nlist` vectors), fixed `iters` Lloyd rounds. Assignment is
    * argmax dot against L2-normalized centroids; the (tiny) centroid set
    * is pulled to the driver each round and re-broadcast as literals —
    * the standard k-means topology (per-round cost: one map over the
    * corpus + one (cluster, dim)-keyed partial aggregation).
    *
    * `init` WARM-STARTS Lloyd from a prior centroid set instead of the
    * first-nlist init — the [[graft.operators.Graph.publishedNodeEmbeddings]]
    * refresh discipline applied to k-means (round-15 verdict item 4): a
    * data refresh under the same hyperparameters seeds from the table it
    * supersedes and converges in fewer rounds. A dimension change in the
    * corpus is self-healing (assignment dots fold the common prefix; the
    * first mean update re-derives centroids at the corpus's true dim).
    */
  def trainIvfCentroids(
      embeddings: DataFrame,
      nlist: Int = 16,
      iters: Int = 3,
      init: Option[Array[Array[Double]]] = None,
      sampleCap: Long = 0): Array[Array[Double]] = {
    init.foreach(c => require(c.length == nlist,
      s"warm-start init must carry nlist=$nlist centroids, got ${c.length}"))
    val base = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nv", transform(col("v"), x => x / VectorOps.l2Norm(col("v"))))
      .select(col("vec_id"), col("nv"))
    // sample-capped Lloyd rounds (round 17 — the 100 TB training
    // contract): under the nlist ∝ corpus deployment rule, full-corpus
    // assignment costs O(N·nlist·dim) PER ROUND = quadratic in the
    // corpus — infeasible long before serving breaks. With sampleCap > 0
    // the rounds run over a deterministic xxhash64 subset of ~sampleCap
    // vectors (the Faiss-style ~256·nlist training sample); the INIT
    // stays the full frame's first nlist vectors, so a cap larger than
    // the corpus degenerates to exactly the uncapped training (pinned by
    // SimilaritySpec). Centroid VALUES differ under a binding cap — the
    // serving contract is unchanged because every consumer (and the
    // DuckDB oracle) replays from the PUBLISHED table, whatever its
    // training regime.
    val e = (if (sampleCap <= 0) base
      else {
        val n = base.count() // training-time only: one bounded count
        if (n <= sampleCap) base
        else {
          val every = (n + sampleCap - 1) / sampleCap
          base.where(abs(xxhash64(concat(lit("ivfs:"),
            col("vec_id").cast("string")))) % every === 0L)
        }
      }).persist()
    def normalize(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var cents: Array[Array[Double]] = init.map(_.map(normalize))
      .getOrElse(base.where(col("vec_id") < nlist)
      .orderBy(col("vec_id")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("nv").toArray)
      .map(normalize))
    (1 to iters).foreach { _ =>
      val assigned = e.withColumn("cluster", assignCluster(col("nv"), cents))
      val sums = assigned
        .select(col("cluster"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      cents = cents.indices.map { c =>
        byCluster.get(c) match {
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val arr = new Array[Double](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            normalize(arr)
          case None => cents(c) // empty cluster keeps its centroid
        }
      }.toArray
    }
    e.unpersist()
    cents
  }

  /** Map-only nearest-centroid assignment of a corpus against FIXED
    * centroids — the serving-side pass [[ivfTopK]] runs internally,
    * exposed for incremental index maintenance
    * ([[graft.streaming.StreamOps.ivfAssignSink]]): each vector's cluster
    * depends only on (vector, centroids), so assigning a growing corpus
    * batch-at-a-time equals whole-corpus assignment EXACTLY (the argmax
    * ties on centroid index, a total order). Output: (vec_id, cluster,
    * v, nrm) — everything exact rerank needs, no second read of the raw
    * table.
    */
  def assignVectors(
      embeddings: DataFrame, cents: Array[Array[Double]]): DataFrame =
    Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
      .withColumn("cluster",
        assignCluster(transform(col("v"), x => x / col("nrm")), cents))
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"))

  /** Cohort-side broadcast cap for the IVF probe equi-join (round-16
    * verdict item 1): an exploded probe row carries the full query vector
    * (~dim·8 B + key ≈ 0.6 KB at dim 64), so 2M exploded rows ≈ 1.2 GB —
    * comfortably under Spark's 8 GiB BroadcastExchange hard cap with
    * headroom for the driver and executors holding the build map. Below
    * the cap the query side is broadcast (map-side join, no shuffle of
    * the corpus); above it the hint is DROPPED and the equi-join
    * shuffles both sides hash-partitioned on `cluster` — the corpus side
    * is bucketed at ~250 vectors/cluster by the nlist rule, so the
    * shuffle is balanced by construction and the plan survives cohorts
    * of any size instead of aborting at the broadcast limit.
    */
  private[graft] val MaxBroadcastProbeRows: Long = 2L * 1000 * 1000

  /** Ordered top-`nprobe` centroid scores — `array<struct<d, i>>`, dot
    * descending, ties to the larger list id — as ONE codegen'd expression
    * carrying the centroid matrix as task-binary data
    * ([[graft.functions.CentroidProbesExpr]]). Round 16 spelled this as
    * `slice(reverse(array_sort(array(struct(dot(nv, array(lit…)))…))))`:
    * nlist·dim Literal NODES in every serving plan, which under the
    * nlist ∝ corpus rule grows to millions of expression nodes at 100×
    * and kills analysis/codegen long before execution. Plan size is now
    * constant in nlist; every dot is the same sequential fold, so values
    * are bit-identical (OperatorsSpec pins both engines element-wise).
    */
  private[graft] def probeStructs(
      nv: Column, cents: Array[Array[Double]], nprobe: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.CentroidProbesExpr(
      GraftBridge.expression(nv), cents, nprobe))
  }

  /** [[probeStructs]] with two-level selection: top-`gprobe` groups by
    * group-centroid dot, then top-`nprobe` among their member centroids —
    * O(√nlist·(1+gprobe)) dots per row instead of O(nlist)
    * ([[graft.functions.HierCentroidProbesExpr]]; groups from
    * [[publishedIvfGroups]], map derived via [[assignGroup]]).
    */
  private[graft] def hierProbeStructs(
      nv: Column, gcents: Array[Array[Double]],
      cents: Array[Array[Double]], gprobe: Int, nprobe: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.HierCentroidProbesExpr(
      GraftBridge.expression(nv), gcents,
      cents.map(assignGroup(_, gcents)), cents, gprobe, nprobe))
  }

  /** argmax-dot cluster assignment against the trained centroids (max by
    * dot, ties by larger list id) — the nprobe=1 head of [[probeStructs]].
    */
  private[operators] def assignCluster(nv: Column, cents: Array[Array[Double]]): Column =
    probeStructs(nv, cents, 1).getItem(0).getField("i")

  /** Memoized centroid store: train-once, search-many. Keyed by a
    * caller-supplied corpus key (e.g. the dataset path) + params, so
    * repeated searches — the bench's median-of-N runs, or a query service —
    * never retrain. The cached value is nlist×dim doubles (bounded, tiny).
    */
  private val centroidCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, Array[Array[Double]])]()

  /** Input fingerprint for the training memos: one map-side pass over
    * (vec_id, embedding) — stale-key violations of the memo contract must
    * fail loudly, never silently serve centroids trained on other data.
    */
  private def embeddingFingerprint(embeddings: DataFrame): PublishGuard.Fingerprint =
    PublishGuard.fingerprint(embeddings, Seq(col("vec_id"), col("embedding")))

  /** Centroids for `cacheKey`, training at most once per (key, params).
    *
    * CONTRACT: `cacheKey` must encode the DATA VERSION, not just its
    * location — for mutable datasets, fold a version/snapshot id or a
    * file-listing fingerprint (paths + mtimes) into the key, or pass
    * `cacheKey = ""` to retrain per call. Violations are DETECTED: the
    * memo records the training input's fingerprint and every reuse
    * re-fingerprints the current input (map-side pass, no shuffle) —
    * a stale key raises instead of bucketing with stale centroids.
    */
  def ivfCentroids(
      embeddings: DataFrame,
      nlist: Int = 16,
      iters: Int = 3,
      cacheKey: String = ""): Array[Array[Double]] =
    if (cacheKey.isEmpty) trainIvfCentroids(embeddings, nlist, iters)
    else {
      val fp = embeddingFingerprint(embeddings)
      val (storedFp, cents) = centroidCache.computeIfAbsent(
        s"$cacheKey|$nlist|$iters",
        _ => (fp, trainIvfCentroids(embeddings, nlist, iters)))
      PublishGuard.verifyMemo(storedFp, fp, s"IVF centroids for key '$cacheKey'")
      cents
    }

  /** IVF ANN top-k: corpus vectors are bucketed by nearest centroid
    * (map-only once trained); each query probes its `nprobe` closest
    * centroids' buckets and reranks candidates by exact cosine. Candidate
    * count ≈ nprobe/nlist of the corpus — the inverted-file scale path,
    * complementary to [[lshTopK]].
    *
    * Training is split from search: pass `centroids` (or a `cacheKey` for
    * the memo) so the k-means runs once per corpus, not per query call.
    */
  def ivfTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3,
      centroids: Option[Array[Array[Double]]] = None,
      cacheKey: String = "",
      queryTable: Option[DataFrame] = None,
      broadcastQueries: Option[Boolean] = None,
      hierGroups: Option[(Array[Array[Double]], Int)] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(embeddings, nlist, iters, cacheKey))
    // the bucketed corpus feeds both the query side and the probe join
    val e = OpCache.materialize(
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v")))
        .withColumn("nv", transform(col("v"), x => x / col("nrm")))
        .withColumn("cluster", assignCluster(col("nv"), cents)))

    // per-query probe list: nprobe clusters with the highest centroid dot
    // (the transform runs over nprobe elements, not nlist — the nlist-wide
    // scoring is fused inside the codegen'd probeStructs expression;
    // hierGroups switches selection to the TWO-LEVEL published group
    // quantizer — top-gprobe groups, then their members only)
    val probes = transform(hierGroups match {
      case Some((gcents, gprobe)) =>
        hierProbeStructs(col("nv"), gcents, cents, gprobe, nprobe)
      case None => probeStructs(col("nv"), cents, nprobe)
    }, s => s.getField("i"))
    // probe lists EXPLODE into (query, cluster) rows so the candidate
    // former is an EQUI-join on the cluster id (round 16): the previous
    // array_contains gate had no equi key, so Spark ran a
    // BroadcastNestedLoopJoin evaluating ALL |Q|·corpus pairs — the
    // pruning cut the output, not the scan, and an every-user cohort
    // (graft.IvfServingBench) paid the full quadratic pass. The exploded
    // join evaluates exactly the candidate set (nprobe/nlist of
    // |Q|·corpus); probe lists are distinct cluster ids, so the
    // candidate SET — and every downstream value — is unchanged.
    val queriesBase = queryBase(e, numQueries, queryTable)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), probes.as("probe_clusters"))
    // size-gate the cohort-side broadcast (round-16 verdict item 1; the
    // shared MaxBroadcastProbeRows contract): the internal numQueries
    // path is bounded by construction, but an external queryTable can be
    // cohort-shaped — measure it (count prunes the probe scorer) and
    // drop the hint above the cap so the join shuffles on `cluster`
    // instead of aborting at Spark's 8 GiB broadcast limit
    val bq = broadcastQueries.getOrElse(queryTable.isEmpty ||
      queriesBase.count() * nprobe <= MaxBroadcastProbeRows)
    val queries = queriesBase
      .select(col("query_id"), col("qv"), col("qn"),
        explode(col("probe_clusters")).as("cluster"))

    val cands = e.join(if (bq) broadcast(queries) else queries, Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, Array[Array[Array[Double]]])]()

  /** Test hook: drop the in-JVM read-through caches so a spec can simulate
    * a FRESH session against an already-published artifact table.
    */
  private[graft] def clearTrainingCaches(): Unit = {
    centroidCache.clear()
    pqCache.clear()
    groupCache.clear()
  }

  /** Product-quantization codebooks: the L2-normalized vectors are cut
    * into `m` subspaces of dim/m components and each subspace gets its own
    * `ksub`-centroid k-means codebook (plain Lloyd, deterministic init
    * from the first `ksub` subvectors, means NOT renormalized — PQ
    * centroids are plain averages). Returned as [m][ksub][dim/m] literal
    * arrays; the collect per round is bounded at ksub × dim/m doubles.
    *
    * Same memo contract as [[ivfCentroids]]: `cacheKey` must encode the
    * data version; empty key retrains per call; a stale key is detected
    * via the recorded input fingerprint and raises.
    */
  def pqCodebooks(
      embeddings: DataFrame,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      cacheKey: String = ""): Array[Array[Array[Double]]] = {
    if (cacheKey.isEmpty) trainPqCodebooks(embeddings, m, ksub, iters, dim)
    else {
      val fp = embeddingFingerprint(embeddings)
      val (storedFp, books) = pqCache.computeIfAbsent(
        s"$cacheKey|pq|$m|$ksub|$iters|$dim",
        _ => (fp, trainPqCodebooks(embeddings, m, ksub, iters, dim)))
      PublishGuard.verifyMemo(storedFp, fp, s"PQ codebooks for key '$cacheKey'")
      books
    }
  }

  /** All `m` PQ subspace codes in ONE fused codegen'd pass
    * ([[graft.functions.PqCodesExpr]] — the [[probeStructs]] discipline
    * for codebooks: constant plan size, no m·ksub literal trees).
    * Returns `array<int>` of length m; consumers extract per-subspace
    * columns from the array attribute, computed once per row.
    */
  private[graft] def pqCodes(
      nv: Column, books: Array[Array[Array[Double]]], dsub: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.PqCodesExpr(
      GraftBridge.expression(nv), books, dsub))
  }

  /** Nearest codebook entry for a subvector: argmin ‖x−c‖² computed as
    * argmax (x·c − ‖c‖²/2) — exact, since ‖x‖² is common to all entries;
    * ties → larger code. The single-book head of [[pqCodes]].
    */
  private def nearestCode(sv: Column, book: Array[Array[Double]]): Column =
    pqCodes(sv, Array(book), book(0).length).getItem(0)

  /** `init` warm-starts each subspace's Lloyd rounds from a prior
    * codebook (round-15 verdict item 4 — see [[trainIvfCentroids]]).
    */
  def trainPqCodebooks(
      embeddings: DataFrame,
      m: Int,
      ksub: Int,
      iters: Int,
      dim: Int,
      init: Option[Array[Array[Array[Double]]]] = None): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    require(m * dsub == dim, s"m=$m must divide dim=$dim")
    init.foreach(b => require(b.length == m && b.forall(_.length == ksub),
      s"warm-start init must be m=$m codebooks of ksub=$ksub entries"))
    val e = embeddings
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nv", transform(col("v"), x => x / VectorOps.l2Norm(col("v"))))
      .select(col("vec_id"), col("nv"))
      .persist()
    try {
      (0 until m).map { s =>
        val sub = e.select(col("vec_id"), slice(col("nv"), s * dsub + 1, dsub).as("sv"))
        var cents: Array[Array[Double]] = init.map(_(s))
          .getOrElse(sub.where(col("vec_id") < ksub)
          .orderBy(col("vec_id")).collect()
          .map(_.getAs[scala.collection.Seq[Double]]("sv").toArray))
        (1 to iters).foreach { _ =>
          val sums = sub
            .withColumn("cluster", nearestCode(col("sv"), cents))
            .select(col("cluster"), posexplode(col("sv")).as(Seq("pos", "x")))
            .groupBy(col("cluster"), col("pos"))
            .agg(avg(col("x")).as("mcol"))
            .collect()
          val byCluster = sums.groupBy(_.getInt(0))
          cents = cents.indices.map { cIdx =>
            byCluster.get(cIdx) match {
              case Some(rows) =>
                val arr = new Array[Double](dsub)
                rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
                arr
              case None => cents(cIdx) // empty cluster keeps its centroid
            }
          }.toArray
        }
        cents
      }.toArray
    } finally e.unpersist()
  }

  /** [[ivfTopK]] with the TRAINING/SERVING split made physical: the
    * trained centroids are PUBLISHED as a parquet table
    * (`baseDir/slug`: list_id, centroid) and the serving path —
    * nearest-centroid assignment, per-query nprobe probe lists, exact
    * cosine rerank — runs against exactly those published values. Every
    * serving step is a sequential IEEE fold with explicit tie-breaks, so
    * an external engine reading the same table reproduces assignment,
    * candidates and top-k bit-for-bit (the driver's DuckDB oracle does).
    * K-means TRAINING is what is not bit-reproducible across engines
    * (float means depend on partitioning/association) — which is exactly
    * why the split point is a published table: train once, serve
    * deterministically everywhere. The production deployment shape for a
    * 100 TB corpus is the same: training samples the corpus, serving is
    * map-only against the published nlist×dim table.
    */
  def ivfTopKPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      iters: Int = 3,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    ivfTopK(embeddings, numQueries, k, nlist, nprobe, iters, Some(cents),
      queryTable = queryTable)
  }

  /** [[ivfTopKPublished]] with TWO-LEVEL probe selection (round 17): the
    * same published centroid artifact plus the √nlist-group quantizer
    * from [[publishedIvfGroups]] — per-query probe selection scores
    * ngroups group centroids and only the top-`gprobe` groups' members,
    * O(√nlist·(1+gprobe)) dots instead of O(nlist). Selection is
    * approximate exactly like IVF probing itself (the recall knob is
    * gprobe beside nprobe); the DuckDB oracle replays both stages from
    * the two published tables.
    */
  def ivfTopKPublishedHier(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      gprobe: Int = 2,
      ngroups: Int = 0,
      iters: Int = 3,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val gcents = publishedIvfGroups(
      embeddings, baseDir, slug, nlist, iters, ngroups,
      centroids = Some(cents))
    ivfTopK(embeddings, numQueries, k, nlist, nprobe, iters, Some(cents),
      queryTable = queryTable, hierGroups = Some((gcents, gprobe)))
  }

  /** Write trained IVF centroids as a (list_id, centroid) parquet table.
    * nlist rows × dim doubles — driver-bounded; one file is the right
    * physical shape for a table this small.
    */
  private def writeCentroidTable(
      spark: SparkSession, cents: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.parquet(path)
  }

  /** Write trained PQ codebooks as an (s, j, centroid) parquet table:
    * one row per (subspace, code) pair, m × ksub rows of dim/m doubles.
    */
  private def writeCodebookTable(
      spark: SparkSession, books: Array[Array[Array[Double]]], path: String): Unit = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toSeq.toDF("s", "j", "centroid")
      .coalesce(1)
      .write.parquet(path)
  }

  /** One code path for every published training artifact — the
    * PUBLISHED TABLE is the single source of truth (round-6 verdict
    * item 7; previously the in-JVM memo and the published table were two
    * independent paths with separate fingerprint checks, and publication
    * bypassed PublishGuard). Semantics are those of a materialized view
    * keyed by the input fingerprint:
    *
    *  - table exists with a matching `_GRAFT_FINGERPRINT` sidecar → load
    *    and serve its values (any session, any JVM);
    *  - table missing → train, publish via [[PublishGuard.publishAtomic]]
    *    (sidecar written INTO staging, so table + fingerprint appear
    *    atomically), then read BACK from the published table — under a
    *    publish race every JVM serves the winner's bits;
    *  - table exists but the sidecar mismatches the CURRENT input →
    *    the artifact is out of date: retrain and atomically republish
    *    (never silently serve stale values, never hard-error on a mere
    *    refresh — the loud-error contract of `verifyMemo`/`cacheKey` is
    *    for user-claimed version tokens; a path-keyed table can always
    *    be rebuilt from the data in front of us). One retry: if the
    *    republished sidecar STILL mismatches, a concurrent publisher is
    *    training on different data under the same path — that is the
    *    unresolvable conflict, and it throws.
    *
    * The in-JVM `cache` is a READ-THROUGH cache over the table only: it
    * can skip the filesystem read for repeated plan builds (bench's
    * median-of-N), but its hit is honored only when the memoized
    * fingerprint matches the current input — otherwise it falls through
    * to the table logic above.
    */
  /** `warm` (optional) retrains a STALE artifact seeded from the prior
    * published value instead of from scratch — the
    * [[graft.operators.Graph.publishedNodeEmbeddings]] warm-start
    * discipline generalized to the whole artifact family (round-15
    * verdict item 4). The prior value is loaded BEFORE the staging-first
    * replace (the live table stays readable throughout); an unreadable
    * prior falls back to the cold `train`. `notes(warmUsed)` lands in the
    * sidecar so the EFFECTIVE schedule of the table on disk is recorded
    * (the path slug carries only the nominal hyperparameters).
    */
  private[operators] def publishedArtifact[A](
      spark: SparkSession,
      path: String,
      paramsKey: String,
      fp: PublishGuard.Fingerprint,
      cache: java.util.concurrent.ConcurrentHashMap[String, (PublishGuard.Fingerprint, A)],
      train: () => A,
      write: (A, String) => Unit,
      load: () => A,
      what: String,
      warm: Option[A => A] = None,
      notes: Boolean => Map[String, String] = _ => Map.empty): A = {
    val key = s"published|$path|$paramsKey"
    val hit = cache.get(key)
    if (hit != null && hit._1 == fp) hit._2
    else {
      val outPath = new org.apache.hadoop.fs.Path(path)
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def publish(): Unit = PublishGuard.publishAtomic(spark, path) { staging =>
        write(train(), staging)
        PublishGuard.writeSidecar(
          fs, new org.apache.hadoop.fs.Path(staging), fp, notes(false))
      }
      if (!fs.exists(outPath)) publish()
      else if (PublishGuard.readSidecar(fs, outPath) != Some(fp)) {
        // out-of-date (or sidecar-less pre-refactor) artifact: rebuild —
        // staging-first (PublishGuard.replaceAtomic), so concurrent
        // readers of the live table see at most the delete→rename
        // metadata window, never the retraining gap. With `warm`, the
        // prior table (still live) seeds the retrain.
        val (retrain, warmUsed) = warm match {
          case Some(wf) =>
            val prior =
              try Some(load())
              catch { case scala.util.control.NonFatal(_) => None }
            prior match {
              case Some(p) => (() => wf(p), true)
              case None => (train, false)
            }
          case None => (train, false)
        }
        PublishGuard.replaceAtomic(spark, path) { staging =>
          write(retrain(), staging)
          PublishGuard.writeSidecar(
            fs, new org.apache.hadoop.fs.Path(staging), fp, notes(warmUsed))
        }
      }
      PublishGuard.verifySidecar(fs, outPath, fp, what)
      val value = load()
      cache.put(key, (fp, value))
      value
    }
  }

  /** Semantic deduplication over the published IVF clustering — the
    * SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication", 2023 — public
    * literature, no code consulted): k-means-cluster the embedding
    * corpus, compare pairs only WITHIN a cluster, and keep one
    * representative (min vec_id) per cosine-≥`tau` connected group.
    * Near-duplicate *meanings* — paraphrases, boilerplate variants —
    * collapse even when no token-level dedup fires; the pruned corpus
    * trains faster at equal quality, which is the whole point of the
    * method.
    *
    * Output: (vec_id, cluster, rep_id, kept) — `cluster` the coarse
    * k-means cell, `rep_id` the semantic-group representative, `kept`
    * whether this row survives the prune.
    *
    * Scale shape: assignment is map-only against the PUBLISHED
    * centroid table ([[publishedIvfCentroids]] — train once, serve
    * everywhere; the DuckDB oracle replays assignment + prune from the
    * same table bit-for-bit). The pair former is an equi-join on the
    * cluster id — bucketed, never corpus²: with nlist scaled ∝ corpus
    * size (the SemDeDup deployment), per-cluster population stays
    * bounded and the join's per-key fan-out with it. Component
    * collapse reuses the CC loop ([[Dedup.clustersFromPairs]]), whose
    * shuffle width is tied to the (tiny) pair-graph size. Every cosine
    * is the sequential-fold dot of L2-normalized vectors — exact
    * cross-engine threshold semantics, the [[bruteForceTopK]]
    * discipline.
    */
  def semanticPrunePublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3,
      tau: Double = 0.45): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val assigned = OpCache.materialize(
      assignVectors(embeddings, cents)
        .withColumn("nv", transform(col("v"), x => x / col("nrm")))
        .select(col("vec_id"), col("cluster"), col("nv")))
    val pairs = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(VectorOps.dot(col("a.nv"), col("b.nv")) >= tau)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    val comps = Dedup.clustersFromPairs(
      embeddings.select(col("vec_id").as("doc_id")), pairs)
    assigned.select(col("vec_id"), col("cluster"))
      .join(
        comps.select(col("doc_id").as("vec_id"),
          col("cluster_id").as("rep_id")),
        "vec_id")
      .withColumn("kept", col("vec_id") === col("rep_id"))
  }

  /** Canonical published paths for the trained-artifact tables: every
    * non-data training hyperparameter rides the path (round-15, the
    * [[graft.operators.Graph.nodeEmbeddingPath]] discipline extended to
    * the whole publishedArtifact family — previously the path carried
    * only the caller slug, so changing nlist/m/ksub/outDims silently
    * served a table trained under the OLD hyperparameters: the sidecar
    * pins only the DATA version). One definition per artifact, shared by
    * the publisher and the DuckDB oracle's read_parquet path.
    */
  def ivfCentroidsPath(
      baseDir: String, slug: String, nlist: Int = 16, iters: Int = 3,
      trainSampleCap: Long = 0): String =
    s"$baseDir/${slug}_nl${nlist}_it$iters" +
      (if (trainSampleCap > 0) s"_s$trainSampleCap" else "")

  def pqCodebooksPath(
      baseDir: String, slug: String, m: Int = 8, ksub: Int = 16,
      iters: Int = 3, dim: Int = 64): String =
    s"$baseDir/${slug}_m${m}_k${ksub}_it${iters}_d$dim"

  def pcaPath(
      baseDir: String, slug: String, outDims: Int = 16, dim: Int = 64): String =
    s"$baseDir/${slug}_o${outDims}_d$dim"

  def whitenPath(
      baseDir: String, slug: String, outDims: Int = 16, dim: Int = 64): String =
    s"$baseDir/${slug}_o${outDims}_d$dim"

  /** Read-through accessor for published IVF centroids — see
    * [[publishedArtifact]] for the reuse/rebuild contract; path is
    * [[ivfCentroidsPath]] (hyperparams ride the path).
    */
  def publishedIvfCentroids(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3,
      trainSampleCap: Long = 0): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    val path = ivfCentroidsPath(baseDir, slug, nlist, iters, trainSampleCap)
    val warmIters = math.max(1, iters / 2)
    publishedArtifact[Array[Array[Double]]](
      spark, path, s"$nlist|$iters|$trainSampleCap",
      embeddingFingerprint(embeddings), centroidCache,
      train = () => trainIvfCentroids(embeddings, nlist, iters,
        sampleCap = trainSampleCap),
      write = (cents, p) => writeCentroidTable(spark, cents, p),
      load = () => spark.read.parquet(path).orderBy("list_id").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray),
      what = s"published IVF centroids '$slug'",
      // data refresh under the same path: seed Lloyd from the prior
      // published centroids at half the iteration budget (round-15
      // verdict item 4; params-in-path guarantees the prior table was
      // trained under the same nlist/iters/sample regime)
      warm = Some(prior =>
        trainIvfCentroids(embeddings, nlist, warmIters, init = Some(prior),
          sampleCap = trainSampleCap)),
      notes = warmUsed => Map(
        "schedule" -> (if (warmUsed) "warm" else "cold"),
        "iters_run" -> (if (warmUsed) warmIters else iters).toString))
  }

  private val groupCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, Array[Array[Double]])]()

  /** Two-level coarse quantizer, level 1: k-means over the PUBLISHED IVF
    * centroids themselves (round-16 verdict item 2's "genuinely flat"
    * path). Under the nlist ∝ corpus deployment rule, flat probe
    * selection scans all nlist centroids per query — linear in corpus
    * with a small constant. Grouping the centroids into ~√nlist groups
    * makes selection two stage: score ngroups group-centroids, keep the
    * top `gprobe`, then score only those groups' member centroids —
    * O(√nlist·(1+gprobe)) dots per query instead of O(nlist). The
    * group table is PUBLISHED beside the centroid table ((group_id,
    * centroid) parquet, same sidecar/fingerprint contract), so the
    * DuckDB oracle replays group assignment and two-stage selection
    * bit-for-bit from published values; the centroid→group map is
    * DERIVED deterministically on both engines (argmax dot, ties to the
    * larger group id — [[assignGroup]]), never stored.
    *
    * Training is a plain-JVM Lloyd over the nlist×dim centroid array
    * (driver-bounded: ≤ a few MB even at 100× scale) — deterministic
    * init from the first ngroups centroids in list_id order, normalized
    * means, empty groups keep their centroid — mirroring
    * [[trainIvfCentroids]]'s conventions.
    */
  def publishedIvfGroups(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3,
      ngroups: Int = 0,
      giters: Int = 3,
      centroids: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    val spark = embeddings.sparkSession
    val ng = resolveNgroups(ngroups, nlist)
    val cents = centroids.getOrElse(
      publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters))
    require(cents.length == nlist,
      s"centroid table carries ${cents.length} rows, expected nlist=$nlist")
    val path = ivfGroupsPath(baseDir, slug, nlist, iters, ng, giters)
    publishedArtifact[Array[Array[Double]]](
      spark, path, s"groups|$nlist|$iters|$ng|$giters",
      embeddingFingerprint(embeddings), groupCache,
      train = () => trainCentroidGroups(cents, ng, giters),
      write = (g, p) => writeGroupTable(spark, g, p),
      load = () => spark.read.parquet(path).orderBy("group_id").collect()
        .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray),
      what = s"published IVF centroid groups '$slug'",
      // warm refresh: re-group from the prior group centroids at half
      // budget (the publishedIvfCentroids discipline)
      warm = Some(prior => trainCentroidGroups(
        cents, ng, math.max(1, giters / 2), init = Some(prior))),
      notes = warmUsed => Map(
        "schedule" -> (if (warmUsed) "warm" else "cold"),
        "iters_run" -> (if (warmUsed) math.max(1, giters / 2) else giters).toString))
  }

  /** ngroups default: ⌈√nlist⌉ — balances the two selection stages
    * (ngroups group dots + gprobe·nlist/ngroups member dots).
    */
  private[graft] def resolveNgroups(ngroups: Int, nlist: Int): Int =
    if (ngroups > 0) ngroups
    else math.max(1, math.ceil(math.sqrt(nlist.toDouble)).toInt)

  /** The nlist at which the production serving spellings switch to
    * two-level probe selection AUTOMATICALLY: below it the flat
    * centroid scan is a rounding error (≤ ~2% of per-query cost at the
    * measured geometry); above it the O(nlist) scan starts competing
    * with the candidate scan itself (the IvfServingBench 10×-nlist
    * sweep: at nlist 630 two-level already beats exact selection) and
    * keeps growing linearly with the corpus under the nlist ∝ corpus
    * rule.
    */
  private[graft] val HierAutoNlist = 256

  /** gprobe resolution for the production serving spellings: negative =
    * AUTO (two-level at 4 probed groups once nlist ≥ [[HierAutoNlist]],
    * exact below — so the oracle-scale defaults stay bit-identical while
    * the scale path needs no caller opt-in); 0 = forced exact; positive
    * = explicit two-level.
    */
  private[graft] def resolveGprobe(gprobe: Int, nlist: Int): Int =
    if (gprobe >= 0) gprobe
    else if (nlist >= HierAutoNlist) 4
    else 0

  def ivfGroupsPath(
      baseDir: String, slug: String, nlist: Int = 16, iters: Int = 3,
      ngroups: Int = 4, giters: Int = 3): String =
    s"$baseDir/${slug}_nl${nlist}_it${iters}_g${ngroups}_gi$giters"

  /** argmax-dot group assignment (ties → larger group id — the
    * [[assignCluster]] total order); shared by the serving-side map
    * derivation and the Lloyd rounds, and replayed by the oracle as
    * `row_number() OVER (ORDER BY gdt DESC, group_id DESC) = 1`.
    */
  private[graft] def assignGroup(
      c: Array[Double], groups: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.NegativeInfinity
    var j = 0
    while (j < groups.length) {
      val g = groups(j)
      val n = math.min(c.length, g.length)
      var s = 0.0
      var t = 0
      while (t < n) { s += c(t) * g(t); t += 1 }
      // j only grows, so >= keeps the LARGER group id on an exact tie
      if (java.lang.Double.compare(s, bestD) >= 0) { best = j; bestD = s }
      j += 1
    }
    best
  }

  private[graft] def trainCentroidGroups(
      cents: Array[Array[Double]], ngroups: Int, iters: Int,
      init: Option[Array[Array[Double]]] = None): Array[Array[Double]] = {
    require(ngroups > 0 && ngroups <= cents.length,
      s"need 0 < ngroups <= nlist: ngroups=$ngroups nlist=${cents.length}")
    def normalize(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var g: Array[Array[Double]] = init.map(_.map(normalize))
      .getOrElse(cents.take(ngroups).map(c => normalize(c.clone())))
    (1 to iters).foreach { _ =>
      val dim = cents(0).length
      val sums = Array.fill(ngroups)(new Array[Double](dim))
      val counts = new Array[Long](ngroups)
      cents.foreach { c =>
        val a = assignGroup(c, g)
        counts(a) += 1
        var t = 0
        while (t < math.min(dim, c.length)) { sums(a)(t) += c(t); t += 1 }
      }
      g = g.indices.map { j =>
        if (counts(j) == 0) g(j) // empty group keeps its centroid
        else normalize(sums(j).map(_ / counts(j)))
      }.toArray
    }
    g
  }

  private def writeGroupTable(
      spark: SparkSession, groups: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    groups.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
      .toDF("group_id", "centroid")
      .coalesce(1)
      .write.parquet(path)
  }

  /** Read-through accessor for published PQ codebooks — see
    * [[publishedArtifact]] for the reuse/rebuild contract.
    */
  def publishedPqCodebooks(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      dim: Int = 64): Array[Array[Array[Double]]] = {
    val spark = embeddings.sparkSession
    val path = pqCodebooksPath(baseDir, slug, m, ksub, iters, dim)
    val warmIters = math.max(1, iters / 2)
    publishedArtifact[Array[Array[Array[Double]]]](
      spark, path, s"pq|$m|$ksub|$iters|$dim",
      embeddingFingerprint(embeddings), pqCache,
      train = () => trainPqCodebooks(embeddings, m, ksub, iters, dim),
      write = (books, p) => writeCodebookTable(spark, books, p),
      load = () => {
        val rows = spark.read.parquet(path).orderBy("s", "j").collect()
        rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
          rs.sortBy(_.getInt(1))
            .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray)
        }.toArray
      },
      what = s"published PQ codebooks '$slug'",
      // same warm-refresh discipline as publishedIvfCentroids: per-subspace
      // Lloyd seeded from the prior published codebooks at half budget
      warm = Some(prior =>
        trainPqCodebooks(embeddings, m, ksub, warmIters, dim,
          init = Some(prior))),
      notes = warmUsed => Map(
        "schedule" -> (if (warmUsed) "warm" else "cold"),
        "iters_run" -> (if (warmUsed) warmIters else iters).toString))
  }

  /** [[pqTopK]] with the training/serving split made physical — the same
    * contract as [[ivfTopKPublished]]: trained codebooks are PUBLISHED
    * (`baseDir/slug`: s, j, centroid) and serving — code assignment
    * (argmax x·c − ‖c‖²/2, ties → larger code), per-query ADC lookup
    * tables, the m-term ADC sum in subspace order, and the exact-cosine
    * rerank — is a chain of sequential IEEE folds over exactly those
    * published values, reproducible bit-for-bit by an external engine
    * reading the same table (the driver's DuckDB oracle does).
    */
  def pqTopKPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      numQueries: Int = 10,
      k: Int = 5,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 50,
      dim: Int = 64,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val books = publishedPqCodebooks(embeddings, baseDir, slug, m, ksub, 3, dim)
    pqTopK(embeddings, numQueries, k, m, ksub, rerank, dim, "", Some(books),
      queryTable = queryTable)
  }

  /** [[ivfPqTopK]] with BOTH trained artifacts published —
    * `baseDir/${slug}_centroids` (list_id, centroid) and
    * `baseDir/${slug}_codebooks` (s, j, centroid) — so the full
    * IVF-pruned ADC scan plus exact rerank is externally reproducible
    * from the published tables alone, like [[ivfTopKPublished]] and
    * [[pqTopKPublished]].
    */
  def ivfPqTopKPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 50,
      dim: Int = 64,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val cents = publishedIvfCentroids(embeddings, baseDir, s"${slug}_centroids", nlist, 3)
    val books = publishedPqCodebooks(embeddings, baseDir, s"${slug}_codebooks", m, ksub, 3, dim)
    ivfPqTopK(embeddings, numQueries, k, nlist, nprobe, m, ksub, rerank, dim,
      "", Some(cents), Some(books), queryTable = queryTable)
  }

  /** ANN top-k via product quantization with asymmetric distance (ADC):
    * the corpus is compressed to `m` small codes per vector (here m ints;
    * a byte each in storage terms — n·m bytes scanned instead of
    * n·dim·4), each query precomputes one `m × ksub` dot-product lookup
    * table against the codebooks, and the candidate scan is `m` table
    * lookups per corpus row — the classic IVF-less PQ scan. The approx
    * top-`rerank` shortlist per query is re-ranked by exact cosine over
    * the uncompressed vectors, so returned scores are exact and the
    * compression only affects recall (measured in SimilaritySpec).
    *
    * The query vectors (bounded: `numQueries` rows) are collected to build
    * the lookup tables as literals — the per-query preprocessing step of
    * any PQ implementation, here done at plan-build time.
    */
  def pqTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 50,
      dim: Int = 64,
      cacheKey: String = "",
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val books = codebooks.getOrElse(pqCodebooks(embeddings, m, ksub, 3, dim, cacheKey))
    val dsub = dim / m
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = OpCache.materialize( // feeds encoding, the query side, and the rerank
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v")))
        .withColumn("nv", transform(col("v"), x => x / col("nrm"))))

    // the compressed index: ids + m codes (this is ALL the ADC scan
    // reads). The codes array is ONE fused expression evaluated once per
    // row (the two-project shape keeps CollapseProject from inlining m
    // copies); getItem fans it out to the per-subspace columns
    val coded = e
      .withColumn("codes", pqCodes(col("nv"), books, dsub))
      .select(
        (col("vec_id") +: (0 until m).map { s =>
          col("codes").getItem(s).as(s"c$s")
        }): _*)

    // per-query ADC tables: table[s][j] = q_sub(s) · book(s)(j)
    // DRIVER-BOUNDED by contract: each query gets an m-row ADC lookup
    // table built on the driver, so the query side must stay a bounded
    // set — an external cohort-shaped table fails loudly here instead of
    // collecting the cohort into driver memory (use ivfTopK's
    // distributed probe join for cohort-scale serving)
    queryTable.foreach { qt =>
      val nq = qt.count()
      require(nq <= 10000,
        s"ADC serving builds per-query driver tables: $nq external " +
          "queries > 10000 — route cohort-scale serving through ivfTopK")
    }
    val qTables = queryBase(e, numQueries, queryTable)
      .select(col("vec_id"), col("nv")).orderBy(col("vec_id")).collect()
      .map { r =>
        val qid = r.getLong(0)
        val qnv = r.getAs[scala.collection.Seq[Double]]("nv").toArray
        val tabs = (0 until m).map { s =>
          books(s).map(c =>
            (0 until dsub).map(d => qnv(s * dsub + d) * c(d)).sum).toSeq
        }
        (qid, tabs)
      }.toSeq.toDF("query_id", "tables")

    val approx = (0 until m).map { s =>
      element_at(element_at(col("tables"), s + 1), col(s"c$s") + 1)
    }.reduce(_ + _)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    val shortlist = coded.join(broadcast(qTables), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), approx.as("approx"))
      .withColumn("arank", row_number().over(wApprox))
      .where(col("arank") <= rerank)
      .select("query_id", "vec_id")

    // exact rerank of the shortlist over the uncompressed vectors
    val queries = queryBase(e, numQueries, queryTable)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** ANN top-k via IVF + PQ — the production pairing at extreme scale:
    * IVF prunes COMPUTE (only `nprobe` of `nlist` clusters are scanned
    * per query) and PQ prunes MEMORY/BANDWIDTH (the scan reads m codes
    * per vector, never the raw floats; raw vectors are touched only for
    * the `rerank`-sized shortlist). Per-query cost ≈
    * (nprobe/nlist)·n·m lookups + rerank exact dots, against n·dim·4
    * bytes of raw-vector scan for brute force.
    *
    * Query preprocessing (probe list + ADC tables) is literal-built from
    * the bounded query set at plan time, like [[pqTopK]]; returned scores
    * are exact cosines from the rerank, so IVF/PQ approximation affects
    * recall only (measured in SimilaritySpec).
    */
  def ivfPqTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 50,
      dim: Int = 64,
      cacheKey: String = "",
      centroids: Option[Array[Array[Double]]] = None,
      codebooks: Option[Array[Array[Array[Double]]]] = None,
      queryTable: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(embeddings, nlist, 3, cacheKey))
    val books = codebooks.getOrElse(pqCodebooks(embeddings, m, ksub, 3, dim, cacheKey))
    val dsub = dim / m
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = OpCache.materialize( // the index build: cluster + codes, once
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v")))
        .withColumn("nv", transform(col("v"), x => x / col("nrm")))
        .withColumn("cluster", assignCluster(col("nv"), cents)))
    val coded = e
      .withColumn("codes", pqCodes(col("nv"), books, dsub))
      .select(
        (col("vec_id") +: col("cluster") +: (0 until m).map { s =>
          col("codes").getItem(s).as(s"c$s")
        }): _*)

    // per-query probe list + ADC tables, driver-built from the bounded set
    // DRIVER-BOUNDED by contract: each query gets an m-row ADC lookup
    // table built on the driver, so the query side must stay a bounded
    // set — an external cohort-shaped table fails loudly here instead of
    // collecting the cohort into driver memory (use ivfTopK's
    // distributed probe join for cohort-scale serving)
    queryTable.foreach { qt =>
      val nq = qt.count()
      require(nq <= 10000,
        s"ADC serving builds per-query driver tables: $nq external " +
          "queries > 10000 — route cohort-scale serving through ivfTopK")
    }
    val qSide = queryBase(e, numQueries, queryTable)
      .select(col("vec_id"), col("nv")).orderBy(col("vec_id")).collect()
      .map { r =>
        val qid = r.getLong(0)
        val qnv = r.getAs[scala.collection.Seq[Double]]("nv").toArray
        val probes = cents.zipWithIndex
          .map { case (c, i) => (c.zip(qnv).map { case (a, b) => a * b }.sum, i) }
          .sortBy(-_._1).take(nprobe).map(_._2).toSeq
        val tabs = (0 until m).map { s =>
          books(s).map(c =>
            (0 until dsub).map(d => qnv(s * dsub + d) * c(d)).sum).toSeq
        }
        (qid, probes, tabs)
      }.toSeq.toDF("query_id", "probes", "tables")

    val approx = (0 until m).map { s =>
      element_at(element_at(col("tables"), s + 1), col(s"c$s") + 1)
    }.reduce(_ + _)
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id"))
    // probes explode to (query, cluster) rows → EQUI-join on the cluster
    // id (round 16 — the array_contains theta gate was a BNLJ scanning
    // all |Q|·corpus code rows; see the ivfTopK candidate former)
    val probeRows = qSide.select(col("query_id"), col("tables"),
      explode(col("probes")).as("cluster"))
    val shortlist = coded.join(broadcast(probeRows), Seq("cluster"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), approx.as("approx"))
      .withColumn("arank", row_number().over(wApprox))
      .where(col("arank") <= rerank)
      .select("query_id", "vec_id")

    val queries = queryBase(e, numQueries, queryTable)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    shortlist
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** ANN top-k via multi-table sign-LSH: candidates are corpus vectors
    * sharing the query's bucket in ANY table; ranked by exact cosine.
    * Recall is tunable via (tables, bits): more tables → higher recall,
    * more bits → smaller buckets. See SimilaritySpec for the measured
    * recall vs [[bruteForceTopK]].
    */
  def lshTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      tables: Int = 8,
      bits: Int = 4,
      dim: Int = 64,
      planesOverride: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    val planes = planesOverride.getOrElse(hyperplanes(tables, bits, dim))
    // feeds bucketing, the query side, and the late vector rejoin
    val e = OpCache.materialize(
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v"))))

    // bucket every vector once per table — ids only, so the `tables`×
    // explode and the bucket join never carry the 64-dim payload; vectors
    // are re-joined only for the (much smaller) candidate set
    val bucketStructs = array((0 until tables).map { t =>
      struct(lit(t).as("t"), bucketId(col("v"), planes(t)).as("bucket"))
    }: _*)
    val bucketed = e
      .select(col("vec_id"), explode(bucketStructs).as("b"))
      .select(col("vec_id"), col("b.t").as("t"), col("b.bucket").as("bucket"))

    val qb = bucketed.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("t"), col("bucket"))

    // candidate = same (table, bucket); dedup across tables, then rejoin
    // vectors and rank by exact cosine
    val candIds = bucketed.join(broadcast(qb), Seq("t", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val queries = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val cands = candIds
      .join(e, "vec_id")
      .join(broadcast(queries), "query_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands
      .select(col("query_id"), col("vec_id"),
        VectorOps.cosineWithNorms(
          VectorOps.dot(col("qv"), col("v")), col("qn"), col("nrm")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cosine")
  }

  /** [[lshTopK]] over the md5-keyed [[mdHyperplanes]] — identical plan
    * (bucket explode, (table, bucket) equi-join, exact-cosine rerank),
    * but every hyperplane component, bucket id, candidate set, and cosine
    * is reproducible in DuckDB SQL, so `sim_lsh_topk` is hash-checked by
    * the driver instead of rows-only. The seeded-gaussian form remains
    * available for parity with standard LSH literature.
    */
  def lshTopKSql(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5,
      tables: Int = 8,
      bits: Int = 4,
      dim: Int = 64): DataFrame =
    lshTopK(embeddings, numQueries, k, tables, bits, dim,
      Some(mdHyperplanes(tables, bits, dim)))

  /** Per-vector int8 scalar quantization — the storage/serving compression
    * a 100 TB embedding store applies before ANN serving (4 bytes/dim →
    * 1 byte/dim): affine (min, max) codes q_i = floor((x_i − min)/scale +
    * 0.5) with scale = (max − min)/255, plus the reconstruction-error
    * telemetry (per-vector MSE of the dequantized vector) that gates a
    * quantized rollout. MAP-ONLY — one projection per row, no shuffle;
    * every step (element-wise affine, floor, sequential-fold MSE) is
    * IEEE-deterministic, so the DuckDB oracle checks codes AND error
    * bit-for-bit. Constant vectors take scale = 0 and all-zero codes.
    * Codes serialize to CSV at the oracle edge (array cells don't hash in
    * the driver's pandas compare).
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("scale", (col("vmax") - col("vmin")) / lit(255.0))
      .withColumn("codes", transform(col("v"), x =>
        when(col("scale") === 0, lit(0L))
          .otherwise(floor((x - col("vmin")) / col("scale") + lit(0.5)))))
    e.select(
      col("vec_id"),
      concat_ws(",", transform(col("codes"), c => c.cast("string"))).as("codes"),
      col("vmin"), col("vmax"),
      (aggregate(
        zip_with(col("v"), col("codes"), (x, q) =>
          (x - (col("vmin") + q * col("scale"))) *
            (x - (col("vmin") + q * col("scale")))),
        lit(0.0), (acc, d) => acc + d) / size(col("v"))).as("mse"))
  }

  // ── PCA projection (published rotation, oracle-replayable serving) ────

  private val pcaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, (Array[Double], Array[Array[Double]]))]()

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — pure Scala,
    * no library dependency, fully deterministic (fixed sweep order, fixed
    * convergence test). Returns (eigenvalues, eigenvector COLUMNS). At
    * embedding dimensionality (64–4096) this is microseconds-to-seconds of
    * driver CPU on a (dim × dim) matrix — never data-sized work.
    */
  private[graft] def jacobiEigen(
      a: Array[Array[Double]], maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag: Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < maxSweeps && offDiag > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < n) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => m(i)(i)), v)
  }

  /** Train a PCA rotation: mean vector + the top-`outDims` principal
    * directions of the embedding covariance. The covariance accumulates
    * DISTRIBUTED — one pass folds every vector's outer product into
    * (j, k) second-moment sums (|corpus| · dim² slim rows through one
    * partial-agg shuffle), and only the (dim × dim) moment matrix is
    * pulled to the driver (bounded: dim²·8 bytes, 32 KB at dim 64) for
    * the Jacobi solve. Eigenvectors are ordered by eigenvalue desc
    * (index asc ties) and sign-fixed (largest-|component| coordinate
    * positive), so the published rotation is canonical.
    *
    * Returns (means[dim], rot[dim][outDims]).
    */
  private def trainPca(
      embeddings: DataFrame, outDims: Int, dim: Int): (Array[Double], Array[Array[Double]]) = {
    val spark = embeddings.sparkSession
    val n = embeddings.count().toDouble
    require(n > 0, "trainPca needs a non-empty embedding table")
    val meanRows = embeddings
      .select(posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy(col("j")).agg(sum(col("x").cast("double")).as("s"))
      .collect()
    val means = Array.ofDim[Double](dim)
    meanRows.foreach(r => means(r.getInt(0)) = r.getDouble(1) / n)
    val momentRows = embeddings
      .select(explode(flatten(transform(col("embedding"), (xi, i) =>
        transform(col("embedding"), (xj, j) =>
          struct(i.as("j1"), j.as("j2"),
            (xi.cast("double") * xj.cast("double")).as("p")))))).as("e"))
      .select(col("e.j1"), col("e.j2"), col("e.p"))
      .groupBy(col("j1"), col("j2")).agg(sum(col("p")).as("sp"))
      .collect()
    val cov = Array.ofDim[Double](dim, dim)
    momentRows.foreach { r =>
      val (j, k) = (r.getInt(0), r.getInt(1))
      cov(j)(k) = r.getDouble(2) / n - means(j) * means(k)
    }
    val (vals, vecs) = jacobiEigen(cov)
    val order = vals.indices.sortBy(i => (-vals(i), i)).take(outDims)
    val rot = Array.ofDim[Double](dim, outDims)
    order.zipWithIndex.foreach { case (ei, k) =>
      val column = Array.tabulate(dim)(j => vecs(j)(ei))
      val jmax = column.indices.maxBy(j => (math.abs(column(j)), -j))
      val sign = if (column(jmax) < 0) -1.0 else 1.0
      var j = 0
      while (j < dim) { rot(j)(k) = sign * column(j); j += 1 }
    }
    (means, rot)
  }

  private def writePcaTable(
      spark: SparkSession, means: Array[Double],
      rot: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    means.indices.map(j => (j, means(j), rot(j).toSeq)).toDF("component", "mean", "rot")
      .coalesce(1)
      .write.parquet(path)
  }

  /** Read-through accessor for the published PCA artifact — see
    * [[publishedArtifact]] for the reuse/rebuild contract. Table rows:
    * (component, mean, rot[outDims]) — one per input dimension.
    */
  def publishedPca(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      outDims: Int = 16,
      dim: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val spark = embeddings.sparkSession
    val path = pcaPath(baseDir, slug, outDims, dim)
    publishedArtifact[(Array[Double], Array[Array[Double]])](
      spark, path, s"pca|$outDims|$dim",
      embeddingFingerprint(embeddings), pcaCache,
      train = () => trainPca(embeddings, outDims, dim),
      write = (art, p) => writePcaTable(spark, art._1, art._2, p),
      load = () => {
        val rows = spark.read.parquet(path).orderBy("component").collect()
        val means = rows.map(_.getDouble(1))
        val rot = rows.map(_.getAs[scala.collection.Seq[Double]]("rot").toArray)
        (means, rot)
      },
      what = s"published PCA rotation '$slug'")
  }

  /** PCA projection serving from the PUBLISHED rotation: y = Rᵀ(x − μ)
    * per embedding, each output coordinate a SEQUENTIAL left fold over
    * the input dimensions — the same association order as DuckDB's
    * `list_reduce`, so the oracle reproduces every projected value
    * bit-for-bit from the published table. Map-only over the corpus
    * (the rotation rides along as literals inside whole-stage codegen);
    * output components are rounded to 6 dp BEFORE the norm, so the norm
    * is a deterministic function of the emitted values.
    *
    * The dimensionality-reduction stage of an embedding pipeline
    * (whiten/reduce before ANN indexing): at 100 TB this is the shape
    * you want — train once on a sample, publish, then one codegen'd
    * map pass over the corpus.
    */
  def pcaProjectPublished(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      outDims: Int = 16,
      dim: Int = 64): DataFrame = {
    val (means, rot) = publishedPca(embeddings, baseDir, slug, outDims, dim)
    val mLit = typedLit(means.toSeq)
    val projCols = (0 until outDims).map { k =>
      val rk = typedLit(rot.map(_(k)).toSeq)
      graft.functions.OracleRound.roundN(
        aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (acc, j) => acc +
            (element_at(col("embedding"), j + 1).cast("double") -
              element_at(mLit, j + 1)) * element_at(rk, j + 1)),
        6).as(f"p${k + 1}%02d")
    }
    val projected = embeddings.select(col("vec_id") +: projCols: _*)
    val normSq = (0 until outDims)
      .map(k => col(f"p${k + 1}%02d") * col(f"p${k + 1}%02d"))
      .reduce(_ + _)
    projected.withColumn("proj_norm",
      graft.functions.OracleRound.roundN(sqrt(normSq), 6))
  }

  private val whitenCache = new java.util.concurrent.ConcurrentHashMap[
    String, (PublishGuard.Fingerprint, Array[Double])]()

  /** Read-through accessor for the published PCA-whitening scales —
    * per-component 1/√(mean square) of the PUBLISHED projection (PCA
    * output is centered by construction, so the mean square IS the
    * component variance). Training is one outDims-wide aggregate over
    * the projected corpus — float sums, NOT cross-engine reproducible,
    * which is exactly why the scales are PUBLISHED ((component, scale)
    * parquet) and every scorer replays scoring from the table (the IVF
    * centroid / PCA rotation discipline).
    */
  def publishedWhitenScales(
      embeddings: DataFrame,
      baseDir: String,
      pcaSlug: String,
      slug: String,
      outDims: Int = 16,
      dim: Int = 64): Array[Double] = {
    val spark = embeddings.sparkSession
    // pcaSlug is a LOCATION, not a semantic parameter: same data + same
    // (outDims, dim) trains the same rotation wherever it is published
    val path = whitenPath(baseDir, slug, outDims, dim)
    publishedArtifact[Array[Double]](
      spark, path, s"$pcaSlug|$outDims|$dim",
      embeddingFingerprint(embeddings), whitenCache,
      train = () => {
        val proj = pcaProjectPublished(embeddings, baseDir, pcaSlug, outDims, dim)
        val row = proj.agg(
          avg(col("p01") * col("p01")).as("m0"),
          (1 until outDims).map(k =>
            avg(col(f"p${k + 1}%02d") * col(f"p${k + 1}%02d")).as(s"m$k")): _*)
          .head()
        (0 until outDims)
          .map(k => 1.0 / math.sqrt(row.getDouble(k) + 1e-12)).toArray
      },
      write = (sc, p) => {
        import spark.implicits._
        sc.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("component", "scale").coalesce(1).write.parquet(p)
      },
      load = () => spark.read.parquet(path).orderBy("component").collect()
        .map(_.getDouble(1)),
      what = s"published whitening scales '$slug'")
  }

  /** PCA whitening against BOTH published artifacts (rotation + scales):
    * each projected component is multiplied by its published
    * 1/√variance, giving the decorrelated unit-variance representation
    * contrastive/retrieval training recipes standardize embeddings with
    * before indexing. Serving is one map-only pass — the rotation AND
    * the scales enter as literals; every output is the 6 dp product of
    * an already-published 6 dp projection with a table-read scale, so
    * an external engine reading the same two tables reproduces the
    * frame bit-for-bit.
    */
  def whitenPublished(
      embeddings: DataFrame,
      baseDir: String,
      pcaSlug: String,
      slug: String,
      outDims: Int = 16,
      dim: Int = 64): DataFrame = {
    val scales = publishedWhitenScales(
      embeddings, baseDir, pcaSlug, slug, outDims, dim)
    pcaProjectPublished(embeddings, baseDir, pcaSlug, outDims, dim)
      .select(col("vec_id") +:
        (0 until outDims).map(k =>
          graft.functions.OracleRound.roundN(
            col(f"p${k + 1}%02d") * lit(scales(k)), 6)
            .as(f"w${k + 1}%02d")): _*)
  }

  /** Cluster-balanced diversity sample (coreset selection): assign every
    * corpus vector to its nearest PUBLISHED IVF centroid (the same
    * artifact the ANN serving paths read — compute-once shared), then
    * keep the `perCluster` vectors closest to each centroid. The result
    * covers every region of embedding space instead of oversampling the
    * dense ones — the embedding-space analog of stratified sampling, used
    * to pick diverse training subsets or eval probes.
    *
    * Scale shape: assignment is map-only (centroids ride as literals in
    * whole-stage codegen); per-cluster selection uses the bounded
    * [[graft.functions.BottomKAgg]] aggregate — O(perCluster) state per
    * cluster folded MAP-SIDE before the exchange — because a
    * `row_number() OVER (PARTITION BY cluster)` window would sort the
    * whole corpus across only `nlist` reducers. The descending-dot order
    * is encoded as a fixed-width zero-padded string key
    * (`floor((1-dot)·10⁹)`), so string order ≡ numeric order and the
    * DuckDB oracle replays the exact (key, vec_id) tie-break.
    */
  def diverseSample(
      embeddings: DataFrame,
      baseDir: String,
      slug: String,
      nlist: Int = 16,
      iters: Int = 3,
      perCluster: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cents = publishedIvfCentroids(embeddings, baseDir, slug, nlist, iters)
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
      .withColumn("nv", transform(col("v"), x => x / col("nrm")))
    val best = probeStructs(col("nv"), cents, 1).getItem(0)
    val assigned = OpCache.materialize(e.select(col("vec_id"),
      best.getField("i").as("cluster"), best.getField("d").as("dt")))
    val sampled = assigned
      .select(col("cluster"),
        lpad(floor((lit(1.0) - col("dt")) * lit(1000000000.0))
          .cast("long").cast("string"), 10, "0").as("sk"),
        col("vec_id"))
      .groupBy(col("cluster"))
      .agg(expr(s"graft_bottom_k(sk, vec_id, $perCluster)").as("ids"))
      .select(col("cluster"),
        posexplode(col("ids")).as(Seq("pos", "vec_id")))
      .select(col("cluster"), (col("pos") + 1).cast("int").as("rank"),
        col("vec_id"))
    // dt lookup for the selected rows: the sampled side is nlist ×
    // perCluster rows — broadcast it against the corpus-sized frame
    assigned.join(broadcast(sampled), Seq("vec_id", "cluster"))
      .select(col("cluster"), col("rank"), col("vec_id"),
        graft.functions.OracleRound.roundN(col("dt"), 6).as("centroid_dot"))
  }
}
