package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{OpCache, Partitioning}
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

  /** Exact top-k by cosine for each query vector (queries = the first
    * `numQueries` corpus vectors by vec_id; self-matches excluded).
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      numQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.l2Norm(col("v")))
    val queries = e.where(col("vec_id") < numQueries)
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

  /** Deterministic random hyperplanes: `tables` × `bits` planes of `dim`
    * gaussian components, fixed seed.
    */
  def hyperplanes(tables: Int, bits: Int, dim: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bits, dim)(rnd.nextGaussian())
  }

  /** Sign-bit bucket id of vector column `v` for one table's planes. */
  private[operators] def bucketId(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      val planeLit = array(p.map(lit): _*)
      when(VectorOps.dot(v, planeLit) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Spherical k-means coarse quantizer for IVF: deterministic init (the
    * first `nlist` vectors), fixed `iters` Lloyd rounds. Assignment is
    * argmax dot against L2-normalized centroids; the (tiny) centroid set
    * is pulled to the driver each round and re-broadcast as literals —
    * the standard k-means topology (per-round cost: one map over the
    * corpus + one (cluster, dim)-keyed partial aggregation).
    */
  def trainIvfCentroids(
      embeddings: DataFrame,
      nlist: Int = 16,
      iters: Int = 3): Array[Array[Double]] = {
    val e = Partitioning.ensureParallelism(embeddings, col("vec_id"))
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .withColumn("nv", transform(col("v"), x => x / VectorOps.l2Norm(col("v"))))
      .select(col("vec_id"), col("nv"))
      .persist()
    def normalize(c: Array[Double]): Array[Double] = {
      val n = math.sqrt(c.map(x => x * x).sum)
      if (n == 0) c else c.map(_ / n)
    }
    var cents: Array[Array[Double]] = e.where(col("vec_id") < nlist)
      .orderBy(col("vec_id")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("nv").toArray)
      .map(normalize)
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

  /** argmax-dot cluster assignment against centroid literals (array_max
    * over (dot, idx) structs — compares by dot, ties by idx).
    */
  private def assignCluster(nv: Column, cents: Array[Array[Double]]): Column =
    array_max(array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.dot(nv, array(c.map(lit): _*)).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** Memoized centroid store: train-once, search-many. Keyed by a
    * caller-supplied corpus key (e.g. the dataset path) + params, so
    * repeated searches — the bench's median-of-N runs, or a query service —
    * never retrain. The cached value is nlist×dim doubles (bounded, tiny).
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** Centroids for `cacheKey`, training at most once per (key, params).
    *
    * CONTRACT: `cacheKey` must encode the DATA VERSION, not just its
    * location — the memo is never invalidated, so keying a path whose
    * contents later change (appends, re-generation) would silently bucket
    * with stale centroids. For mutable datasets, fold a version/snapshot id
    * or a file-listing fingerprint (paths + mtimes) into the key, or pass
    * `cacheKey = ""` to retrain per call. Stale centroids degrade IVF
    * recall, never correctness of the exact rerank.
    */
  def ivfCentroids(
      embeddings: DataFrame,
      nlist: Int = 16,
      iters: Int = 3,
      cacheKey: String = ""): Array[Array[Double]] =
    if (cacheKey.isEmpty) trainIvfCentroids(embeddings, nlist, iters)
    else centroidCache.computeIfAbsent(s"$cacheKey|$nlist|$iters",
      _ => trainIvfCentroids(embeddings, nlist, iters))

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
      cacheKey: String = ""): DataFrame = {
    val cents = centroids.getOrElse(ivfCentroids(embeddings, nlist, iters, cacheKey))
    // the bucketed corpus feeds both the query side and the probe join
    val e = OpCache.materialize(
      Partitioning.ensureParallelism(embeddings, col("vec_id"))
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.l2Norm(col("v")))
        .withColumn("nv", transform(col("v"), x => x / col("nrm")))
        .withColumn("cluster", assignCluster(col("nv"), cents)))

    // per-query probe list: nprobe clusters with the highest centroid dot
    val scored = array(cents.zipWithIndex.map { case (c, i) =>
      struct(VectorOps.dot(col("nv"), array(c.map(lit): _*)).as("d"), lit(i).as("i"))
    }: _*)
    val probes = transform(
      slice(reverse(array_sort(scored)), 1, nprobe), s => s.getField("i"))
    val queries = e.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), probes.as("probe_clusters"))

    val cands = e.join(broadcast(queries),
      array_contains(col("probe_clusters"), col("cluster")) &&
        col("vec_id") =!= col("query_id"))

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
      dim: Int = 64): DataFrame = {
    val planes = hyperplanes(tables, bits, dim)
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
}
