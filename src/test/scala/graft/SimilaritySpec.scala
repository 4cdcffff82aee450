package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.Similarity

/** Measures the LSH ANN path against the exact (oracle-checked) brute-force
  * top-k: recall@5 must clear a floor, and every LSH hit must carry the
  * same exact cosine the brute-force path computed.
  */
class SimilaritySpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  test("brute-force top-k returns k ranked neighbors per query") {
    val bf = Similarity.bruteForceTopK(Tables.embeddings(spark, sf)).collect()
    val byQuery = bf.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.sameElements(1 to 5))
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("radius search equals a driver-side brute-force threshold scan") {
    val emb = Tables.embeddings(spark, sf)
    val tau = 0.3
    val got = Similarity.radiusSearch(emb, threshold = tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cosines = (for {
      (q, qv) <- vecs.toSeq if q < 10
      (v, vv) <- vecs.toSeq if v != q
    } yield (q, v) -> cos(qv, vv)).toMap
    val expect = cosines.filter(_._2 >= tau).keySet
    // membership must match exactly away from the cut; pairs within 1e-9
    // of tau are excused from the SET check (fold-order at the boundary
    // is the oracle's bit-exact job, not this recompute's)
    val borderline = cosines.filter(t => math.abs(t._2 - tau) <= 1e-9).keySet
    assert((got -- borderline) === (expect -- borderline),
      s"radius set diverged (missing=${expect -- got})")
    assert(got.nonEmpty, "threshold matched nothing — nothing proven")
    // every returned cosine clears the threshold
    Similarity.radiusSearch(emb, threshold = tau).collect()
      .foreach(r => assert(r.getDouble(2) >= tau))
  }

  test("IVF ANN recall@5 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val ivf = pairs(Similarity.ivfTopK(emb))
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall (${(exact & ivf).size}/${exact.size})")
    assert(recall >= 0.5, s"IVF recall@5 $recall below floor")
  }

  test("stale centroid/codebook memo keys fail loudly instead of serving") {
    val emb = Tables.embeddings(spark, sf)
    val key = s"stale-memo-${System.nanoTime()}"
    Similarity.ivfCentroids(emb, cacheKey = key)
    Similarity.pqCodebooks(emb, cacheKey = key)
    // same key, same data: memo hit, no error
    Similarity.ivfCentroids(emb, cacheKey = key)
    // same key, DIFFERENT data: the recorded input fingerprint mismatches
    val mutated = emb.limit(50)
    val e1 = intercept[IllegalStateException] {
      Similarity.ivfCentroids(mutated, cacheKey = key)
    }
    assert(e1.getMessage.contains("DIFFERENT input"))
    val e2 = intercept[IllegalStateException] {
      Similarity.pqCodebooks(mutated, cacheKey = key)
    }
    assert(e2.getMessage.contains("DIFFERENT input"))
  }

  test("published artifacts: fresh sessions reuse the table, stale input rebuilds") {
    import org.apache.hadoop.fs.Path
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-pub").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def token(dir: String): String = {
      val in = fs.open(new Path(dir, graft.engine.PublishGuard.MarkerFile))
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    // hyperparams ride the published path (round 15)
    val c1dir = Similarity.ivfCentroidsPath(base, "c1")
    val b1dir = Similarity.pqCodebooksPath(base, "b1")
    // 1. first call trains and publishes (sidecar + publisher marker land
    //    atomically with the table)
    val v1 = Similarity.publishedIvfCentroids(emb, base, "c1")
    val t1 = token(c1dir)
    // 2. FRESH SESSION (cleared in-JVM cache): same input must be served
    //    from the published table — no retrain, no republish
    Similarity.clearTrainingCaches()
    val v2 = Similarity.publishedIvfCentroids(emb, base, "c1")
    assert(token(c1dir) == t1, "fresh-session reuse must not republish")
    assert(v2.map(_.toSeq).toSeq == v1.map(_.toSeq).toSeq,
      "fresh session must serve the published values")
    // ...and the served values ARE the table's values
    val tableVals = spark.read.parquet(c1dir).orderBy("list_id").collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toSeq).toSeq
    assert(v2.map(_.toSeq).toSeq == tableVals)
    // 3. same path, DIFFERENT input: the artifact is out of date → atomic
    //    rebuild (fresh publisher token), not a stale serve and not an error
    Similarity.clearTrainingCaches()
    val sub = emb.where(org.apache.spark.sql.functions.col("vec_id") < 60)
    val v3 = Similarity.publishedIvfCentroids(sub, base, "c1")
    val t3 = token(c1dir)
    assert(t3 != t1, "changed input must republish")
    assert(v3.map(_.toSeq).toSeq != v1.map(_.toSeq).toSeq,
      "rebuilt centroids should differ on different input")
    // 4. rebuilt table is then reusable from a fresh session again
    Similarity.clearTrainingCaches()
    Similarity.publishedIvfCentroids(sub, base, "c1")
    assert(token(c1dir) == t3, "second fresh-session reuse must not republish")
    // PQ codebooks ride the same code path — one reuse check
    val b1 = Similarity.publishedPqCodebooks(emb, base, "b1")
    val tb = token(b1dir)
    Similarity.clearTrainingCaches()
    val b2 = Similarity.publishedPqCodebooks(emb, base, "b1")
    assert(token(b1dir) == tb && b2.length == b1.length)
    // 5. a changed HYPERPARAMETER lands at a NEW path and trains fresh —
    //    the round-14 silent-stale-reuse hazard, closed for the whole
    //    family: before round 15 this call would have loaded the nlist=16
    //    table and returned 16 centroids
    val v8 = Similarity.publishedIvfCentroids(sub, base, "c1", nlist = 8)
    assert(v8.length == 8,
      s"nlist=8 must train 8 fresh centroids, got ${v8.length} (stale reuse)")
    assert(fs.exists(new Path(Similarity.ivfCentroidsPath(base, "c1", nlist = 8))))
  }

  test("hammingTopK: plain-JVM sign-code recompute matches exactly; binary rank agrees with cosine rank above the floor") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.hammingTopK(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(got.nonEmpty && got.map(_._1).distinct.length === 10)
    // third derivation: codes + hamming + rank in plain JVM from the raw
    // vectors (strict > 0 sign, bits 0..62, ties (hamming, vec_id))
    val vecs = emb.select(col("vec_id"),
      graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def codeOf(v: Array[Double]): Long = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      var c = 0L
      var t = 0
      while (t < math.min(63, v.length)) {
        if (v(t) / nrm > 0.0) c |= 1L << t
        t += 1
      }
      c
    }
    val codes = vecs.view.mapValues(codeOf).toMap
    val expect = (0L until 10L).flatMap { q =>
      codes.toSeq.filter(_._1 != q)
        .map { case (id, c) =>
          (id, java.lang.Long.bitCount(codes(q) ^ c)) }
        .sortBy { case (id, h) => (h, id) }
        .take(5).zipWithIndex
        .map { case ((id, h), i) => (q, i + 1, id, h) }
    }.toSet
    assert(got.toSet === expect, "hamming serving diverged from the JVM replay")
    // the operative quality metric for 1-bit codes is SHORTLIST recall:
    // does the true cosine top-5 survive into the Hamming top-50 the
    // exact rerank would then score? Measured 0.72 at sf0.001 (a 10%
    // shortlist recovers 72% of the truth; direct hamming-rank recall@5
    // alone is 0.16 — the honest 1-bit-alone number, chance ≈ 0.01);
    // floor at 0.5 so a sign-bit or tie-break regression fails loudly
    val exact = Similarity.bruteForceTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val short50 = Similarity.hammingTopK(emb, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val shortRecall = (exact intersect short50).size.toDouble / exact.size
    assert(shortRecall >= 0.5,
      f"hamming shortlist recall@50 vs cosine $shortRecall%.2f below the 0.5 floor")
  }

  test("sample-capped k-means: non-binding cap is exactly uncapped training; binding cap trains on the hash subset, deterministic, and publishes under its own path") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    // 1. a cap >= the corpus degenerates to EXACTLY the uncapped rounds
    //    (same init, same Lloyd input) — bit-identical centroids
    val full = Similarity.trainIvfCentroids(emb, nlist = 8, iters = 2)
    val nonBinding = Similarity.trainIvfCentroids(emb, nlist = 8, iters = 2,
      sampleCap = 1000000L)
    assert(full.map(_.toSeq).toSeq === nonBinding.map(_.toSeq).toSeq,
      "a non-binding sampleCap must not change training")
    // 2. a binding cap (the 100 TB contract: full-corpus Lloyd under
    //    nlist ∝ corpus is O(N²) per round) still yields nlist
    //    unit-normalized centroids, deterministically
    val capped1 = Similarity.trainIvfCentroids(emb, nlist = 8, iters = 2,
      sampleCap = 40L)
    val capped2 = Similarity.trainIvfCentroids(emb, nlist = 8, iters = 2,
      sampleCap = 40L)
    assert(capped1.map(_.toSeq).toSeq === capped2.map(_.toSeq).toSeq,
      "sampled training must be deterministic (hash subset, no RNG)")
    assert(capped1.length === 8)
    capped1.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid not unit-normalized: $n")
    }
    assert(capped1.map(_.toSeq).toSeq !== full.map(_.toSeq).toSeq,
      "a binding cap should move the means (different Lloyd input)")
    // 3. serving is regime-agnostic: assignment against the capped
    //    centroids covers every corpus vector
    val assigned = Similarity.assignVectors(emb, capped1)
    assert(assigned.count() === emb.count())
    assert(assigned.where(col("cluster") < 0 || col("cluster") >= 8).count() === 0L)
    // 4. the cap is a published HYPERPARAMETER: its artifact lands at a
    //    distinct path (the params-in-path discipline), so a capped and
    //    an uncapped publish never alias
    val base = java.nio.file.Files.createTempDirectory("graft-scap").toString
    val pubFull = Similarity.publishedIvfCentroids(emb, base, "sc", nlist = 8)
    val pubCapped = Similarity.publishedIvfCentroids(emb, base, "sc", nlist = 8,
      trainSampleCap = 40L)
    assert(Similarity.ivfCentroidsPath(base, "sc", nlist = 8) !==
      Similarity.ivfCentroidsPath(base, "sc", nlist = 8, trainSampleCap = 40L))
    assert(pubFull.map(_.toSeq).toSeq !== pubCapped.map(_.toSeq).toSeq)
  }

  test("warm-start refresh: appended-vectors retrain at half budget stays in the quality band; sidecar records the schedule") {
    import org.apache.spark.sql.functions._
    import org.apache.hadoop.fs.Path
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-warm-kmeans").toString
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cDir = new Path(Similarity.ivfCentroidsPath(base, "warm_c"))
    // v1: cold publish at the full budget
    Similarity.publishedIvfCentroids(emb, base, "warm_c")
    val notes1 = graft.engine.PublishGuard.readSidecarNotes(fs, cDir)
    assert(notes1.get("schedule") === Some("cold") &&
      notes1.get("iters_run") === Some("3"), s"cold sidecar: $notes1")
    // the data changes: append perturbed copies of 20 vectors
    val emb2 = emb.select("vec_id", "embedding").unionByName(
      emb.where(col("vec_id") < 20).select(
        (col("vec_id") + 100000L).as("vec_id"),
        transform(graft.functions.VectorOps.asDouble(col("embedding")),
          x => x * 1.01).as("embedding")))
    Similarity.clearTrainingCaches()
    val warm = Similarity.publishedIvfCentroids(emb2, base, "warm_c")
    val notes2 = graft.engine.PublishGuard.readSidecarNotes(fs, cDir)
    assert(notes2.get("schedule") === Some("warm") &&
      notes2.get("iters_run") === Some("1"),
      s"warm refresh must run iters/2 and record it: $notes2")
    // quality band: the half-budget warm refresh must quantize the NEW
    // corpus at >= 95% of a cold full-budget train's mean max-cosine
    val cold = Similarity.trainIvfCentroids(emb2)
    val vecs = emb2.select(
      graft.functions.VectorOps.asDouble(col("embedding"))).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n == 0) v else v.map(_ / n)
      }
    def meanMaxDot(cents: Array[Array[Double]]): Double =
      vecs.map(v => cents.map(c =>
        c.zip(v).map { case (a, b) => a * b }.sum).max).sum / vecs.length
    val (qWarm, qCold) = (meanMaxDot(warm), meanMaxDot(cold))
    assert(qWarm >= 0.95 * qCold,
      f"warm half-budget quantization $qWarm%.4f < 95%% of cold $qCold%.4f")
    // publish contract unchanged: a fresh-session re-read serves the table
    Similarity.clearTrainingCaches()
    val again = Similarity.publishedIvfCentroids(emb2, base, "warm_c")
    assert(again.map(_.toSeq).toSeq == warm.map(_.toSeq).toSeq)
    // PQ codebooks ride the same warm path
    Similarity.publishedPqCodebooks(emb, base, "warm_b")
    Similarity.clearTrainingCaches()
    val bWarm = Similarity.publishedPqCodebooks(emb2, base, "warm_b")
    val bDir = new Path(Similarity.pqCodebooksPath(base, "warm_b"))
    val bNotes = graft.engine.PublishGuard.readSidecarNotes(fs, bDir)
    assert(bNotes.get("schedule") === Some("warm") &&
      bNotes.get("iters_run") === Some("1"), s"PQ warm sidecar: $bNotes")
    assert(bWarm.length == 8 && bWarm.forall(_.length == 16))
  }

  test("PQ ANN recall@5 vs brute force, scores exact after rerank") {
    val emb = Tables.embeddings(spark, sf)
    def byPair(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = byPair(Similarity.bruteForceTopK(emb))
    val pq = byPair(Similarity.pqTopK(emb))
    val hit = exact.keySet & pq.keySet
    val recall = hit.size.toDouble / exact.size
    info(s"PQ recall@5 = $recall (${hit.size}/${exact.size})")
    assert(recall >= 0.5, s"PQ recall@5 $recall below floor")
    // the rerank is exact, so every shared pair carries the identical cosine
    hit.foreach(p => assert(pq(p) == exact(p), s"rerank score drifted at $p"))
  }

  test("IVF+PQ ANN recall@5 vs brute force, scores exact after rerank") {
    val emb = Tables.embeddings(spark, sf)
    def byPair(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = byPair(Similarity.bruteForceTopK(emb))
    val ivfpq = byPair(Similarity.ivfPqTopK(emb))
    val hit = exact.keySet & ivfpq.keySet
    val recall = hit.size.toDouble / exact.size
    info(s"IVF+PQ recall@5 = $recall (${hit.size}/${exact.size})")
    assert(recall >= 0.4, s"IVF+PQ recall@5 $recall below floor")
    hit.foreach(p => assert(ivfpq(p) == exact(p), s"rerank score drifted at $p"))
  }

  test("LSH ANN recall@5 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val ann = pairs(Similarity.lshTopK(emb))
    val recall = (exact & ann).size.toDouble / exact.size
    info(s"LSH recall@5 = $recall (${(exact & ann).size}/${exact.size})")
    assert(recall >= 0.5, s"LSH recall@5 $recall below floor")
  }

  test("md5-keyed (oracle-expressible) LSH recall@5 vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    def byPair(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = byPair(Similarity.bruteForceTopK(emb))
    val ann = byPair(Similarity.lshTopKSql(emb))
    val hit = exact.keySet & ann.keySet
    val recall = hit.size.toDouble / exact.size
    info(s"md5-LSH recall@5 = $recall (${hit.size}/${exact.size})")
    assert(recall >= 0.5, s"md5-LSH recall@5 $recall below floor")
    // the rerank is exact: shared pairs carry the identical cosine
    hit.foreach(p => assert(ann(p) == exact(p), s"rerank score drifted at $p"))
  }

  test("external query table equals the internal prefix path on all ANN variants") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    // the same 10 vectors, passed as an EXTERNAL (vec_id, embedding)
    // table: every serving path must produce bit-identical output to the
    // internal vec_id<10 prefix — same normalization, probes, ADC tables,
    // rerank — because external serving IS the same math over a swapped
    // query frame
    val ext = Some(emb.where(col("vec_id") < 10).select("vec_id", "embedding"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(Similarity.bruteForceTopK(emb, queryTable = ext))
      === rows(Similarity.bruteForceTopK(emb)), "bruteForce diverged")
    assert(rows(Similarity.ivfTopK(emb, queryTable = ext))
      === rows(Similarity.ivfTopK(emb)), "ivf diverged")
    assert(rows(Similarity.pqTopK(emb, queryTable = ext))
      === rows(Similarity.pqTopK(emb)), "pq diverged")
    assert(rows(Similarity.ivfPqTopK(emb, queryTable = ext))
      === rows(Similarity.ivfPqTopK(emb)), "ivfpq diverged")
  }

  test("int8 quantization codes are in range and reconstruction error is bounded") {
    val rows = Similarity.quantizeInt8(Tables.embeddings(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").split(",").map(_.toLong)
      assert(codes.forall(c => c >= 0L && c <= 255L),
        s"vec ${r.getLong(0)}: code outside int8 range")
      val (vmin, vmax) = (r.getDouble(2), r.getDouble(3))
      val step = (vmax - vmin) / 255.0
      // affine quantization error is at most (step/2)^2 per component
      assert(r.getDouble(4) <= step * step / 4.0 + 1e-12,
        s"vec ${r.getLong(0)}: mse ${r.getDouble(4)} exceeds the step bound")
    }
  }

  test("published PCA rotation is orthonormal and variance-ordered") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pca-test").toString
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val (means, rot) = Similarity.publishedPca(emb, dir, "pca_spec", outDims = 16)
    assert(means.length == 64 && rot.length == 64 && rot.head.length == 16)
    // columns orthonormal: RᵀR = I within float-fold tolerance
    for (a <- 0 until 16; b <- a until 16) {
      val dot = (0 until 64).map(j => rot(j)(a) * rot(j)(b)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"RtR[$a][$b] = $dot")
    }
    // sign convention: the largest-|component| coordinate is positive
    for (k <- 0 until 16) {
      val colK = (0 until 64).map(j => rot(j)(k))
      assert(colK.maxBy(math.abs) >= 0, s"column $k not sign-fixed")
    }
    // projections realize the eigen-spectrum: sample variance per output
    // coordinate is non-increasing (p01 is the top principal direction)
    val proj = Similarity.pcaProjectPublished(emb, dir, "pca_spec", outDims = 16).collect()
    val vars = (1 to 16).map { k =>
      val xs = proj.map(_.getDouble(k))
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    assert(vars.head + 1e-9 >= vars(7) && vars(7) + 1e-9 >= vars.last,
      s"variances not ordered: $vars")
    // the norm column derives from the rounded components exactly
    proj.take(20).foreach { r =>
      val n = math.sqrt((1 to 16).map(k => r.getDouble(k) * r.getDouble(k)).sum)
      val rounded = math.floor(n * 1e6 + 0.5) / 1e6
      assert(r.getDouble(17) == rounded, s"norm mismatch for vec ${r.getLong(0)}")
    }
  }

  test("diverse sample: per-cluster caps, rank = descending centroid dot, bottom-k plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-diverse").toString
    val emb = Tables.embeddings(spark, sf)
    val df = Similarity.diverseSample(emb, dir, "ivf_diverse_spec", perCluster = 4)

    // the 100 TB shape: per-cluster selection folds through the bounded
    // imperative aggregate, NOT a row_number window over nlist partitions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bottom_k"), s"bottom-k agg missing:\n$plan")
    assert(!plan.contains("row_number"), s"window rank crept in:\n$plan")

    val rows = df.collect()
    val byCluster = rows.groupBy(_.getInt(0))
    assert(byCluster.nonEmpty && byCluster.values.forall(_.length <= 4))
    byCluster.foreach { case (c, rs) =>
      // ranks are 1..n and centroid_dot is non-increasing along them
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).sameElements(1 to rs.length), s"ranks in $c")
      val dots = sorted.map(_.getDouble(3))
      assert(dots.zip(dots.tail).forall { case (a, b) => a + 1e-9 >= b },
        s"dots not ordered in cluster $c: ${dots.toSeq}")
    }
    // selected ids are distinct across the whole sample (a vector belongs
    // to exactly one cluster)
    val ids = rows.map(_.getLong(2))
    assert(ids.distinct.length == ids.length)
  }

  test("semantic prune equals driver-side within-cluster union-find; one rep kept per group") {
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-semdedup").toString
    val tau = 0.45
    val got = Similarity.semanticPrunePublished(emb, base, "semprune")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // third derivation: assignment + pairs + union-find in plain JVM
    // code against the SAME published centroid table
    val cents = Similarity.publishedIvfCentroids(emb, base, "semprune")
    val vecs = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      r.getLong(0) -> v
    }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nv = vecs.map { case (id, v) =>
      val n = math.sqrt(dot(v, v)); id -> v.map(_ / n)
    }
    // argmax dot, tie -> HIGHER centroid index (the array_max struct rule)
    val assign = nv.map { case (id, x) =>
      id -> cents.zipWithIndex.map { case (c, i) => (dot(x, c), i) }.max._2
    }
    val ids = vecs.keys.toSeq.sorted
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      i <- ids; j <- ids
      if i < j && assign(i) == assign(j) && dot(nv(i), nv(j)) >= tau
    } {
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val expect = ids.map(i =>
      i -> (assign(i), find(i), find(i) == i)).toMap
    assert(got === expect, "semantic prune diverged from the union-find truth")
    // at least one multi-member group collapsed, or the fixture proved
    // nothing; exactly one kept representative (the min id) per group
    val groups = got.toSeq.groupBy(_._2._2)
    assert(groups.exists(_._2.size > 1), "no semantic group to prune")
    groups.foreach { case (rep, ms) =>
      assert(ms.count(_._2._3) === 1, s"group $rep kept ${ms.count(_._2._3)}")
      assert(rep === ms.map(_._1).min, s"rep $rep is not the min member id")
    }
  }

  test("centroid drift: cohorts conserve the corpus, identical cohorts give psi 0") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val row = Similarity.centroidDriftPublished(emb, base, "drift_spec").head()
    // every vector lands in exactly one cohort: counts conserve the corpus
    assert(row.getLong(0) + row.getLong(1) === emb.count())
    // psi is finite and the flag matches the documented 0.2 cut
    assert(!row.getDouble(2).isNaN && row.getDouble(2) >= 0.0 - 1e-9)
    assert(row.getBoolean(3) === (row.getDouble(2) >= 0.2))
    // identical cohorts: p == q in every cell, so every PSI term is
    // exactly 0 — the fold and the rounding must preserve that
    val cents = Similarity.publishedIvfCentroids(emb, base, "drift_spec")
    val counts = Similarity.assignVectors(emb, cents)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
    val self = Similarity.psiOverClusterCounts(counts, counts, cents.length).head()
    assert(self.getDouble(2) === 0.0 && !self.getBoolean(3))
  }

  test("whitening: exact product of published projection and scales; unit mean square") {
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-whiten").toString
    val got = Similarity.whitenPublished(emb, base, "pca_w", "whiten_w")
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(k => r.getDouble(k)).toVector).toMap
    // exact recompute: published projections × published scales, 6 dp
    val scales = Similarity.publishedWhitenScales(emb, base, "pca_w", "whiten_w")
    val proj = Similarity.pcaProjectPublished(emb, base, "pca_w")
      .collect().map(r => r.getLong(0) ->
        (1 to 16).map(k => r.getDouble(k)).toVector).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (id, w) =>
      val expect = proj(id).zip(scales).map { case (p, s) => r6(p * s) }
      assert(w === expect, s"vec $id whitening diverged")
    }
    // per-component mean square is 1 by construction (scales trained on
    // this same corpus), up to the 6 dp output rounding
    (0 until 16).foreach { k =>
      val ms = got.values.map(w => w(k) * w(k)).sum / got.size
      assert(math.abs(ms - 1.0) <= 1e-3, s"component $k mean square $ms")
    }
  }

  test("hard negatives equal a driver-side different-label top-k recompute") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.hardNegatives(emb).collect()
      .map(r => (r.getLong(0), r.getInt(2)) ->
        (r.getInt(1), r.getLong(3), r.getInt(4)))
      .toMap
    val rows = emb.collect().map { r =>
      (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getInt(2))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = (for {
      (q, qv, ql) <- rows if q < 10
    } yield {
      val negs = rows
        .filter { case (v, _, l) => v != q && l != ql }
        .map { case (v, vv, l) => (v, l, cos(qv, vv)) }
        .sortBy { case (v, _, c) => (-c, v) }
        .take(5)
      negs.zipWithIndex.map { case ((v, l, _), i) =>
        (q, i + 1) -> (ql, v, l)
      }
    }).flatten.toMap
    assert(got === expect, "hard-negative set diverged from the recompute")
    // every mined negative really is a different label
    got.foreach { case ((_, _), (ql, _, nl)) => assert(nl != ql) }
  }

  test("silhouette equals a driver-side recompute from the published table") {
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-silhouette").toString
    val got = Similarity.silhouettePublished(emb, base, "sil_spec").collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val cents = Similarity.publishedIvfCentroids(emb, base, "sil_spec")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val perVec = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      val n = math.sqrt(dot(v, v)); val nv = v.map(_ / n)
      // descending (dot, idx) — the array_max / reverse(array_sort) rule
      val ranked = cents.zipWithIndex
        .map { case (c, i) => (dot(nv, c), i) }
        .sortBy { case (d, i) => (-d, -i) }
      val (d1, own) = ranked(0); val (d2, _) = ranked(1)
      val (a, b) = (1.0 - d1, 1.0 - d2)
      val s = if (math.max(a, b) == 0.0) 0.0 else (b - a) / math.max(a, b)
      own -> r6(s)
    }
    val expect = perVec.groupBy(_._1).map { case (cl, xs) =>
      val sils = xs.map(_._2)
      cl -> (xs.length.toLong, r4(sils.sum / sils.length),
        sils.min, sils.max)
    }
    assert(got.keySet === expect.keySet)
    got.foreach { case (cl, (n, mean, mn, mx)) =>
      val (en, emean, emn, emx) = expect(cl)
      assert(n === en, s"cluster $cl count")
      assert(mn === emn && mx === emx, s"cluster $cl min/max")
      assert(math.abs(mean - emean) <= 1e-4 + 1e-12, s"cluster $cl mean")
    }
    // silhouettes are non-negative under nearest-centroid assignment
    got.foreach { case (cl, (_, _, mn, _)) =>
      assert(mn >= 0.0, s"cluster $cl has negative silhouette $mn")
    }
  }

  test("recall eval: hits equal the frame intersection, recall clears the IVF floor") {
    val emb = Tables.embeddings(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-recall").toString
    val got = Similarity.recallEvalPublished(emb, base, "recall_spec")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val cents = Similarity.publishedIvfCentroids(emb, base, "recall_spec")
    val ivf = pairs(Similarity.ivfTopK(emb, centroids = Some(cents)))
    assert(got.keySet === exact.map(_._1))
    got.foreach { case (q, (hits, recall)) =>
      val expectHits = (exact & ivf).count(_._1 == q).toLong
      assert(hits === expectHits, s"query $q hits")
      assert(recall === hits.toDouble / 5, s"query $q recall")
    }
    val mean = got.values.map(_._2).sum / got.size
    info(s"mean IVF recall@5 = $mean")
    assert(mean >= 0.5, s"mean recall $mean below the IVF floor")
  }

  test("truncationRecall: hits equal the exact/prefix intersection; full width is recall 1") {
    import org.apache.spark.sql.functions.{col, slice}
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.truncationRecall(emb, prefixDim = 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    val trunc = pairs(Similarity.bruteForceTopK(
      emb.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))))
    assert(got.keySet === exact.map(_._1))
    got.foreach { case (q, (hits, recall)) =>
      val expectHits = (exact & trunc).count(_._1 == q).toLong
      assert(hits === expectHits, s"query $q hits")
      assert(recall === hits.toDouble / 5, s"query $q recall")
    }
    // the degenerate cut (full 64-dim prefix) IS the exact scan
    val full = Similarity.truncationRecall(emb, prefixDim = 64).collect()
    assert(full.nonEmpty && full.forall(_.getDouble(2) == 1.0),
      "full-width prefix must recall everything")
  }

  test("clusterTermsPublished: driver-side lift recompute from the published table") {
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-terms").toString
    val got = Similarity
      .clusterTermsPublished(emb, docs, base, "terms_spec").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    // third derivation: JVM argmax-dot assignment against the SAME
    // published table, imperative tokenization, integer counts, the
    // identical rounded lift and (lift desc, c_tf desc, term) cut
    val cents = Similarity.publishedIvfCentroids(emb, base, "terms_spec")
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val assign = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      val n = math.sqrt(dot(v, v)); val nv = v.map(_ / n)
      r.getLong(0) -> cents.zipWithIndex
        .map { case (c, i) => (dot(nv, c), i) }.max._2
    }.toMap
    def toks(text: String): Seq[String] =
      text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ", -1).toSeq
    val clTerm = docs.select("doc_id", "text").collect().flatMap { r =>
      assign.get(r.getLong(0)).toSeq
        .flatMap(cl => toks(r.getString(1)).map(t => (cl, t)))
    }.toSeq
    val cTf = clTerm.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gTf = clTerm.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cTot = clTerm.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val gTot = clTerm.size.toLong
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = cTf.collect { case ((cl, t), ctf) if ctf >= 3L =>
      (cl, t, ctf, gTf(t),
        r6(ctf.toDouble * gTot.toDouble / (cTot(cl).toDouble * gTf(t).toDouble)))
    }.toSeq
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, t, ctf, _, lift) => (-lift, -ctf, t) }
          .take(5).zipWithIndex
          .map { case ((cl, t, ctf, gtf, lift), i) =>
            (cl, i + 1, t, ctf, gtf, lift) }
      }.toSet
    assert(got === expect, "cluster term lift table diverged")
    // a labeling that never ranks a term below its floor count
    assert(got.forall(_._4 >= 3L))
  }

  test("hybridRrf: driver-side fusion recompute; both lists contribute") {
    val emb = Tables.embeddings(spark, sf)
    val docs = Tables.documents(spark, sf)
    val got = Similarity.hybridRrf(emb, docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        Option(r.get(4)).map(_.asInstanceOf[Int]), r.getDouble(5))).toSet
    // third derivation: emb ranks from the oracle-anchored chain, lex
    // ranks from an imperative rarity-weighted distinct-overlap score
    val embRanks = Similarity.bruteForceTopK(emb, 10, 20).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getInt(1))).toMap
    def toks(text: String): Set[String] =
      text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ", -1).toSet
    val docToks = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val n = docToks.size.toLong
    val dfT = docToks.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val lexRanks = (0L until 10L).flatMap { q =>
      val qt = docToks(q)
      val scored = docToks.toSeq.collect {
        case (d, ts) if d != q && (ts & qt).nonEmpty =>
          (d, (ts & qt).toSeq.map(t => n - dfT(t)).sum)
      }
      scored.sortBy { case (d, s) => (-s, d) }.take(20).zipWithIndex
        .map { case ((d, _), i) => ((q, d), i + 1) }
    }.toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = (embRanks.keySet ++ lexRanks.keySet).groupBy(_._1)
      .flatMap { case (q, keys) =>
        val fused = keys.toSeq.map { key =>
          val re = embRanks.get(key); val rl = lexRanks.get(key)
          val rrf = r6(re.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            rl.map(r => 1.0 / (60 + r)).getOrElse(0.0))
          (key._2, re, rl, rrf)
        }
        fused.sortBy { case (v, _, _, s) => (-s, v) }.take(5).zipWithIndex
          .map { case ((v, re, rl, s), i) => (q, i + 1, v, re, rl, s) }
      }.toSet
    assert(got === expect, "rrf fusion diverged from the recompute")
    // the fusion is genuinely hybrid: some served row exists in exactly
    // one of the two lists (rank from the other side is null)
    assert(got.exists(r => r._4.isEmpty ^ r._5.isEmpty),
      "no row served from a single list — fusion untested")
  }

  test("mmrRerank: JVM greedy recompute; picks are distinct pool members") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.mmrRerank(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val pool = Similarity.bruteForceTopK(emb, 10, 10).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val vecs = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      r.getLong(0) -> v
    }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) /
        (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = pool.groupBy(_._1).flatMap { case (q, cands) =>
      val rel = cands.map(c => c._2 -> c._3).toMap
      var picked = List.empty[Long]
      (1 to 5).map { t =>
        val scored = rel.keys.filterNot(picked.contains).map { d =>
          val pen = if (picked.isEmpty) 0.0 else picked.map(cos(d, _)).max
          (d, r6(0.5 * rel(d) - 0.5 * pen))
        }.toSeq
        val (d, s) = scored.minBy { case (v, sc) => (-sc, v) }
        picked = picked :+ d
        (q, d, t, s)
      }
    }.toSet
    assert(got === expect, "greedy MMR trace diverged from the recompute")
    // every query serves exactly 5 distinct picks from its pool
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).size === 5, s"query $q picks not distinct")
      assert(rows.map(_._3).toSeq.sorted === (1 to 5), s"query $q pick order")
    }
  }

  test("triplets: driver-side pos/neg recompute; margin is the raw difference") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.triplets(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1)
    val rows = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      (r.getLong(0), r.getInt(2), v)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expect = rows.filter(_._1 < 10).sortBy(_._1).map { case (q, ql, qv) =>
      def best(pred: Int => Boolean) = rows
        .filter(r => r._1 != q && pred(r._2))
        .map(r => (r._1, cos(qv, r._3)))
        .minBy { case (id, c) => (-c, id) }
      val (pid, pc) = best(_ == ql)
      val (nid, nc) = best(_ != ql)
      (q, ql, pid, pc, nid, nc, pc - nc)
    }
    assert(got.toSeq === expect.toSeq, "triplet mining diverged")
    // positives share the anchor label by construction; some hard
    // negative should beat some positive (margin ≤ 0 exists) on real
    // data — the violations a triplet loss trains on
    assert(got.nonEmpty)
  }

  test("kCenterCoreset: JVM farthest-point recompute; radius non-increasing") {
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.kCenterCoreset(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    val vecs = emb.collect().map { r =>
      val v = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(_.toDouble).toArray
      r.getLong(0) -> v
    }.toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nvs = vecs.map { case (id, v) =>
      val n = math.sqrt(dot(v, v)); id -> v.map(_ / n)
    }
    def r9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9
    var picked = List(nvs.keys.min)
    val expect = scala.collection.mutable.ListBuffer(
      (1, picked.head, Option.empty[Double]))
    (2 to 10).foreach { t =>
      val cands = nvs.keys.filterNot(picked.contains).map { id =>
        id -> picked.map(p => r9(1.0 - dot(nvs(id), nvs(p)))).min
      }.toSeq
      val mx = cands.map(_._2).max
      val id = cands.filter(_._2 == mx).map(_._1).min
      picked = picked :+ id
      expect += ((t, id, Some(mx)))
    }
    assert(got.toSeq === expect.toList, "farthest-point trace diverged")
    // the coverage radius never grows as picks accumulate
    val radii = got.flatMap(_._3)
    radii.zip(radii.tail).foreach { case (a, b) =>
      assert(b <= a + 1e-12, s"radius grew: $a -> $b")
    }
  }
}
