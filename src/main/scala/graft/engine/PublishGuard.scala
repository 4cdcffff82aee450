package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Guards for publish-once / reuse-many artifacts (shared cluster tables,
  * memoized centroids/codebooks).
  *
  * Two operational hazards of compute-once caches at scale, both flagged by
  * the round-5 review:
  *
  *  1. STALE KEY — the memo contract says "the cache key must encode the
  *     data version", but nothing *detects* a violation: a key reused after
  *     the input changed silently serves results computed from different
  *     data. [[fingerprint]] + the sidecar turn that silent wrong answer
  *     into a loud error: publishers record (row count, order-independent
  *     xxhash64 fold) of their input beside the artifact; every reuse
  *     recomputes the fingerprint of the CURRENT input (one map-side
  *     aggregate — no shuffle beyond a single-row combine) and
  *     [[verifySidecar]] fails on mismatch.
  *
  *  2. CONCURRENT PUBLISH — probe-then-`overwrite` to the final path means
  *     two fresh sessions that both miss the `_SUCCESS` marker write
  *     concurrently to the same directory; overwrite's delete phase can
  *     clobber the other writer's in-flight output and stamp a mixed table.
  *     [[publishAtomic]] writes to a session-unique staging sibling and
  *     renames into place — `FileSystem.rename` is atomic on HDFS-like
  *     stores, the first rename wins, and losers delete their staging dir
  *     and read the winner's table.
  */
object PublishGuard {

  /** Order-independent input fingerprint: row count + bit-XOR fold of the
    * per-row xxhash64 over `cols`. XOR commutes, so the value is stable
    * under repartitioning — only the DATA determines it.
    */
  final case class Fingerprint(rows: Long, hash: Long)

  /** Sidecar filename inside a published table directory. The leading `_`
    * keeps it out of Spark/DuckDB parquet file listings (same convention
    * as `_SUCCESS`).
    */
  val SidecarFile = "_GRAFT_FINGERPRINT"

  /** One map-side pass over `df`: partial (count, xor) per partition, one
    * combine row. Never shuffles data-sized frames.
    *
    * MEMOIZED (round 18) by (canonicalized plan, fingerprint columns,
    * input-file metadata signature): the published-artifact chains
    * (edges → walk corpus → embeddings → centroids) re-verify every link
    * on every consumer call, so a bench/serving session paid a
    * fingerprint JOB per link per query (~1.1 s/query measured on the
    * ANN family). For a frame whose every leaf is a file scan, the file
    * set + per-file (length, mtime) is a sound staleness key — any real
    * rewrite (publishes write fresh files; testdata regeneration
    * replaces files) changes it and forces a recompute from data, so a
    * stale cache key still fails loudly. Frames with any non-file leaf
    * (in-memory, checkpointed) are never memoized.
    */
  def fingerprint(df: DataFrame, cols: Seq[Column]): Fingerprint = {
    def compute(): Fingerprint = {
      val r = df.select(xxhash64(cols: _*).as("__fph"))
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(__fph)"), lit(0L)).as("h"))
        .head()
      Fingerprint(r.getLong(0), r.getLong(1))
    }
    fingerprintKey(df, cols) match {
      case Some(key) =>
        val hit = fpMemo.get(key)
        if (hit != null) hit
        else {
          val fp = compute()
          fpMemo.putIfAbsent(key, fp)
          fp
        }
      case None => compute()
    }
  }

  private val fpMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Fingerprint]()

  /** Test hook — drop the fingerprint memo (fresh-session simulation). */
  private[graft] def clearFingerprintMemo(): Unit = fpMemo.clear()

  /** The memo key, or None when the frame is not purely file-backed.
    * Plan semantics (canonicalized hash) + the exact fingerprint columns
    * + sorted (path, length, mtime) of every input file.
    */
  private def fingerprintKey(
      df: DataFrame, cols: Seq[Column]): Option[String] = {
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val analyzed = df.queryExecution.analyzed
    val leaves = analyzed.collectLeaves()
    val allFileBacked = leaves.nonEmpty && leaves.forall {
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case _ => false
    }
    if (!allFileBacked) None
    else {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val sig = new StringBuilder
      df.inputFiles.sorted.foreach { f =>
        val p = new Path(f)
        val st = p.getFileSystem(conf).getFileStatus(p)
        sig.append(f).append(':').append(st.getLen).append(':')
          .append(st.getModificationTime).append('|')
      }
      Some(analyzed.semanticHash().toString + "/" +
        cols.map(c => org.apache.spark.sql.GraftBridge.expression(c)
          .canonicalized.toString).mkString(",") + "/" + sig)
    }
  }

  /** `notes` records publish-time facts that don't key the cache but do
    * explain the artifact's provenance (e.g. the EFFECTIVE training
    * schedule of a warm-start refresh, which differs from the path's
    * nominal iteration count — round-15 advice). [[readSidecar]]'s
    * parser ignores unknown keys, so notes never affect staleness checks.
    */
  def writeSidecar(fs: FileSystem, dir: Path, fp: Fingerprint,
      notes: Map[String, String] = Map.empty): Unit = {
    val out = fs.create(new Path(dir, SidecarFile), true)
    val extra = notes.toSeq.sorted.map { case (k, v) => s"$k=$v\n" }.mkString
    try out.write(
      s"rows=${fp.rows}\nhash=${fp.hash}\n$extra".getBytes("UTF-8"))
    finally out.close()
  }

  /** All `k=v` lines of a sidecar, fingerprint AND notes — for specs and
    * provenance inspection.
    */
  def readSidecarNotes(fs: FileSystem, dir: Path): Map[String, String] = {
    val p = new Path(dir, SidecarFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v.trim }.toMap
    }
  }

  def readSidecar(fs: FileSystem, dir: Path): Option[Fingerprint] = {
    val p = new Path(dir, SidecarFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val kv = txt.linesIterator.map(_.split("=", 2))
        .collect { case Array(k, v) => k -> v.trim }.toMap
      for (n <- kv.get("rows"); h <- kv.get("hash"))
        yield Fingerprint(n.toLong, h.toLong)
    }
  }

  /** Fail loudly if the artifact at `dir` was not built from input with
    * fingerprint `current` — a stale cache key must be an error, never a
    * silently wrong answer.
    */
  def verifySidecar(
      fs: FileSystem, dir: Path, current: Fingerprint, what: String): Unit =
    readSidecar(fs, dir) match {
      case None =>
        throw new IllegalStateException(
          s"$what at $dir has no $SidecarFile sidecar — cannot verify it " +
            "matches the current input; delete the table or publish under " +
            "a new cache key")
      case Some(stored) if stored != current =>
        throw new IllegalStateException(
          s"$what at $dir was built from DIFFERENT input (published " +
            s"rows=${stored.rows} hash=${stored.hash}; current " +
            s"rows=${current.rows} hash=${current.hash}) — the cache key " +
            "is stale; pass a key that encodes the data version")
      case _ => ()
    }

  /** In-JVM memo variant of [[verifySidecar]] for driver-memory caches
    * (centroids, codebooks) that have no backing directory.
    */
  def verifyMemo(
      stored: Fingerprint, current: Fingerprint, what: String): Unit =
    if (stored != current)
      throw new IllegalStateException(
        s"$what was trained on DIFFERENT input (memoized " +
          s"rows=${stored.rows} hash=${stored.hash}; current " +
          s"rows=${current.rows} hash=${current.hash}) — the cache key " +
          "is stale; pass a key that encodes the data version")

  /** Publisher-token marker inside a staging (then published) table
    * directory. Leading `_` keeps it out of parquet file listings.
    */
  val MarkerFile = "_GRAFT_PUBLISHER"

  /** Publish `out` atomically: `write` materializes the artifact into a
    * session-unique hidden staging sibling, then one `rename` moves it
    * into place. First rename wins; a loser deletes its staging dir (the
    * caller then reads the winner's identical table — identical because
    * the fingerprint sidecar pins both to the same input). The staging
    * name starts with `.` so that even the local-FS rename fallback, which
    * can merge into an existing destination instead of failing, leaves
    * only a hidden directory that parquet file listings ignore.
    * Returns true if this caller's table is the one published.
    *
    * The win is verified by CONTENT, not by the rename's return value: on
    * stores where `rename(src, existingDir)` moves src UNDER the
    * destination, a racing loser's rename also "succeeds". Each publisher
    * stamps its staging dir with a unique token ([[MarkerFile]]) before
    * renaming and trusts `won=true` only if the published table's top-level
    * marker carries its own token; a loser whose staging leaked under the
    * winner's table deletes the leaked copy.
    */
  /** The full compute-once / publish / reuse dance for a shared table —
    * the shape [[graft.operators.Dedup.sharedNearDupClusters]] proved out
    * (its Scaladoc carries the operational contract), extracted so every
    * compute-once artifact family (near-dup clusters, triangle stats, …)
    * shares ONE implementation of the memo + `_SUCCESS` probe + atomic
    * publish + fingerprint verification.
    *
    *  - `memo`: the caller's in-JVM path cache (per artifact family).
    *  - `family`: the warehouse subdirectory (`$base/$family/<slug>`).
    *  - `cacheKey`: MUST encode the data version; the published path is
    *    made injective in it via an md5 suffix (sanitization alone could
    *    collide distinct keys).
    *  - `params`: non-data parameters that change the artifact (rendered
    *    into both the memo key and the path slug).
    *  - `fp`: fingerprint of the artifact's INPUT — re-checked on every
    *    reuse (memo hits included) so a stale key fails loudly.
    *
    * With no baseDir (argument or `spark.graft.warehouse.dir` conf) the
    * table falls back to driver-local temp — correct in local mode only.
    */
  def sharedTable(
      spark: SparkSession,
      memo: java.util.concurrent.ConcurrentHashMap[String, String],
      baseDir: String,
      family: String,
      cacheKey: String,
      params: Seq[String],
      fp: Fingerprint,
      what: String)(compute: () => DataFrame): DataFrame =
    sharedTableWithNotes(spark, memo, baseDir, family, cacheKey, params, fp,
      what, _ => Map.empty)(compute)._1

  /** [[sharedTable]] that additionally records publish-time NOTES derived
    * from the staged artifact (row counts, node counts — facts a consumer
    * would otherwise recompute with a job per call) and returns them with
    * the table. Notes must be deterministic functions of the artifact so
    * a racing publish loser reading the winner's sidecar sees the same
    * values it would have written. Unknown keys never affect staleness
    * checks ([[readSidecar]] parses only rows/hash), so note evolution is
    * compatible both ways; a caller must tolerate missing keys (tables
    * published before its note was introduced).
    */
  def sharedTableWithNotes(
      spark: SparkSession,
      memo: java.util.concurrent.ConcurrentHashMap[String, String],
      baseDir: String,
      family: String,
      cacheKey: String,
      params: Seq[String],
      fp: Fingerprint,
      what: String,
      notesOf: DataFrame => Map[String, String])(
      compute: () => DataFrame): (DataFrame, Map[String, String]) = {
    val base =
      if (baseDir.nonEmpty) baseDir
      else spark.conf.get("spark.graft.warehouse.dir", "")
    val paramsSlug = params.mkString("_")
    // family is part of the memo key: two artifact families sharing one
    // memo map (e.g. the weighted and unweighted trade-edge tables) must
    // never alias each other's published path
    val dir = memo.computeIfAbsent(
      (Seq(base, family, cacheKey) ++ params).mkString("|"), _ => {
        if (base.nonEmpty) {
          val keyHash = java.security.MessageDigest.getInstance("MD5")
            .digest(cacheKey.getBytes("UTF-8"))
            .take(6).map(x => f"${x & 0xff}%02x").mkString
          val slug = (Seq(
            s"${cacheKey.replaceAll("[^A-Za-z0-9._-]", "_")}_$keyHash") ++
            (if (paramsSlug.nonEmpty) Seq(paramsSlug) else Nil)).mkString("_")
          val out = s"$base/$family/$slug"
          val outPath = new Path(out)
          val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          // _SUCCESS present ⇒ a prior session already published this exact
          // (key, params) table — reuse. Absent ⇒ compute into a staging
          // sibling and rename into place (racing publishers: first rename
          // wins, losers read the winner's committed table).
          if (!fs.exists(new Path(outPath, "_SUCCESS"))) {
            publishAtomic(spark, out) { staging =>
              compute().write.mode("overwrite").parquet(staging)
              writeSidecar(fs, new Path(staging), fp,
                notesOf(spark.read.parquet(staging)))
            }
          }
          out
        } else {
          val out = java.nio.file.Files
            .createTempDirectory(s"graft-$family").toString
          compute().write.mode("overwrite").parquet(out)
          val outPath = new Path(out)
          writeSidecar(
            outPath.getFileSystem(spark.sparkContext.hadoopConfiguration),
            outPath, fp, notesOf(spark.read.parquet(out)))
          out
        }
      })
    val dirPath = new Path(dir)
    val dirFs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    verifySidecar(dirFs, dirPath, fp, what)
    (spark.read.parquet(dir), readSidecarNotes(dirFs, dirPath))
  }

  /** Publish-or-reuse a DataFrame-valued artifact at a FIXED path — the
    * [[graft.operators.Similarity.publishedArtifact]] table logic for
    * artifacts that stay distributed (node-sized embedding tables)
    * instead of collecting to driver values. Fixed-path semantics are
    * REBUILD-on-stale (delete + republish when the sidecar mismatches):
    * a path-keyed table can always be rebuilt from the data in front of
    * us — unlike [[sharedTable]]'s user-claimed cache keys, where a
    * mismatch means the KEY lies and must fail loudly.
    */
  def publishedTableAt(
      spark: SparkSession,
      path: String,
      fp: Fingerprint,
      what: String,
      notes: Map[String, String] = Map.empty)(
      compute: () => DataFrame): DataFrame = {
    val outPath = new Path(path)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def publish(): Unit = publishAtomic(spark, path) { staging =>
      compute().write.mode("overwrite").parquet(staging)
      writeSidecar(fs, new Path(staging), fp, notes)
    }
    if (!fs.exists(outPath)) publish()
    else if (readSidecar(fs, outPath) != Some(fp)) {
      // stale rebuild: the replacement is FULLY materialized in staging
      // before the live table is touched, so a concurrent reader's
      // missing-table window shrinks from the whole recompute to the
      // delete→rename metadata pair (round-14 advice; the fresh-publish
      // path was always atomic, only this rebuild path deleted first)
      replaceAtomic(spark, path) { staging =>
        compute().write.mode("overwrite").parquet(staging)
        writeSidecar(fs, new Path(staging), fp, notes)
      }
    }
    verifySidecar(fs, outPath, fp, what)
    spark.read.parquet(path)
  }

  def publishAtomic(spark: SparkSession, out: String)(
      write: String => Unit): Boolean = {
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(outPath.getParent)
    val token = java.util.UUID.randomUUID().toString
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.staging-${token.take(8)}")
    var won = false
    try {
      write(staging.toString)
      val m = fs.create(new Path(staging, MarkerFile), true)
      try m.write(token.getBytes("UTF-8")) finally m.close()
      if (!fs.exists(outPath) && fs.rename(staging, outPath)) {
        val published = new Path(outPath, MarkerFile)
        won = fs.exists(published) && {
          val in = fs.open(published)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt == token
        }
        if (!won) {
          // rename "succeeded" but merged us under the winner: remove the
          // leaked nested staging copy so the published table stays clean
          val leaked = new Path(outPath, staging.getName)
          if (fs.exists(leaked)) fs.delete(leaked, true)
        }
      }
      won
    } finally {
      if (!won) fs.delete(staging, true)
    }
  }

  /** [[publishAtomic]] for REPLACING a live table: the new version is
    * written fully into staging first, then the live directory is deleted
    * immediately before the rename — the reader-visible missing-table
    * window is two metadata operations, not the recompute. Racing
    * replacers resolve like racing publishers: the first rename wins
    * (verified by token, exactly as publishAtomic), losers delete their
    * staging dir and read the winner's table. A rename that fails with NO
    * winner visible (transient FS error after the live delete) retries,
    * then keeps the staging dir rather than deleting the only surviving
    * copy of the data.
    */
  def replaceAtomic(spark: SparkSession, out: String)(
      write: String => Unit): Boolean = {
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(outPath.getParent)
    val token = java.util.UUID.randomUUID().toString
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.staging-${token.take(8)}")
    var won = false
    var keepStaging = false
    try {
      write(staging.toString)
      val m = fs.create(new Path(staging, MarkerFile), true)
      try m.write(token.getBytes("UTF-8")) finally m.close()
      // the swap: delete-then-rename, both metadata ops — a concurrent
      // replacer may slip its rename between ours, in which case our
      // rename merges-under or fails and we lose (token check below)
      fs.delete(outPath, true)
      var renamed = fs.rename(staging, outPath)
      // transient-FS recovery: the live table is already deleted, so a
      // rename returning false with NO concurrent winner would — if we
      // let the finally block delete staging — leave NEITHER version on
      // disk. Retry while no winner marker is visible; if the rename
      // still fails and nobody else won, KEEP the staging directory so
      // the fresh data survives for manual recovery.
      var retries = 0
      while (!renamed && retries < 3 &&
          !fs.exists(new Path(outPath, MarkerFile))) {
        retries += 1
        renamed = fs.rename(staging, outPath)
      }
      if (renamed) {
        val published = new Path(outPath, MarkerFile)
        won = fs.exists(published) && {
          val in = fs.open(published)
          val txt =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          txt == token
        }
        if (!won) {
          val leaked = new Path(outPath, staging.getName)
          if (fs.exists(leaked)) fs.delete(leaked, true)
        }
      } else if (!fs.exists(new Path(outPath, MarkerFile))) {
        keepStaging = true
      }
      won
    } finally {
      if (!won && !keepStaging) fs.delete(staging, true)
    }
  }
}
