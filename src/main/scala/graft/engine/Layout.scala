package graft.engine

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout management: range-clustered rewrites for scan pruning.
  *
  * At 100 TB the cheapest scan is the one that never happens: parquet
  * footers carry per-file (and per-row-group) min/max statistics, and a
  * filtered read skips every file whose range cannot match. But the stats
  * only help if the writer CLUSTERED the data — a table written in arrival
  * order has every file spanning the whole value range of the filter
  * column, so no file is ever skippable. [[clusteredWrite]] is the layout
  * rewrite that makes time-/key-filtered scans file-prunable: one range
  * shuffle, files that tile the cluster column's value range.
  *
  * Complements [[Compaction]] (which fixes file COUNT shuffle-free but
  * keeps arrival order): compaction for sink hygiene, clustering when the
  * read pattern filters on a known column and is worth one shuffle.
  */
object Layout {

  /** Rewrite `df` into `dst` as `nFiles` parquet files tiling the value
    * range of `clusterCol`: `repartitionByRange` (one range shuffle;
    * Spark samples partition bounds) puts disjoint value ranges in
    * disjoint files, `sortWithinPartitions` additionally orders rows
    * inside each file so row-group-level min/max prune within a file
    * too. Returns the row count measured by an [[Observation]] on the
    * write job itself — the output is never re-read for verification
    * (same single-read contract as [[Compaction.compactTo]]).
    */
  def clusteredWrite(
      df: DataFrame, clusterCol: String, dst: String, nFiles: Int): Long = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val obs = Observation()
    // observe ABOVE the range exchange: repartitionByRange runs an extra
    // sampling job over the subtree below it to pick partition bounds,
    // and an observe placed below the exchange would count rows twice
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dst)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Hive-style directory-partitioned rewrite (`partitionBy`): the other
    * standard layout lever. Where [[clusteredWrite]] tiles a continuous
    * column so the READER skips row groups, partitioning a categorical /
    * date column prunes at PLANNING — the catalog listing itself skips
    * non-matching directories, visible as a smaller `numFiles` in the
    * scan (asserted by [[filesListedByScan]] in LayoutSpec). Partition
    * by low-cardinality columns only (a 100 TB table partitioned by a
    * high-cardinality key degenerates into the small-file problem
    * [[Compaction]] exists to fix). Returns the row count from an
    * [[Observation]] on the write job (single read, no re-scan).
    */
  def partitionedWrite(
      df: DataFrame, partitionCol: String, dst: String): Long = {
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(dst)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Z-order (Morton-curve) multi-column clustering — the
    * multi-dimensional generalization of [[clusteredWrite]]. Range
    * clustering on ONE column makes that column's filters file-prunable
    * but leaves every other column scattered across all files; when the
    * read pattern filters on TWO (or more) columns, the right layout
    * interleaves them: each column is affinely mapped onto a 16-bit
    * grid (driver-pulled min/max — one column-pruned aggregate, two
    * doubles per column), the grid coordinates' bits are interleaved
    * into a single Morton code, and the table is range-partitioned and
    * sorted by that code. Nearby z-values are nearby in EVERY clustered
    * dimension, so a predicate box on any subset of the columns touches
    * the few files whose z-range intersects it — a single-column filter
    * prunes to ~(selectivity^(1/k)) of the files instead of none, and a
    * combined filter prunes multiplicatively (LayoutSpec measures both
    * against a single-column-clustered control).
    *
    * The z computation is pure codegen'd long arithmetic (shift/mask
    * folds, no UDF); ties beyond the 16-bit grid resolution simply
    * share a cell, which costs locality, never correctness — the code
    * orders the WRITE, queries never see it. Same single-read
    * Observation contract as the sibling rewrites.
    */
  def zorderWrite(
      df: DataFrame, cols: Seq[String], dst: String, nFiles: Int): Long = {
    require(cols.size >= 2, "z-order needs at least two columns")
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val k = cols.size
    require(k * 16 <= 63, s"too many z-order columns (${k} × 16 bits)")
    // numeric view of a column for the grid map: timestamps (either
    // flavor) via exact micros, dates via days — a bare double cast is
    // rejected for those types
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def numeric(c: String): org.apache.spark.sql.Column = byName(c) match {
      case TimestampType | TimestampNTZType =>
        unix_micros(col(c).cast(TimestampType)).cast("double")
      case DateType => unix_date(col(c)).cast("double")
      case _ => col(c).cast("double")
    }
    val mmAggs = cols.flatMap(c => Seq(min(numeric(c)), max(numeric(c))))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    // empty input / all-null column → null aggregate; fail with a usable
    // error instead of an NPE out of getDouble
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!mm.isNullAt(2 * i) && !mm.isNullAt(2 * i + 1),
        s"zorderWrite: column '$c' has no non-null values (empty input?)")
    }
    val grid = cols.zipWithIndex.map { case (c, i) =>
      val (mn, mx) = (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
      if (mx == mn) lit(0L)
      else least(greatest(
        ((numeric(c) - lit(mn)) / lit(mx - mn)) * lit(65535.0),
        lit(0.0)), lit(65535.0)).cast("long")
    }
    // bit b of column i lands at position b*k + i
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      grid.zipWithIndex.foldLeft(acc) { case (a, (g, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(g, b).bitwiseAND(lit(1L)), b * k + i))
      }
    }
    val obs = Observation()
    df.withColumn("__graft_z", z)
      .repartitionByRange(nFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dst)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Bucketed-table rewrite (`bucketBy` + `sortBy` into the session
    * catalog) — the CO-LOCATION layout lever, completing the trio:
    * [[clusteredWrite]] prunes row groups for filtered SCANS,
    * [[partitionedWrite]] prunes directories at planning, and bucketing
    * pre-pays the JOIN shuffle at write time. Two tables bucketed on
    * their join key with the same bucket count satisfy the join's
    * hash-partitioning requirement straight off disk: the sort-merge
    * join plans with NO Exchange on either side (LayoutSpec asserts it),
    * so every subsequent join on that key moves zero rows over the
    * network. At 100 TB this is the amortization lever for fact-fact
    * joins that recur (the shuffle is the dominant cost, and bucketing
    * pays it once per WRITE instead of once per QUERY); the bucket
    * count is the write-time choice of join parallelism — size it to
    * rows-per-bucket that fit an executor, and keep it EQUAL across
    * tables that join (mismatched counts fall back to a shuffle on one
    * side).
    *
    * Returns the row count from an [[Observation]] on the write job
    * (single read, no verification re-scan — the contract shared with
    * the other two rewrites).
    */
  def bucketedWrite(
      df: DataFrame, table: String, key: String, buckets: Int): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    // self-heal orphaned warehouse dirs: with the in-memory catalog a new
    // JVM starts with an EMPTY catalog but the previous JVM's managed
    // table directory survives on disk, and saveAsTable then fails with
    // LOCATION_ALREADY_EXISTS — drop the catalog entry if present and
    // remove the orphan so the rewrite is idempotent across sessions
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Number of files the planner LISTS for a filtered scan — the
    * partition-pruning observable ([[partitionedWrite]]): directory
    * pruning happens before execution, so a partition-filtered scan of a
    * partitioned table shows numFiles = matching partitions' files only.
    * (Footer min/max skipping is reader-side and does NOT show here —
    * that is [[filesHoldingMatches]]'s job.)
    */
  def filesListedByScan(
      spark: SparkSession, dir: String, filter: String): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = spark.read.parquet(dir).where(filter).select(lit(1).as("one"))
    // execute THIS df's own QueryExecution so the metrics land on the
    // plan instance we then inspect
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collect { case s: FileSourceScanExec => s }
    require(scans.nonEmpty, "no FileSourceScan in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  /** Number of files holding any row matching `filter` — the layout
    * observable that clustering optimizes. The planner still LISTS every
    * file (footer min/max pruning is a reader-side decision, invisible in
    * the numFiles metric); what clustering changes is locality: matching
    * rows concentrate in the few files whose range covers the filter, and
    * the pushed-down predicate lets the parquet reader skip every row
    * group (i.e. all actual IO) of the rest. On an arrival-order table
    * every file holds matches and nothing is skippable.
    */
  def filesHoldingMatches(
      spark: SparkSession, dir: String, filter: String): Long =
    spark.read.parquet(dir).where(filter)
      .select(input_file_name()).distinct().count()

  /** Schema-evolution fixture: split `docs` into two parquet generations —
    * an OLD one (even doc_ids) written before `lang`/`n_chars` existed,
    * and a NEW one (odd doc_ids) with the full schema. [[evolvedRead]]
    * then reads both generations as ONE table. A 100 TB corpus is never
    * rewritten when a column is added, so every long-lived table IS a mix
    * of schema generations; the engine must widen old files with nulls
    * instead of failing or silently dropping the column.
    */
  def evolvedWrite(docs: DataFrame, v1Dir: String, v2Dir: String): Unit = {
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"), col("source"))
      .write.mode("overwrite").parquet(v1Dir)
    docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"), col("source"),
        col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(v2Dir)
  }

  /** Read mixed-schema parquet generations as one table: `mergeSchema`
    * unions the file footers' schemas at planning time and old files
    * surface the missing columns as nulls. Column pruning and predicate
    * pushdown still reach each file with ITS OWN physical schema — the
    * merge is metadata-only, no data rewrite.
    */
  def evolvedRead(spark: SparkSession, dirs: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)

  /** Build a per-file statistics MANIFEST over an already-written table:
    * one row per physical file with (file_path, min, max, n_rows) of
    * `statCol`, derived in one scan via the `_metadata.file_path` hidden
    * column. This is the lakehouse metadata layer in miniature
    * (Iceberg/Delta keep exactly this table): parquet footers already
    * carry per-file min/max, but the READER must still open every footer
    * to learn them — O(files) round-trips per query on object storage.
    * A manifest moves that knowledge into ONE table read at planning
    * time, and it works for any engine, not just footers-aware ones.
    * Returns the manifest's file count.
    */
  def buildManifest(
      spark: SparkSession, tableDir: String, statCol: String,
      manifestDir: String): Long = {
    val stats = spark.read.parquet(tableDir)
      .groupBy(col("_metadata.file_path").as("file_path"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"),
        count(lit(1)).as("n_rows"))
    stats.coalesce(1).write.mode("overwrite").parquet(manifestDir)
    spark.read.parquet(manifestDir).count()
  }

  /** Manifest-pruned range read: plan the file list from the MANIFEST
    * (files whose [min, max] intersects [lo, hi)), then read only those
    * files, with the exact predicate re-applied as the residual filter —
    * pruning is an optimization, never a semantics change. The driver
    * pull is FILE PATHS ONLY (planning-time metadata, the same thing any
    * table format's driver materializes); data never moves through the
    * driver. An empty qualifying set short-circuits to an empty frame of
    * the table's schema without touching data files.
    */
  def manifestPrunedRead(
      spark: SparkSession, tableDir: String, manifestDir: String,
      statCol: String, lo: String, hi: String): DataFrame = {
    val loTs = lit(lo).cast("timestamp")
    val hiTs = lit(hi).cast("timestamp")
    val files = spark.read.parquet(manifestDir)
      .where(col("max_v") >= loTs && col("min_v") < hiTs)
      .select(col("file_path"))
      .collect().map(_.getString(0))
    val base =
      if (files.isEmpty) spark.read.parquet(tableDir).where(lit(false))
      else spark.read.parquet(files: _*)
    base.where(col(statCol) >= loTs && col(statCol) < hiTs)
  }
}
