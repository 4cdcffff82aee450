package graft.engine

import org.apache.spark.sql.{Column, DataFrame}

/** Partition-layout guards.
  *
  * At production scale a parquet dataset has many files/row-groups and the
  * scan parallelizes by split; CPU-heavy map work (shingling, hashing,
  * vector kernels) then runs wide for free. A single-file, single-row-group
  * table — like the local testdata — planners read as ONE partition, which
  * serializes every downstream map stage onto one core. These helpers make
  * that degenerate case explicit instead of letting it silently serialize.
  */
object Partitioning {

  /** Hash-repartition `df` on `key` up to the session's default parallelism
    * iff the planned scan has fewer partitions than that. When the source
    * already parallelizes — the normal case at scale — this is a no-op, so
    * wide inputs never pay an extra shuffle.
    *
    * CONTRACT: pass a SCAN-ONLY frame (a table read plus map-side
    * projections), which is how every call site uses it. The probe is
    * `df.rdd.getNumPartitions`, and under AQE converting to an RDD
    * finalizes the physical plan — for a plan containing shuffles that can
    * execute query stages as a hidden job, and the probe would measure the
    * post-shuffle layout rather than the scan anyway.
    */
  def ensureParallelism(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
