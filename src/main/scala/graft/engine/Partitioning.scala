package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, Distinct, GlobalLimit, Join, RepartitionOperation, Sort, Window => WindowNode}

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
    * CONTRACT (enforced): `df` must be SCAN-ONLY — a table read plus
    * map-side projections/filters/generates. The partition-count probe is
    * `df.rdd.getNumPartitions`, and under AQE converting to an RDD
    * finalizes the physical plan — on a plan containing shuffles that
    * executes query stages as a hidden job, and the probe would measure
    * the post-shuffle layout rather than the scan anyway. A frame whose
    * analyzed plan contains a shuffle-inducing node is therefore REJECTED
    * up front (fail-fast, before any job can run) instead of silently
    * probed.
    */
  def ensureParallelism(df: DataFrame, key: Column): DataFrame = {
    val offenders = df.queryExecution.analyzed.collect {
      case p @ (_: Join | _: Aggregate | _: WindowNode | _: Sort |
          _: Distinct | _: Deduplicate | _: RepartitionOperation |
          _: GlobalLimit) => p.nodeName
    }
    require(offenders.isEmpty,
      s"ensureParallelism expects a scan-only frame (scan + map-side ops); " +
        s"got shuffle-inducing nodes: ${offenders.mkString(", ")}. Probe the " +
        "scan before shuffling, or repartition explicitly.")
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }
}
