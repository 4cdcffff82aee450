package graft

import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for scale smokes: replicate
  * `documents` and `embeddings` `factor`× so the heavy-profile
  * operators can be timed at 10× data and their scaling exponents
  * recorded (BASELINE.md round-7 table; the 100× claims are otherwise
  * plan-audited but empirically unverified beyond sf0.1).
  *
  * Replication is built so COST scales the way a real 10× corpus would:
  *  - replica k of a document gets every token prefixed with a
  *    replica-unique salt, so replicas share no shingles ACROSS replica
  *    groups (near-dup pairs replicate linearly with the corpus — naive
  *    duplication would instead put every doc in a factor-sized dup
  *    cluster and grow candidate pairs quadratically, an adversarial
  *    rather than representative scale-up) while each group keeps
  *    sf-identical internal structure; replica 0 is the original corpus
  *    byte-for-byte;
  *  - embeddings get a deterministic per-replica component perturbation
  *    (cosine-spread, then served through the operators' own
  *    normalization), so vector density grows 10× without creating
  *    factor-sized exact-dup stacks at every point.
  *
  * Usage: ScaleUp <sfDir> <outDir> [factor=10]. Timing-only fixture —
  * CORRECTNESS stays anchored to the driver's own testdata + DuckDB
  * oracle; nothing here feeds an oracle query.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <sfDir> <outDir> [factor]")
    val (sfDir, outDir) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.engine.Sessions.get("graft-scaleup")
    val k = col("__k")

    val docs = graft.engine.Tables.documents(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .select(
        (col("doc_id") * factor + k).as("doc_id"),
        when(k === 0, col("text")).otherwise(concat_ws(" ",
          transform(split(col("text"), " "),
            t => concat(lit("r"), k, lit("q"), t)))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    val emb = graft.engine.Tables.embeddings(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .select(
        (col("vec_id") * factor + k).as("vec_id"),
        transform(col("embedding"),
          (x, j) => (x + k.cast("double") * cos(j.cast("double") * 1.7) * 0.003)
            .cast("float")).as("embedding"),
        col("label"))
    emb.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    // orders + lineitem for the graph-operator smokes: replica k shifts
    // EVERY key space (order, customer, supplier, part) into a disjoint
    // block, so each replica group keeps sf-identical graph structure and
    // the trade/co-purchase graphs grow 10× in nodes, edges, AND
    // triangles — linear, the way a real 10× business would, instead of
    // densifying one graph (which would grow wedges quadratically and
    // make every ratio read as a false regression)
    val orders = graft.engine.Tables.orders(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .withColumn("o_orderkey", col("o_orderkey") * factor + k)
      .withColumn("o_custkey", col("o_custkey") * factor + k)
      .drop("__k")
    orders.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/orders.parquet")

    val li = graft.engine.Tables.lineitem(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .withColumn("l_orderkey", col("l_orderkey") * factor + k)
      .withColumn("l_suppkey", col("l_suppkey") * factor + k)
      .withColumn("l_partkey", col("l_partkey") * factor + k)
      .drop("__k")
    li.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/lineitem.parquet")

    // customer for the BFS-reach smoke: the SAME custkey shift as orders
    // (the trade graph's 'c:' node ids must line up across tables), and
    // nationkey untouched — the reach cohort replicates linearly with
    // the graph instead of staying one fixed-size island
    val cust = graft.engine.Tables.customer(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .withColumn("c_custkey", col("c_custkey") * factor + k)
      .drop("__k")
    cust.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/customer.parquet")

    // events for the behavioral/HLL/as-of smokes: replica k shifts the
    // user and event-id key spaces into disjoint blocks — user counts,
    // funnels, transitions, and per-day distinct users all grow linearly
    // (shifting only event_id would instead give every user 10× history,
    // which changes per-user window depth rather than corpus breadth)
    val ev = graft.engine.Tables.events(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .withColumn("event_id", col("event_id") * factor + k)
      .withColumn("user_id", col("user_id") * factor + k)
      .drop("__k")
    ev.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")

    println(s"[scaleup] wrote ${factor}x documents+embeddings+orders+lineitem+customer+events to $outDir")
    spark.stop()
  }
}
