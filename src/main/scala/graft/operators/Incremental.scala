package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental table maintenance — the two primitives a continuously
  * ingesting 100 TB corpus needs so that per-batch work stays
  * O(batch), never O(history):
  *
  *  - '''mergeable statistics''': each batch folds to a tiny algebraic
  *    state table (count / sum / sum-of-squares / min / max per group);
  *    states MERGE exactly (all five are commutative monoids), so the
  *    running corpus profile is `merge(state, statsOf(batch))` — the
  *    historical data is never rescanned. Derived moments (mean, std)
  *    come out of the state at read time.
  *  - '''changeset apply''' (CDC upsert/delete merge): a batch of
  *    keyed I/U/D change rows with sequence numbers folds onto a base
  *    snapshot, latest sequence per key winning.
  */
object Incremental {

  /** Per-`groupCol` algebraic state of `valueCol` over one batch. All
    * five state columns are exact integer aggregates (the value column
    * is integral), so merge order can never drift a bit.
    */
  def statsPartial(
      batch: DataFrame,
      groupCol: String = "source",
      valueCol: String = "n_chars"): DataFrame =
    batch.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valueCol)).as("val_sum"),
      sum(col(valueCol) * col(valueCol)).as("val_sumsq"),
      min(col(valueCol)).as("val_min"),
      max(col(valueCol)).as("val_max"))

  /** Merge two state tables: group-wise sum/sum/sum/min/max. The merge
    * is associative and commutative, so any fold order over any batch
    * split yields the identical state — the property IncrementalSpec
    * asserts and the oracle exploits (it computes the whole-table state
    * directly).
    */
  def mergeStats(a: DataFrame, b: DataFrame): DataFrame =
    mergeAllStats(a.unionByName(b))

  /** Merge a whole pile of state rows (any number of batches' partials
    * stacked in one frame — e.g. a `batch_id`-partitioned state table
    * read back) into one state row per group.
    */
  def mergeAllStats(states: DataFrame): DataFrame = {
    val groupCol = states.columns.head
    states.groupBy(col(groupCol)).agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("val_sum")).as("val_sum"),
      sum(col("val_sumsq")).as("val_sumsq"),
      min(col("val_min")).as("val_min"),
      max(col("val_max")).as("val_max"))
  }

  /** Derive the read-time moments from a state table. Mean and
    * population std compute from the exact integer state with a fixed
    * IEEE formula (sumsq/n − mean², both divisions explicit), rounded
    * to 6 decimals through [[graft.functions.OracleRound]] — Spark's
    * own `round()` rounds the shortest-decimal representation while
    * DuckDB rounds the exact binary value (OracleRound scaladoc records
    * a real divergence), so only the shared floor-spelling hash-matches
    * cross-engine.
    */
  def finalizeStats(state: DataFrame): DataFrame = {
    val groupCol = state.columns.head
    val mean = col("val_sum").cast("double") / col("n_rows")
    val variance = col("val_sumsq").cast("double") / col("n_rows") - mean * mean
    state.select(col(groupCol), col("n_rows"), col("val_sum"),
      col("val_min"), col("val_max"),
      graft.functions.OracleRound.roundN(mean, 6).as("val_mean"),
      graft.functions.OracleRound.roundN(
        sqrt(greatest(variance, lit(0.0))), 6).as("val_std"))
      .orderBy(groupCol)
  }

  /** Apply a CDC changeset onto a base snapshot. `changes` carries the
    * base schema plus `opCol` ∈ {I, U, D} and a monotonically increasing
    * `seqCol`; per key the HIGHEST sequence wins. Keys whose winning op
    * is D disappear; I/U rows replace (or insert) the full payload;
    * untouched base rows pass through.
    *
    * Contract: (key, seq) pairs must be unique — the winner is picked by
    * `row_number` over seq descending, so a tied seq would make the
    * result depend on partition order. Any non-D op is treated as an
    * upsert (I and U are synonyms here, kept distinct for changelog
    * readability); there is no op validation pass — a misspelled op
    * upserts rather than failing, which is the standard CDC-merge
    * posture (validation belongs to [[Quality.checkConstraints]] on the
    * changelog).
    *
    * Scale shape: the changeset first reduces to one winner per key
    * through a key-PARTITIONED window (parallel in the key count, never
    * a global sort), then full-outer-joins the base on the key — one
    * shuffle of each side, co-located free if base and changelog are
    * bucketed by key (the deployment shape). The changeset is typically
    * ≪ base, so AQE plans its side as the small one.
    */
  def applyChangeset(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn", seqCol)
    val b = base.alias("b")
    val c = latest.alias("c")
    b.join(c, col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
      .where(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
      .select(
        coalesce(col(s"b.$keyCol"), col(s"c.$keyCol")).as(keyCol) +:
          payload.map(p =>
            when(col(s"c.$opCol").isNotNull, col(s"c.$p"))
              .otherwise(col(s"b.$p")).as(p)): _*)
  }
}
