package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch/streaming-agnostic transforms mirroring the reference's three
  * queries (`/root/reference/srapk_structure_streaming.py`), re-targeted at
  * the driver's `events` table (event_id, ts, user_id, event_type, value,
  * props). Each is a pure `DataFrame => DataFrame`, so the same plan runs
  * under `spark.read` (batch, oracle-checked) and `spark.readStream`
  * (MemoryStream golden tests) — exactly how the reference's plans sit above
  * the Kafka source narrowing.
  *
  * Reference mapping:
  *  - [[filterByType]]  ↔ Q1 `where("group.group_country = \"us\"")`
  *    (srapk_structure_streaming.py:64)
  *  - [[joinTypeLookup]] ↔ Q2 stream–static broadcast join on the 56-row
  *    state lookup (srapk_structure_streaming.py:139-141)
  *  - [[windowDistinct]] ↔ Q3 watermark + 1-minute tumbling window +
  *    `collect_set` (srapk_structure_streaming.py:150-165)
  */
object EventPipelines {

  /** Static lookup playing the role of the reference's 56-row US-state
    * LocalRelation (srapk_structure_streaming.py:78-137): short code → full
    * display name. Small enough that Catalyst always broadcasts it.
    */
  val typeLookup: Seq[(String, String)] = Seq(
    "click"    -> "CLICK EVENT",
    "error"    -> "ERROR EVENT",
    "purchase" -> "PURCHASE EVENT",
    "signup"   -> "SIGNUP EVENT",
    "view"     -> "VIEW EVENT")

  /** Q1 analog: keep a single event_type (reference keeps country "us"). */
  def filterByType(events: DataFrame, eventType: String): DataFrame =
    events.where(col("event_type") === eventType)

  /** Q2 analog: project then inner-join the static lookup; the lookup's
    * display name survives, the join key is dropped from the lookup side —
    * same column-collision resolution the reference does with qualified refs.
    * The lookup side is tiny → Catalyst plans a BroadcastHashJoin (no
    * shuffle of the fact side; holds at 100 TB of `events`).
    */
  def joinTypeLookup(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val lookup = typeLookup.toDF("event_type", "type_name")
    events
      .select("event_id", "user_id", "event_type", "value")
      .join(broadcast(lookup), Seq("event_type"), "inner")
  }

  /** Q3 analog: 1-minute tumbling window, distinct set + count.
    * `sort_array` makes the `collect_set` output deterministic (SURVEY.md §7
    * "hard parts"). In streaming form, wrap the input with
    * `.withWatermark("ts", ...)` before calling (see graft.streaming).
    */
  def windowDistinct(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        sort_array(collect_set(col("event_type"))).as("types"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("types"),
        col("n"))

  /** F2 analog: `from_json` the `props` JSON payload (reference parses the
    * whole Kafka value — srapk_structure_streaming.py:59).
    */
  def parseProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))

  /** F3/F4 analog: pack columns into a struct and serialize to JSON — the
    * reference does this twice-nested for its Kafka sink value
    * (srapk_structure_streaming.py:140-143).
    */
  def toJsonPayload(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      to_json(struct(col("event_type"), col("user_id"))).as("payload"))

  /** F7 analog: datetime part extraction from the event timestamp
    * (srapk_structure_streaming.py:158-161 extracts from window.start).
    */
  def datetimeParts(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      month(col("ts")).as("month"),
      dayofmonth(col("ts")).as("day"),
      hour(col("ts")).as("hour"),
      minute(col("ts")).as("minute"))
}
