package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference streaming pipeline, re-expressed Spark-natively: the Meetup
  * RSVP schema and the three queries of
  * `/root/reference/srapk_structure_streaming.py`, each a pure
  * `DataFrame => DataFrame` that runs identically under `spark.readStream`
  * (MemoryStream / file source — no Kafka connector in this environment,
  * SURVEY.md §7) and `spark.read` (batch tests).
  *
  * The input contract mirrors the reference's Kafka narrowing
  * (srapk_structure_streaming.py:16): a DataFrame with
  * `value: string` (the RSVP JSON) and `timestamp: string` (ingest time).
  */
object Rsvp {

  /** Corrected RSVP schema (reference schema at
    * srapk_structure_streaming.py:18-57; corrections per SURVEY.md §0):
    *  - ids and `mtime` are LongType — the reference's IntegerType
    *    overflows on epoch-millis `mtime` (data_example.json:19) and
    *    `from_json` nulls the field;
    *  - `event.time` is LongType epoch-millis, converted explicitly with
    *    `timestamp_millis` — the reference's TimestampType makes Jackson
    *    read the JSON integer as epoch-*seconds*, a far-future timestamp.
    */
  val schema: StructType = StructType(Seq(
    StructField("venue", StructType(Seq(
      StructField("venue_name", StringType),
      StructField("lon", FloatType),
      StructField("lat", FloatType),
      StructField("venue_id", LongType)))),
    StructField("visibility", StringType),
    StructField("response", StringType),
    StructField("guests", IntegerType),
    StructField("member", StructType(Seq(
      StructField("member_id", LongType),
      StructField("photo", StringType),
      StructField("member_name", StringType)))),
    StructField("rsvp_id", LongType),
    StructField("mtime", LongType),
    StructField("event", StructType(Seq(
      StructField("event_name", StringType),
      StructField("event_id", StringType),
      StructField("time", LongType),
      StructField("event_url", StringType)))),
    StructField("group", StructType(Seq(
      StructField("group_topics", ArrayType(StructType(Seq(
        StructField("urlkey", StringType, nullable = false),
        StructField("topic_name", StringType, nullable = false))))),
      StructField("group_city", StringType),
      StructField("group_country", StringType),
      StructField("group_id", LongType, nullable = false),
      StructField("group_name", StringType),
      StructField("group_lon", FloatType),
      StructField("group_urlname", StringType),
      StructField("group_state", StringType),
      StructField("group_lat", FloatType))))))

  /** The 56-row US-state lookup (srapk_structure_streaming.py:78-137):
    * (full name, 2-letter code). Always broadcast by Catalyst.
    */
  val states: Seq[(String, String)] = Seq(
    ("ALABAMA", "AL"), ("ALASKA", "AK"), ("ARIZONA", "AZ"), ("ARKANSAS", "AR"),
    ("CALIFORNIA", "CA"), ("COLORADO", "CO"), ("CONNECTICUT", "CT"),
    ("DELAWARE", "DE"), ("FLORIDA", "FL"), ("GEORGIA", "GA"), ("HAWAII", "HI"),
    ("IDAHO", "ID"), ("ILLINOIS", "IL"), ("INDIANA", "IN"), ("IOWA", "IA"),
    ("KANSAS", "KS"), ("KENTUCKY", "KY"), ("LOUISIANA", "LA"), ("MAINE", "ME"),
    ("MARYLAND", "MD"), ("MASSACHUSETTS", "MA"), ("MICHIGAN", "MI"),
    ("MINNESOTA", "MN"), ("MISSISSIPPI", "MS"), ("MISSOURI", "MO"),
    ("MONTANA", "MT"), ("NEBRASKA", "NE"), ("NEVADA", "NV"),
    ("NEW HAMPSHIRE", "NH"), ("NEW JERSEY", "NJ"), ("NEW MEXICO", "NM"),
    ("NEW YORK", "NY"), ("NORTH CAROLINA", "NC"), ("NORTH DAKOTA", "ND"),
    ("OHIO", "OH"), ("OKLAHOMA", "OK"), ("OREGON", "OR"),
    ("PENNSYLVANIA", "PA"), ("RHODE ISLAND", "RI"), ("SOUTH CAROLINA", "SC"),
    ("SOUTH DAKOTA", "SD"), ("TENNESSEE", "TN"), ("TEXAS", "TX"),
    ("UTAH", "UT"), ("VERMONT", "VT"), ("VIRGINIA", "VA"),
    ("WASHINGTON", "WA"), ("WEST VIRGINIA", "WV"), ("WISCONSIN", "WI"),
    ("WYOMING", "WY"), ("DISTRICT OF COLUMBIA", "DC"), ("PUERTO RICO", "PR"),
    ("GUAM", "GU"), ("AMERICAN SAMOA", "AS"), ("VIRGIN ISLANDS", "VI"),
    ("NORTHERN MARIANA IS", "MP"))

  def statesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    states.toDF("group_state", "state_short")
  }

  /** Parse the raw (value, timestamp) envelope into the RSVP struct —
    * `from_json` + star expansion (srapk_structure_streaming.py:59-60),
    * keeping the ingest timestamp as a proper TimestampType column.
    */
  def parse(raw: DataFrame): DataFrame =
    raw.select(
      from_json(col("value"), schema).as("data"),
      to_timestamp(col("timestamp")).as("timestamp"))
      .select(col("data.*"), col("timestamp"))

  /** Q1 (srapk_structure_streaming.py:64): keep only US RSVPs. */
  def q1UsOnly(parsed: DataFrame): DataFrame =
    parsed.where(col("group.group_country") === "us")

  /** Q2 (srapk_structure_streaming.py:67-143): project the 8 nested fields
    * (q2_data, :68-77), broadcast-join the state lookup on the 2-letter
    * code, keep the full state name (the reference keeps
    * `states_df.group_state`, dropping the event-side short code), and
    * serialize the reference's exact Kafka wire format:
    *  - the event sub-payload is `to_json` of (event_id, event_name, time)
    *    FIRST (:140), so the outer `to_json` (:143) double-encodes it as a
    *    JSON *string* field — not a nested object;
    *  - the outer struct is (event, group_city, group_country, group_id,
    *    group_state) — `group_name` is projected mid-plan but absent from
    *    the final payload (the reference drops it at :143).
    */
  def q2UsMeetups(parsed: DataFrame, states: DataFrame): DataFrame = {
    val projected = q1UsOnly(parsed).select(
      col("group.group_city").as("group_city"),
      col("group.group_country").as("group_country"),
      col("group.group_id").as("group_id"),
      col("group.group_name").as("group_name"),
      col("group.group_state").as("group_state"),
      col("event.event_name").as("event_name"),
      col("event.event_id").as("event_id"),
      timestamp_millis(col("event.time")).as("time"))
    projected
      .join(broadcast(states),
        projected("group_state") === states("state_short"), "inner")
      .select(
        to_json(struct(col("event_id"), col("event_name"), col("time"))).as("event"),
        col("group_city"), col("group_country"), col("group_id"),
        col("group_name"), states("group_state"))
      .select(
        to_json(struct(
          col("event"), col("group_city"), col("group_country"),
          col("group_id"), col("group_state"))).as("value"))
  }

  /** Q3 (srapk_structure_streaming.py:150-167): 1-minute watermark +
    * tumbling window over ALL events (the reference builds q3_data from the
    * raw stream, not the US-filtered Q1 — :150-151), distinct cities per
    * window, then the reference's exact payload (:158-167): (month,
    * `day_of_the_month`, hour, minute, cities) with the window struct
    * dropped. Output mode append (reference default). `cities` is sorted
    * for determinism — the reference's collect_set order is unspecified, so
    * any fixed order is a valid instance of the same set.
    */
  def q3WindowCities(parsed: DataFrame): DataFrame =
    parsed
      .withWatermark("timestamp", "1 minute")
      .groupBy(window(col("timestamp"), "1 minute"))
      .agg(sort_array(collect_set(col("group.group_city"))).as("cities"))
      .select(
        to_json(struct(
          month(col("window.start")).as("month"),
          dayofmonth(col("window.start")).as("day_of_the_month"),
          hour(col("window.start")).as("hour"),
          minute(col("window.start")).as("minute"),
          col("cities"))).as("value"))
}
