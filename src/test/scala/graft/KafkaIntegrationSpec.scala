package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{KafkaEventSink, KafkaEventSource, KafkaSupport, MemoryEventSink}
import graft.streaming.RsvpApp

/** Kafka integration check for the reference topology (S1/S4/S5), gated on
  * BOTH the connector jar ([[KafkaSupport.available]]) and a reachable
  * broker (`GRAFT_KAFKA_BOOTSTRAP`, e.g. `localhost:9092`). In this repo's
  * connector-less environment every test cancels with a clear reason; on a
  * cluster that has the jar it exercises the exact `format("kafka")` code
  * paths the goldens cover via File/MemoryStream:
  *
  * {{{
  * # cluster invocation (see ROUND3.md):
  * GRAFT_KAFKA_BOOTSTRAP=broker:9092 sbt "testOnly graft.KafkaIntegrationSpec"
  * }}}
  *
  * Topology under test = the reference's (srapk_structure_streaming.py:12-16,
  * 173-187): produce RSVP JSON to `all_events`, Q1/Q2/Q3 consume it as a
  * stream; Q2's output lands on a `us_meetups`-shaped topic and is read
  * back for the golden wire-format assertion.
  */
class KafkaIntegrationSpec extends AnyFunSuite {

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")

  private def gate(): Unit = {
    assume(KafkaSupport.available,
      "spark-sql-kafka connector jar not on classpath — skipping")
    assume(bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — skipping")
  }

  // unique per-JVM suffix so reruns against a shared broker don't collide
  private val run = java.util.UUID.randomUUID().toString.take(8)
  private def topic(name: String) = s"graft_${name}_$run"

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-kafka-it").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Batch-produce the fixture RSVPs to the input topic via the Kafka
    * batch sink (S7's engine-side analog), keyed only by `value` exactly
    * like the reference producer (read_stream.py:24).
    */
  private def produceFixtures(inTopic: String): Unit = {
    import spark.implicits._
    val rows = Seq(
      RsvpFixtures.rsvp("us", "OR", "Bend", 1L),
      RsvpFixtures.rsvp("us", "CA", "Fresno", 2L),
      RsvpFixtures.rsvp("de", "BY", "Munich", 3L))
    KafkaEventSink(bootstrap.get, inTopic, tmp("ckpt-produce"))
      .write(rows.toDF("value"))
  }

  test("Q1 filters US rows end-to-end through real topics") {
    gate()
    val in = topic("all_events")
    produceFixtures(in)
    val source = KafkaEventSource(bootstrap.get, in, startingOffsets = "earliest")
    val q = RsvpApp.q1Stream(spark, source, MemoryEventSink("kafka_q1"))
    try { q.processAllAvailable() } finally { q.stop() }
    val countries = spark.table("kafka_q1")
      .select("group.group_country").collect().map(_.getString(0))
    assert(countries.nonEmpty && countries.forall(_ == "us"))
  }

  test("Q2 writes the golden wire format to a us_meetups topic") {
    gate()
    val in = topic("all_events_q2")
    val out = topic("us_meetups")
    produceFixtures(in)
    val source = KafkaEventSource(bootstrap.get, in, startingOffsets = "earliest")
    val sink = KafkaEventSink(bootstrap.get, out, tmp("ckpt-q2"))
    val q = RsvpApp.q2Stream(spark, source, sink)
    try { q.processAllAvailable() } finally { q.stop() }
    // read the OUTPUT topic back (batch, earliest) — S4 round-trip
    val values = KafkaEventSource(bootstrap.get, out).read(spark)
      .select("value").collect().map(_.getString(0)).toSet
    assert(values.contains(RsvpFixtures.q2GoldenBend),
      s"golden Q2 payload missing from $out: $values")
  }

  test("Q3 windowed city sets survive a checkpointed restart") {
    gate()
    val in = topic("all_events_q3")
    produceFixtures(in)
    val source = KafkaEventSource(bootstrap.get, in, startingOffsets = "earliest")
    val ckpt = tmp("ckpt-q3")
    val outDir = tmp("out-q3")
    val sink = graft.sources.ParquetEventSink(outDir, ckpt)
    // first run: consume everything, then stop (checkpoint holds offsets)
    val q1 = RsvpApp.q3Stream(spark, source,
      new graft.sources.EventSink {
        def write(df: org.apache.spark.sql.DataFrame): Unit = sink.write(df)
        def writeStream(df: org.apache.spark.sql.DataFrame) =
          df.select(to_json(struct(col("*"))).as("value"))
            .writeStream.format("parquet")
            .option("path", outDir).option("checkpointLocation", ckpt)
            .outputMode("append").start()
      })
    try { q1.processAllAvailable() } finally { q1.stop() }
    // restart from the same checkpoint: no duplicate emission (exactly-once)
    val q2 = RsvpApp.q3Stream(spark, source,
      new graft.sources.EventSink {
        def write(df: org.apache.spark.sql.DataFrame): Unit = sink.write(df)
        def writeStream(df: org.apache.spark.sql.DataFrame) =
          df.select(to_json(struct(col("*"))).as("value"))
            .writeStream.format("parquet")
            .option("path", outDir).option("checkpointLocation", ckpt)
            .outputMode("append").start()
      })
    try { q2.processAllAvailable() } finally { q2.stop() }
    val n = spark.read.parquet(outDir).count()
    val dedup = spark.read.parquet(outDir).distinct().count()
    assert(n == dedup, s"restart duplicated rows: $n total vs $dedup distinct")
  }
}
