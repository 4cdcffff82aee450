package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{EventSink, EventSource}

/** The reference's main program (srapk_structure_streaming.py:12-16,
  * 169-193) re-expressed over the pluggable [[graft.sources.EventSource]] /
  * [[graft.sources.EventSink]] layer: each query is source → Rsvp transform
  * → sink, runnable in batch (tests, backfills) and streaming (production)
  * off the SAME transform. On a real cluster, pass `KafkaEventSource(hosts,
  * "all_events")` and `KafkaEventSink(hosts, topic, ckpt)` and this is the
  * reference topology verbatim; here the file/memory implementations cover
  * the identical code path without the connector jar.
  */
object RsvpApp {

  private def parsed(spark: SparkSession, source: EventSource): DataFrame =
    Rsvp.parse(source.read(spark))

  private def parsedStream(spark: SparkSession, source: EventSource): DataFrame =
    Rsvp.parse(source.readStream(spark))

  // ── Q1: US-only filter (srapk:64) ────────────────────────────────────
  def q1Batch(spark: SparkSession, source: EventSource): DataFrame =
    Rsvp.q1UsOnly(parsed(spark, source))

  def q1Stream(spark: SparkSession, source: EventSource, sink: EventSink): StreamingQuery =
    sink.writeStream(Rsvp.q1UsOnly(parsedStream(spark, source)))

  // ── Q2: US meetups → topic us_meetups (srapk:67-143, 176-182) ────────
  def q2Batch(spark: SparkSession, source: EventSource): DataFrame =
    Rsvp.q2UsMeetups(parsed(spark, source), Rsvp.statesDf(spark))

  def q2Stream(spark: SparkSession, source: EventSource, sink: EventSink): StreamingQuery =
    sink.writeStream(Rsvp.q2UsMeetups(parsedStream(spark, source), Rsvp.statesDf(spark)))

  // ── Q3: per-minute city sets → topic window_1_minute (srapk:150-193) ─
  def q3Batch(spark: SparkSession, source: EventSource): DataFrame =
    Rsvp.q3WindowCities(parsed(spark, source))

  def q3Stream(spark: SparkSession, source: EventSource, sink: EventSink): StreamingQuery =
    sink.writeStream(Rsvp.q3WindowCities(parsedStream(spark, source)))
}
