package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Rsvp

/** Golden streaming tests reproducing the reference's Q1/Q2/Q3 semantics
  * (filter, stream-static join, watermarked windowed collect_set in append
  * mode) through MemoryStream — the reference's Kafka topology without the
  * Kafka dependency (SURVEY.md §5 test strategy #2).
  */
class RsvpStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-stream-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import RsvpFixtures.rsvp

  private def runStream(
      rows: Seq[(String, String)],
      pipeline: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String,
      batches: Seq[Int] = Seq.empty): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val parsed = Rsvp.parse(stream.toDF().toDF("value", "timestamp"))
    val query = pipeline(parsed).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      if (batches.isEmpty) {
        stream.addData(rows)
        query.processAllAvailable()
      } else {
        var off = 0
        batches.foreach { n =>
          stream.addData(rows.slice(off, off + n))
          off += n
          query.processAllAvailable()
        }
      }
      spark.table(name).collect()
    } finally query.stop()
  }

  test("Q1 keeps only US rows (reference filter semantics)") {
    val rows = Seq(
      rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:01",
      rsvp("gb", "", "London", 2) -> "2021-06-06 12:00:02",
      rsvp("us", "CA", "Fresno", 3) -> "2021-06-06 12:00:03")
    val out = runStream(rows, Rsvp.q1UsOnly, "q1_out")
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("rsvp_id")).sorted.sameElements(Array(1L, 3L)))
  }

  test("Q1 parses corrected schema: mtime long, event.time epoch-millis") {
    val rows = Seq(rsvp("us", "OR", "Bend", 7) -> "2021-06-06 12:00:01")
    val out = runStream(rows, Rsvp.q1UsOnly, "q1_schema_out")
    val r = out.head
    assert(r.getAs[Long]("mtime") == 1622913129340L)
    val ev = r.getAs[org.apache.spark.sql.Row]("event")
    assert(ev.getAs[Long]("time") == 1624379400000L)
  }

  test("Q2 joins state lookup, keeps full name, drops unmatched codes") {
    val rows = Seq(
      rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:01",
      rsvp("us", "XX", "Nowhere", 2) -> "2021-06-06 12:00:02",
      rsvp("fr", "OR", "Paris", 3) -> "2021-06-06 12:00:03")
    val out = runStream(
      rows, df => Rsvp.q2UsMeetups(df, Rsvp.statesDf(spark)), "q2_out")
    assert(out.length == 1)
    val json = out.head.getString(0)
    assert(json.contains(""""group_state":"OREGON""""))
    assert(json.contains(""""group_city":"Bend""""))
  }

  test("Q2 emits the reference's exact wire format (golden)") {
    // srapk_structure_streaming.py:140-143: `event` is to_json'd FIRST, so
    // the outer to_json double-encodes it as a JSON string; the outer field
    // order is (event, group_city, group_country, group_id, group_state)
    // and group_name is dropped. event.time renders per the corrected
    // epoch-millis reading (SURVEY.md §0): 1624379400000 = 2021-06-22
    // 16:30:00 UTC.
    val rows = Seq(rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:01")
    val out = runStream(
      rows, df => Rsvp.q2UsMeetups(df, Rsvp.statesDf(spark)), "q2_golden_out")
    assert(out.map(_.getString(0)).toSeq == Seq(RsvpFixtures.q2GoldenBend))
  }

  test("Q3 append mode emits a window only after the watermark passes it") {
    val rows = Seq(
      rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:10",
      // non-US rows are counted too: the reference's Q3 windows the RAW
      // stream (srapk:150-151), not the US-filtered Q1
      rsvp("gb", "", "London", 2) -> "2021-06-06 12:00:15",
      rsvp("us", "CA", "Fresno", 3) -> "2021-06-06 12:00:20",
      // batch 2: event time 12:03 → watermark 12:02 → closes window 12:00
      rsvp("us", "WA", "Seattle", 4) -> "2021-06-06 12:03:00",
      // batch 3: late row for 12:00, beyond watermark → dropped
      rsvp("us", "TX", "Austin", 5) -> "2021-06-06 12:00:30")
    val out = runStream(
      rows, Rsvp.q3WindowCities, "q3_out", batches = Seq(3, 1, 1))
    assert(out.length == 1, s"expected exactly the closed 12:00 window, got ${out.mkString})")
    val json = out.head.getString(0)
    assert(!json.contains("Austin"), "late row beyond watermark must be dropped")
    // reference payload (srapk:158-167): month, day_of_the_month, hour,
    // minute, cities — window struct dropped
    assert(json ==
      """{"month":6,"day_of_the_month":6,"hour":12,"minute":0,""" +
        """"cities":["Bend","Fresno","London"]}""")
  }
}
