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

  /** RSVP JSON line shaped like /root/reference/data_example.json. */
  private def rsvp(
      country: String, state: String, city: String,
      rsvpId: Long, eventTimeMs: Long = 1624379400000L): String =
    s"""{"venue":{"venue_name":"V","lon":-121.3,"lat":44.0,"venue_id":26124106},
       |"visibility":"public","response":"yes","guests":0,
       |"member":{"member_id":237162623,"photo":"p","member_name":"M"},
       |"rsvp_id":$rsvpId,"mtime":1622913129340,
       |"event":{"event_name":"E","event_id":"278643223","time":$eventTimeMs,"event_url":"u"},
       |"group":{"group_topics":[{"urlkey":"k","topic_name":"T"}],
       |"group_city":"$city","group_country":"$country","group_id":1,
       |"group_name":"G","group_lon":-121.0,"group_urlname":"g",
       |"group_state":"$state","group_lat":44.0}}""".stripMargin.replaceAll("\n", "")

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
    assert(json.contains(""""event":{"event_name":"E""""))
  }

  test("Q3 append mode emits a window only after the watermark passes it") {
    val rows = Seq(
      rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:10",
      rsvp("us", "CA", "Fresno", 2) -> "2021-06-06 12:00:20",
      // batch 2: event time 12:03 → watermark 12:02 → closes window 12:00
      rsvp("us", "WA", "Seattle", 3) -> "2021-06-06 12:03:00",
      // batch 3: late row for 12:00, beyond watermark → dropped
      rsvp("us", "TX", "Austin", 4) -> "2021-06-06 12:00:30")
    val out = runStream(
      rows, Rsvp.q3WindowCities, "q3_out", batches = Seq(2, 1, 1))
    assert(out.length == 1, s"expected exactly the closed 12:00 window, got ${out.mkString})")
    val json = out.head.getString(0)
    assert(json.contains(""""cities":["Bend","Fresno"]"""))
    assert(!json.contains("Austin"), "late row beyond watermark must be dropped")
    assert(json.contains(""""month":6""") && json.contains(""""hour":12"""))
  }
}
