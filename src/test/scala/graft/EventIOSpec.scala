package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._
import graft.streaming.RsvpApp

/** The pluggable source/sink layer (VERDICT #6): the reference's pipelines
  * run through the [[EventSource]]/[[EventSink]] traits in both batch and
  * streaming mode, and the Kafka implementations are jar-gated with a clear
  * error instead of a raw ClassNotFoundException.
  */
class EventIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.engine.Sessions
    .builder("graft-eventio-test").master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  import RsvpFixtures.rsvp

  /** Write (value, timestamp) envelope rows as a json-lines dir. */
  private def envelopeDir(rows: Seq[(String, String)]): String = {
    val dir = Files.createTempDirectory("graft-envelope").toString
    val sp = spark
    import sp.implicits._
    rows.toDF("value", "timestamp").coalesce(1).write.mode("overwrite").json(dir)
    dir
  }

  private val rows = Seq(
    rsvp("us", "OR", "Bend", 1) -> "2021-06-06 12:00:01",
    rsvp("gb", "", "London", 2) -> "2021-06-06 12:00:02",
    rsvp("us", "XX", "Nowhere", 3) -> "2021-06-06 12:00:03")

  test("Q2 batch through FileEventSource emits the golden payload") {
    val source = FileEventSource(envelopeDir(rows))
    val out = RsvpApp.q2Batch(spark, source).collect().map(_.getString(0))
    assert(out.toSeq == Seq(RsvpFixtures.q2GoldenBend))
  }

  test("Q2 streaming through the same source/sink pair matches batch") {
    val source = FileEventSource(envelopeDir(rows))
    val sink = MemoryEventSink("eventio_q2_out")
    val q = RsvpApp.q2Stream(spark, source, sink)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("eventio_q2_out").collect().map(_.getString(0))
    assert(streamed.toSeq == Seq(RsvpFixtures.q2GoldenBend))
  }

  test("Q1 streaming through ParquetEventSink is checkpointed and exactly-once") {
    val source = FileEventSource(envelopeDir(rows))
    val out = Files.createTempDirectory("graft-eventio-out").toString
    val ckpt = Files.createTempDirectory("graft-eventio-ckpt").toString
    val sink = ParquetEventSink(out, ckpt)
    def runOnce(): Unit = {
      val q = RsvpApp.q1Stream(spark, source, sink)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    runOnce() // restart from checkpoint: no new input → no duplicate rows
    assert(spark.read.parquet(out).count() == 2) // the two US rows
  }

  test("FileEventSink streams checkpointed orc/csv/json output (batch readers' mirror)") {
    // the flat (value, timestamp) envelope exercises each sink format
    // uniformly (csv cannot carry Q1's venue struct — Spark's own
    // constraint, not the sink's)
    for (fmt <- Seq("orc", "csv", "json")) {
      val source = FileEventSource(envelopeDir(rows))
      val out = Files.createTempDirectory(s"graft-sink-$fmt").toString
      val ckpt = Files.createTempDirectory(s"graft-sink-$fmt-ckpt").toString
      def runOnce(): Unit = {
        val q = FileEventSink(out, ckpt, fmt)
          .writeStream(source.readStream(spark))
        try q.processAllAvailable() finally q.stop()
      }
      // the reader must be REBUILT after each run — a DataFrame resolves
      // its file listing at creation, so a stale one could not observe
      // files a duplicating restart writes
      def back() = fmt match {
        case "csv" => spark.read.csv(out)
        case f => spark.read.format(f).load(out)
      }
      runOnce()
      assert(back().count() == rows.size, s"$fmt sink lost rows")
      // restart from checkpoint with no new input: exactly-once, no dupes
      runOnce()
      assert(back().count() == rows.size, s"$fmt sink duplicated rows on restart")
    }
  }

  test("FileEventSink text format round-trips the Q2 wire payload") {
    val source = FileEventSource(envelopeDir(rows))
    val out = Files.createTempDirectory("graft-sink-text").toString
    val ckpt = Files.createTempDirectory("graft-sink-text-ckpt").toString
    val q = RsvpApp.q2Stream(spark, source, FileEventSink(out, ckpt, "text"))
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.text(out).collect().map(_.getString(0))
    assert(back.toSeq == Seq(RsvpFixtures.q2GoldenBend))
  }

  test("Kafka source and sink are jar-gated with a clear error") {
    assert(!KafkaSupport.available, "this environment ships no kafka connector")
    val src = KafkaEventSource("localhost:9092", "all_events") // constructing is free
    val e = intercept[IllegalStateException](src.readStream(spark))
    assert(e.getMessage.contains("spark-sql-kafka"))
    val snk = KafkaEventSink("localhost:9092", "us_meetups", "/tmp/ckpt")
    val e2 = intercept[IllegalStateException](
      snk.writeStream(spark.range(1).selectExpr("CAST(id AS STRING) AS value")))
    assert(e2.getMessage.contains("spark-sql-kafka"))
  }

  test("foreachBatch sink shares write logic between batch and streaming") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val sink = ForeachBatchEventSink((df, epoch) => seen.add(epoch -> df.count()))
    sink.write(RsvpApp.q1Batch(spark, FileEventSource(envelopeDir(rows))))
    assert(seen.poll() == (-1L, 2L)) // batch mode: epoch -1, two US rows
    val q = RsvpApp.q1Stream(spark, FileEventSource(envelopeDir(rows)), sink)
    try q.processAllAvailable() finally q.stop()
    val streamed = seen.toArray(Array.empty[(Long, Long)])
    assert(streamed.map(_._2).sum == 2L) // same rows through the same fn
    assert(streamed.forall(_._1 >= 0L)) // real epoch ids in streaming mode
  }

  test("console sink (S6 debug path) runs in both modes") {
    val source = FileEventSource(envelopeDir(rows))
    val sink = ConsoleEventSink(numRows = 5)
    sink.write(RsvpApp.q1Batch(spark, source).select("rsvp_id"))
    val q = RsvpApp.q1Stream(spark, source, sink)
    try q.processAllAvailable() finally q.stop()
  }
}
