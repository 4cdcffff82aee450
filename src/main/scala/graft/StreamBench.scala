package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Rsvp

/** Streaming throughput/latency bench for the three reference pipelines.
  *
  * The only performance number the reference publishes IS streaming
  * (BASELINE.md: ≈1.4 events/s source-limited, ≈8.1 s/batch, derived
  * from its committed checkpoint offsets), yet `graft.Bench` is
  * batch-only — this main records the engine's own streaming numbers so
  * the one reference-supported comparison exists as an artifact.
  *
  * Method: a `rate` source (in-memory, no I/O, rows/s pinned by config)
  * is mapped to the reference's Kafka envelope — a full RSVP JSON
  * payload built with codegen'd `to_json`, so every pipeline pays the
  * real `from_json` parse cost it would pay off Kafka — then each of
  * Q1/Q2/Q3 runs to a `noop` sink at stepped target rates for a fixed
  * wall window. Per (pipeline, rate): total input rows, the median
  * per-batch `processedRowsPerSecond`, and median/max
  * `triggerExecution` latency over the measured batches (batch 0 is
  * warmup and excluded). A sustained `processed_rps` well above the
  * target at the top step means the engine is source-limited, not
  * engine-limited — the reference's own regime, at its ~6 orders of
  * magnitude lower rate.
  *
  * The batch bench's box-calibration probe runs alongside and lands in
  * the JSON, so streaming recordings normalize across boxes the same
  * way batch ones do.
  *
  * Output: ONE JSON line on stdout (and to the artifact path given as
  * arg 0, default BENCH_streaming.json).
  */
object StreamBench {

  /** Rate rows → the reference's (value: json-string, timestamp) Kafka
    * envelope. Deterministic in the rate `value`: ~70% US events, state
    * codes cycling through the full lookup, epoch-millis event times —
    * enough variety to exercise Q1's filter selectivity, Q2's state
    * join, and Q3's per-window city sets.
    */
  def envelope(rate: DataFrame): DataFrame = {
    val codes = array(Rsvp.states.map(s => lit(s._2)): _*)
    val cities = array(Seq("phoenix", "denver", "austin", "boston",
      "seattle", "miami", "omaha", "portland").map(lit): _*)
    val v = col("value")
    rate.select(
      to_json(struct(
        struct(
          concat(lit("venue_"), v % 97).as("venue_name"),
          (v % 360 - 180).cast("float").as("lon"),
          (v % 180 - 90).cast("float").as("lat"),
          (v % 1000).as("venue_id")).as("venue"),
        lit("public").as("visibility"),
        when(v % 5 === 0, "no").otherwise("yes").as("response"),
        (v % 4).cast("int").as("guests"),
        struct(
          (v % 100000).as("member_id"),
          concat(lit("http://photo/"), v % 1000).as("photo"),
          concat(lit("member_"), v % 9973).as("member_name")).as("member"),
        v.as("rsvp_id"),
        (unix_millis(col("timestamp")) - v % 1000L).as("mtime"),
        struct(
          concat(lit("event_"), v % 4999).as("event_name"),
          conv(v.cast("string"), 10, 16).as("event_id"),
          (unix_millis(col("timestamp")) + 86400000L).as("time"),
          concat(lit("http://event/"), v % 4999).as("event_url")).as("event"),
        struct(
          array(struct(lit("tech").as("urlkey"), lit("Tech").as("topic_name")))
            .as("group_topics"),
          element_at(cities, (v % 8 + 1).cast("int")).as("group_city"),
          when(v % 10 < 7, "us").otherwise("gb").as("group_country"),
          (v % 50021).as("group_id"),
          concat(lit("group_"), v % 50021).as("group_name"),
          (v % 360 - 180).cast("float").as("group_lon"),
          concat(lit("g"), v % 50021).as("group_urlname"),
          element_at(codes, (v % 56 + 1).cast("int")).as("group_state"),
          (v % 180 - 90).cast("float").as("group_lat")).as("group"))).as("value"),
      col("timestamp").cast("string").as("timestamp"))
  }

  final case class RateStats(target: Long, inputRows: Long, batches: Int,
      processedRpsMedian: Double, batchMsMedian: Double, batchMsMax: Double)

  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0 else xs.sorted.apply(xs.size / 2)

  /** Run one pipeline at one target rate for `windowSec` of wall time and
    * fold its progress events (excluding batch 0 — plan/codegen warmup).
    */
  def runOne(spark: SparkSession, name: String,
      pipeline: DataFrame => DataFrame,
      rowsPerSecond: Long, windowSec: Int): RateStats = {
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft-sbench-$name-$rowsPerSecond").toString
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .option("numPartitions", graft.engine.Sessions.cpus)
      .load()
    val q = pipeline(envelope(rate)).writeStream
      .format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0L))
      .start()
    try {
      Thread.sleep(windowSec * 1000L)
      val ps = q.recentProgress.toSeq.filter(_.batchId > 0)
        .filter(_.numInputRows > 0)
      def trigMs(p: org.apache.spark.sql.streaming.StreamingQueryProgress) =
        Option(p.durationMs.get("triggerExecution"))
          .map(_.doubleValue).getOrElse(0.0)
      RateStats(
        target = rowsPerSecond,
        inputRows = ps.map(_.numInputRows).sum,
        batches = ps.size,
        processedRpsMedian = median(ps.map(_.processedRowsPerSecond)),
        batchMsMedian = median(ps.map(trigMs)),
        batchMsMax = ps.map(trigMs).foldLeft(0.0)(math.max))
    } finally {
      q.stop()
      deleteRecursively(new java.io.File(ckpt))
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def main(args: Array[String]): Unit = {
    val outPath = args.headOption.getOrElse("BENCH_streaming.json")
    val spark = graft.engine.Sessions.get("graft-stream-bench")
    val states = Rsvp.statesDf(spark)
    val pipelines: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("q1_us_only", raw => Rsvp.q1UsOnly(Rsvp.parse(raw))),
      ("q2_us_meetups", raw => Rsvp.q2UsMeetups(Rsvp.parse(raw), states)),
      ("q3_window_cities", raw => Rsvp.q3WindowCities(Rsvp.parse(raw))))
    val rates = sys.env.get("SPARK_GRAFT_STREAM_RATES")
      .map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(10000L, 100000L, 500000L))
    val windowSec = sys.env.get("SPARK_GRAFT_STREAM_WINDOW_SEC")
      .map(_.toInt).getOrElse(20)
    val (beforeSamples, probeBefore) = Bench.probe(spark, 3)
    val results = pipelines.map { case (name, p) =>
      val stats = rates.map(r => runOne(spark, name, p, r, windowSec))
      name -> stats
    }
    val (afterSamples, probeAfter) = Bench.probe(spark, 3)
    // the normalization contract (BASELINE.md) divides by the recording's
    // probe MEDIAN over all samples — emit it, not just the brackets
    val probeMedian = median(beforeSamples ++ afterSamples)
    val pipelinesJson = results.map { case (name, stats) =>
      val rs = stats.map { s =>
        s"""{"target_rps":${s.target},"input_rows":${s.inputRows},""" +
          s""""batches":${s.batches},"processed_rps_median":${s.processedRpsMedian},""" +
          s""""batch_ms_median":${s.batchMsMedian},"batch_ms_max":${s.batchMsMax}}"""
      }.mkString("[", ",", "]")
      s""""$name":$rs"""
    }.mkString("{", ",", "}")
    // headline = median processed rows/s of the top sustained rate step
    // across pipelines (the engine's per-pipeline streaming ceiling here)
    val headline = median(results.map(_._2.last.processedRpsMedian))
    val json =
      s"""{"metric":"stream_processed_rps_median","value":$headline,""" +
        s""""unit":"rows/sec","window_sec":$windowSec,""" +
        s""""probe":{"before":$probeBefore,"after":$probeAfter,""" +
        s""""median":$probeMedian,"unit":"sec",""" +
        s""""workload":"v2:range(10M)>xxhash64>orderBy(live)>bit_xor"},""" +
        s""""pipelines":$pipelinesJson,""" +
        s""""reference":{"events_per_sec":1.4,"batch_sec":8.1,""" +
        s""""source":"BASELINE.md (checkpoint offsets 0-12)"}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
