package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Pluggable source/sink layer (SURVEY.md §7; the reference's Kafka
  * topology at srapk_structure_streaming.py:12-16, 181-187).
  *
  * Every source yields the reference's post-Kafka envelope — two string
  * columns `(value, timestamp)` (its `selectExpr("CAST(value as STRING)",
  * "CAST(timestamp AS STRING)")` narrowing, srapk:16) — in BOTH batch and
  * streaming mode, so a pipeline written as a pure `DataFrame => DataFrame`
  * (graft.streaming.Rsvp) runs unchanged against envelope files, an
  * in-memory stream, or a real Kafka topic.
  *
  * The Kafka implementations compile here but are JAR-GATED at call time:
  * this environment ships no spark-sql-kafka connector, so nothing on the
  * default path calls `format("kafka")`; on a cluster with the connector
  * jar the same code runs as-is ([[KafkaSupport.available]] flips to true).
  */
object EventEnvelope {
  /** The (value, timestamp) contract every [[EventSource]] produces. */
  val schema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("timestamp", StringType)))
}

/** A source of the (value, timestamp) envelope, batch and streaming. */
trait EventSource {
  def read(spark: SparkSession): DataFrame
  def readStream(spark: SparkSession): DataFrame
}

/** A sink for a query's output frame, batch and streaming (append mode —
  * the reference's output mode for both committed sinks, srapk:181-187).
  */
trait EventSink {
  def write(df: DataFrame): Unit
  def writeStream(df: DataFrame): StreamingQuery
}

/** Envelope files (default json-lines: one `{"value":…,"timestamp":…}`
  * object per line). The streaming side is Spark's file source — at scale
  * it discovers new files per micro-batch, the closest jar-free analog of
  * a Kafka topic's append semantics.
  */
final case class FileEventSource(path: String, format: String = "json") extends EventSource {
  def read(spark: SparkSession): DataFrame =
    spark.read.format(format).schema(EventEnvelope.schema).load(path)
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format(format).schema(EventEnvelope.schema).load(path)
}

/** Classpath gate for the Kafka connector (not bundled with Spark core —
  * the reference pulls it via PYSPARK_SUBMIT_ARGS, srapk:10).
  */
object KafkaSupport {
  lazy val available: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: ClassNotFoundException => false }

  def requireConnector(): Unit =
    if (!available) throw new IllegalStateException(
      "Kafka source/sink requires the spark-sql-kafka-0-10 connector jar on " +
        "the classpath (reference: srapk_structure_streaming.py:10); " +
        "use FileEventSource/MemoryEventSource in connector-free environments")
}

/** Kafka topic source (reference srapk:12-16). Jar-gated: constructing it
  * is free; reading without the connector jar throws with a clear message.
  */
final case class KafkaEventSource(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "latest") extends EventSource {

  private def narrow(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING)", "CAST(timestamp AS STRING)")

  def read(spark: SparkSession): DataFrame = {
    KafkaSupport.requireConnector()
    narrow(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())
  }

  def readStream(spark: SparkSession): DataFrame = {
    KafkaSupport.requireConnector()
    narrow(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load())
  }
}

/** Checkpointed parquet sink — exactly-once file output (the T5 machinery;
  * reference checkpoint dirs at srapk:184, 191). The parquet
  * specialization of [[FileEventSink]], kept as a named type for the S4
  * reference-parity row; all behavior delegates so the two can't diverge.
  */
final case class ParquetEventSink(path: String, checkpoint: String) extends EventSink {
  private val delegate = FileEventSink(path, checkpoint, "parquet")
  def write(df: DataFrame): Unit = delegate.write(df)
  def writeStream(df: DataFrame): StreamingQuery = delegate.writeStream(df)
}

/** Format-parameterized checkpointed file sink: orc, csv, json and text
  * join parquet behind the same trait — the write-side mirror of Tables'
  * batch readers (SourcesSpec round-trips those formats as reads; this
  * closes the sink side of the symmetry). All five formats are native
  * Structured Streaming file sinks, so the streaming path gets the same
  * exactly-once checkpointed commit protocol as parquet. `text` carries
  * Spark's own constraint: a single string column per row.
  */
final case class FileEventSink(
    path: String,
    checkpoint: String,
    format: String = "parquet") extends EventSink {
  def write(df: DataFrame): Unit =
    df.write.mode("append").format(format).save(path)
  def writeStream(df: DataFrame): StreamingQuery =
    df.writeStream.format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}

/** In-memory sink: streaming `format("memory")` table; batch registers a
  * temp view of the same name (both readable as `spark.table(name)`).
  */
final case class MemoryEventSink(name: String) extends EventSink {
  def write(df: DataFrame): Unit = df.createOrReplaceTempView(name)
  def writeStream(df: DataFrame): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode("append").start()
}

/** Console sink — the reference's debug path (srapk:169-173, S6). */
final case class ConsoleEventSink(numRows: Int = 20) extends EventSink {
  def write(df: DataFrame): Unit = df.show(numRows, truncate = false)
  def writeStream(df: DataFrame): StreamingQuery =
    df.writeStream.format("console")
      .option("numRows", numRows)
      .outputMode("append")
      .start()
}

/** foreachBatch sink: runs a user function per micro-batch with the epoch
  * id — the escape hatch for destinations without a native connector
  * (idempotent upserts keyed by epoch, multi-table writes). Batch mode
  * applies the same function once with epoch −1, so the write logic is
  * shared between modes.
  */
final case class ForeachBatchEventSink(fn: (DataFrame, Long) => Unit) extends EventSink {
  def write(df: DataFrame): Unit = fn(df, -1L)
  def writeStream(df: DataFrame): StreamingQuery =
    df.writeStream.foreachBatch(fn).outputMode("append").start()
}

/** Kafka topic sink (reference srapk:181-193: checkpointed, value-column
  * payload). Jar-gated like [[KafkaEventSource]].
  */
final case class KafkaEventSink(
    bootstrapServers: String,
    topic: String,
    checkpoint: String) extends EventSink {

  def write(df: DataFrame): Unit = {
    KafkaSupport.requireConnector()
    df.write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .save()
  }

  def writeStream(df: DataFrame): StreamingQuery = {
    KafkaSupport.requireConnector()
    df.writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
  }
}
