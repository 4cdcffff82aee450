package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata
  * (/root/repo/TESTDATA.md): TPC-H-ish star schema + `events` stream table +
  * `documents`/`embeddings` for the LLM-pipeline operators.
  *
  * All reads go through `spark.read.parquet` so Catalyst's column pruning and
  * predicate pushdown reach the scan (check `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark 4
    // rejects unless read as a nanos long) and TIMESTAMP(MICROS) (read
    // natively as TIMESTAMP_NTZ) across testdata generations. Normalize both
    // to session-tz TimestampType: the session is pinned to UTC
    // (Sessions.scala), so the NTZ→LTZ cast is value-identical, and the
    // nanos-long path uses integer division (a double-valued `/ 1000` would
    // lose precision: epoch-nanos ≈ 1.7e18 > 2^53).
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events") {
      df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType    => df
        case other => throw new IllegalStateException(
          s"events.ts arrived as unsupported type $other; expected nanos long or timestamp")
      }
    } else df
  }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
