package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed per-partition in batches
  * — the Spark-side shape (schema, partitioning, batch iteration, typed
  * boundaries) is real and tested; the actual media decode is a
  * deterministic STUB because no image/audio codec libraries exist in this
  * container (builder prompt: "STUB the decode step ... and make the
  * Spark-side plumbing real").
  *
  * Scale notes: decode is the classic CPU-heavy map-only stage — batched
  * iteration inside mapPartitions amortizes per-batch setup (a real decoder
  * would hold one codec context per batch), `repartition` upstream sizes
  * tasks to decoder throughput, and the output is columnar features, never
  * the raw bytes, so downstream stages shuffle small rows.
  */
object Multimodal {

  /** Typed input record: one media blob + envelope metadata. */
  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Typed output record: decoded features (stubbed, deterministic). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      size_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Attach a binary media column to the documents table: payload =
    * UTF-8 bytes of the text (the container has no real media files);
    * media_type assigned round-robin by doc_id. This is the envelope a
    * real pipeline would read from parquet `binary` columns.
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("payload"))

  /** Modality accounting: per (source, media_type) document counts and
    * byte mass — the storage/throughput telemetry a multimodal corpus
    * publishes per snapshot. Map stage + one tiny-domain aggregate.
    */
  def mediaStats(docs: DataFrame): DataFrame =
    attachMedia(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"), col("media_type"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("payload"))).as("total_bytes"),
        max(length(col("payload"))).cast("long").as("max_bytes"))

  /** STUB decode: deterministic integer arithmetic standing in for a codec.
    * A real implementation would replace `decodeOne` with e.g. a JNI image
    * decoder; everything around it (typed Dataset boundary, per-partition
    * batching, feature schema) stays exactly as-is.
    */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    val size = r.payload.length
    // ??? real codec goes here — stub derives pseudo-dimensions from size.
    // checksum is a mod-prime rolling hash (bounded, so the DuckDB oracle
    // can express it without BIGINT overflow)
    val checksum = r.payload.foldLeft(0L)((acc, b) =>
      (acc * 31 + (b & 0xff)) % 1000000007L)
    val width = size % 251
    val height = (size * 7 + 13) % 251
    val frames = if (r.media_type == "video") size / 100 + 1 else 1
    MediaFeatures(r.doc_id, r.media_type, size, checksum, width, height, frames)
  }

  /** Batched per-partition decode: groups the partition iterator into
    * fixed-size batches (the shape a vectorized/codec-context decode needs)
    * and flattens the decoded features back out. Map-only — no shuffle.
    */
  def decodeFeatures(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup for a real decoder would happen here
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** Resize stub for image payloads: aspect-preserving fit into a
    * `(tw × th)` box — keep dimensions that already fit, else scale the
    * tighter side down with floor arithmetic (exact: all products are
    * small integers, representable in doubles on any engine). Emits the
    * resized dimensions and a proportional byte estimate — the metadata
    * half of a resize stage; a real implementation re-encodes the payload
    * where the `???` codec stub sits in [[decodeFeatures]]. Map-only, no
    * shuffle at any scale.
    */
  def resizeImages(
      spark: SparkSession,
      media: DataFrame,
      tw: Int = 64,
      th: Int = 64): DataFrame = {
    val feats = decodeFeatures(spark, media).toDF()
    val w = greatest(col("width"), lit(1)).cast("double")
    val h = greatest(col("height"), lit(1)).cast("double")
    val fitH = floor(h * tw / w).cast("int") // height if scaled to width tw
    val noScale = col("width") <= tw && col("height") <= th
    feats.where(col("media_type") === "image")
      .select(
        col("doc_id"), col("size_bytes"),
        col("width").as("in_w"), col("height").as("in_h"),
        when(noScale, col("width")).when(fitH <= th, lit(tw))
          .otherwise(floor(w * th / h).cast("int")).as("out_w"),
        when(noScale, col("height")).when(fitH <= th, fitH)
          .otherwise(lit(th)).as("out_h"))
      .withColumn("out_bytes",
        floor(col("size_bytes").cast("double") *
          (col("out_w") * col("out_h")).cast("double") /
          greatest((col("in_w") * col("in_h")).cast("double"), lit(1.0)))
          .cast("long"))
  }

  /** Frame sampling stub for video payloads: every `stride` bytes is a
    * "frame" offset — demonstrates the explode-to-frames shape whose row
    * count is data-dependent (a real sampler emits keyframe offsets).
    */
  def sampleFrames(
      spark: SparkSession,
      media: DataFrame,
      stride: Int = 100): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord]
      .filter(_.media_type == "video")
      .flatMap { r =>
        (0 until r.payload.length by stride).map { off =>
          (r.doc_id, off / stride, off,
            math.min(stride, r.payload.length - off))
        }
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "frame_bytes")
  }
}
