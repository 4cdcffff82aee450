package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as opaque
  * `binary` columns with typed metadata, processed per-partition in batches.
  * The decode step is a REAL header parse of the public container formats
  * (PNG IHDR / JPEG SOFn / WAV `fmt ` — [[MediaHeaders]]): dimensions,
  * channels and sample frames are read from the actual big-/little-endian
  * header fields, never inferred from byte counts. Because no real media
  * files exist in this container, [[attachMedia]] SYNTHESIZES format-valid
  * blobs (real signatures, chunk layout, CRCs) around deterministic
  * payloads — which is exactly what makes the decode oracle-checkable: the
  * DuckDB side replays the ENCODER's deterministic choices while Spark
  * genuinely round-trips them through binary header parsing, and
  * MultimodalSpec feeds the parser containers produced by the independent
  * JDK encoders (javax.imageio / javax.sound.sampled) to pin the parse
  * against a second implementation.
  *
  * Scale notes: header parse reads a few hundred bytes per blob — a
  * map-only stage whose cost is IO, not codec CPU (a pixel decode would
  * sit in the same `decodeOne` slot, batched per codec context). Batched
  * iteration inside mapPartitions amortizes per-batch setup, `repartition`
  * upstream sizes tasks to decoder throughput, and the output is columnar
  * features, never the raw bytes, so downstream stages shuffle small rows.
  */
object Multimodal {

  /** Typed input record: one media blob + envelope metadata. */
  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Typed output record: header-decoded features. width/height/channels
    * from the image header (0 where the modality has none), channels also
    * the WAV channel count, n_frames = 1 for stills, PCM sample frames
    * for audio, sampled-frame count for raw video blobs.
    */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      size_bytes: Int,
      checksum: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int)

  /** Attach a binary media column to the documents table: the text bytes
    * wrapped in a format-valid container (the container has no real media
    * files) — PNG or JPEG alternating for image docs, with dimensions
    * derived deterministically from the payload size (mod-251 keeps them
    * u16-safe), 16-bit PCM WAV for audio docs, raw bytes for video docs.
    * media_type assigned round-robin by doc_id. This is the envelope a
    * real pipeline would read from parquet `binary` columns.
    */
  def attachMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val n = payload.length.toLong
        (id % 3).toInt match {
          case 0 =>
            val w = (n % 251 + 1).toInt
            val h = ((n * 7 + 13) % 251 + 1).toInt
            val blob =
              if (id % 6 == 0) MediaHeaders.buildPng(w, h, payload)
              else MediaHeaders.buildJpeg(w, h, payload)
            MediaRecord(id, "image", blob)
          case 1 =>
            MediaRecord(id, "audio", MediaHeaders.buildWav(
              channels = (1 + id % 2).toInt, sampleRate = 8000, payload))
          case _ =>
            MediaRecord(id, "video", payload)
        }
      }.toDF()
  }

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

  /** Real header decode of one blob: format-sniff on the magic bytes
    * (extensions/envelope metadata are untrusted at ingest), parse the
    * public header fields, and checksum the container's PAYLOAD section
    * (PNG IDAT / JPEG entropy segment / WAV data chunk) with a bounded
    * mod-prime rolling hash. Unrecognized blobs (raw video here) fall
    * through with zero dimensions and the byte-stride frame count.
    */
  private def decodeOne(r: MediaRecord): MediaFeatures = {
    val size = r.payload.length
    val data = MediaHeaders.payloadSection(r.payload)
    val checksum = data.foldLeft(0L)((acc, b) =>
      (acc * 31 + (b & 0xff)) % 1000000007L)
    MediaHeaders.sniff(r.payload) match {
      case Some(MediaHeaders.ImageInfo(w, h, ch)) =>
        MediaFeatures(r.doc_id, r.media_type, size, checksum, w, h, ch, 1)
      case Some(MediaHeaders.AudioInfo(ch, _, bits, dataBytes)) =>
        val frameBytes = math.max(ch * (bits / 8), 1)
        MediaFeatures(r.doc_id, r.media_type, size, checksum, 0, 0, ch,
          dataBytes / frameBytes)
      case None =>
        MediaFeatures(r.doc_id, r.media_type, size, checksum, 0, 0, 0,
          size / 100 + 1)
    }
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
        // per-batch setup for a real pixel decoder would happen here
        batch.iterator.map(decodeOne)
      }
    }
  }

  /** Resize planning for image payloads: aspect-preserving fit into a
    * `(tw × th)` box — keep dimensions that already fit, else scale the
    * tighter side down with floor arithmetic (exact: all products are
    * small integers, representable in doubles on any engine). Input
    * dimensions come from the REAL header parse; emits the resized
    * dimensions and a proportional byte estimate — the planning half of
    * a resize stage; a real implementation re-encodes the payload where
    * the pixel decode sits in [[decodeFeatures]]. Map-only, no shuffle
    * at any scale.
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
