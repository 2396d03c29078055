package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed media record: opaque binary payload + structured metadata.
  * Images/audio/video all travel as `payload: binary` with `meta`
  * describing how to interpret it — the schema contract a multimodal
  * training pipeline carries through every stage. */
final case class MediaMeta(
    kind: String,        // "image" | "audio" | "video" | "text"
    width: Int,          // pixels (images/video) or 0
    height: Int,
    sampleRateHz: Int,   // audio or 0
    durationMs: Long)    // audio/video or 0

final case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

final case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    byte_histogram: Array[Long], // 16 buckets over byte values
    checksum: Long)

/** Multimodal column plumbing. The DECODE STEP IS A DETERMINISTIC STUB —
  * this container has no image/audio codecs — but everything Spark-side is
  * real and tested: the binary+struct schema, the `Dataset[MediaRecord]`
  * encoders, partition-parallel `mapPartitions` batch shape (the Scala
  * analogue of arrow-batched `mapInPandas`), and the explode/repartition
  * behavior of frame sampling.
  *
  * Swapping the stub for a real codec changes ONLY the function bodies
  * marked `STUB`; schemas, signatures and the physical plan stay as-is.
  */
object Multimodal {

  /** Manufacture a MediaRecord dataset from the `documents` fixture: the
    * UTF-8 bytes of `text` stand in for an encoded media payload. */
  def fromDocuments(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("kind"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"),
        lit(0).cast("int").as("sampleRateHz"),
        lit(0L).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB decode/feature-extract. Real version: decode image → pixel
    * tensor → model features. Deterministic fake: 16-bucket byte histogram
    * + additive checksum. Runs per-partition over iterator batches — the
    * shape a real vectorized decoder needs (amortized codec init per
    * partition, streaming through rows without materializing the
    * partition). */
  def decodeFeatures(ds: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      // per-partition "codec" initialization would go here (STUB)
      it.map { r =>
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < r.payload.length) {
          val b = r.payload(i) & 0xff
          hist(b / 16) += 1
          sum += b * (i + 1)
          i += 1
        }
        MediaFeatures(r.media_id, r.meta.kind, r.payload.length, hist, sum)
      }
    }
  }

  /** STUB resize: real version decodes, resamples pixels, re-encodes.
    * Fake: deterministic byte subsample to exactly w*h bytes (repeating
    * cyclically when the payload is short). Metadata updates are real. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val n = math.max(w * h, 1)
        val out = new Array[Byte](n)
        if (r.payload.nonEmpty) {
          var i = 0
          val stride = math.max(r.payload.length / n, 1)
          while (i < n) {
            out(i) = r.payload((i.toLong * stride % r.payload.length).toInt)
            i += 1
          }
        }
        MediaRecord(r.media_id, out, r.meta.copy(width = w, height = h))
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size frames, keep every
    * `everyNth`. Pure DataFrame explode — the output is (media_id,
    * frame_idx, frame_bytes), repartitionable downstream like any table. */
  def frameSample(ds: Dataset[MediaRecord], frameBytes: Int, everyNth: Int): DataFrame = {
    val frames = transform(
      sequence(lit(0),
        greatest(floor((length(col("payload")) - 1) / lit(frameBytes)).cast("int"), lit(0))),
      i => struct(
        i.as("frame_idx"),
        substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes)).as("frame_bytes")))
    ds.toDF()
      .select(col("media_id"), explode(frames).as("f"))
      .select(col("media_id"), col("f.frame_idx"), col("f.frame_bytes"))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
  }
}
