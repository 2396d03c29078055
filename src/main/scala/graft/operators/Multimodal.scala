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

/** Per-image decoded statistics: real header dimensions + exact per-channel
  * pixel sums (longs, so the cross-engine oracle compare is bit-exact). */
final case class ImageStats(
    media_id: Long,
    width: Int,
    height: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** Minimal pure-JVM codec for the uncompressed 24-bit Windows BMP format
  * (public spec: BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up BGR rows
  * padded to 4 bytes). No external library — the container ships no image
  * codecs, and BMP needs none. Decoded form is top-down row-major BGR. */
private[graft] object Bmp {
  final case class Image(width: Int, height: Int, bgr: Array[Byte]) {
    def b(x: Int, y: Int): Int = bgr((y * width + x) * 3) & 0xff
    def g(x: Int, y: Int): Int = bgr((y * width + x) * 3 + 1) & 0xff
    def r(x: Int, y: Int): Int = bgr((y * width + x) * 3 + 2) & 0xff
  }

  private def rowSize(w: Int): Int = ((w * 3) + 3) / 4 * 4

  /** Encode a top-down BGR buffer as a 24bpp bottom-up BMP. */
  def encode(img: Image): Array[Byte] = {
    val rs = rowSize(img.width)
    val dataSize = rs * img.height
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(54 + dataSize) // file size
    out.putInt(0)             // reserved
    out.putInt(54)            // pixel data offset
    out.putInt(40)            // BITMAPINFOHEADER size
    out.putInt(img.width)
    out.putInt(img.height)    // positive → bottom-up
    out.putShort(1)           // planes
    out.putShort(24)          // bpp
    out.putInt(0)             // BI_RGB (uncompressed)
    out.putInt(dataSize)
    out.putInt(2835).putInt(2835) // 72 DPI
    out.putInt(0).putInt(0)
    var y = img.height - 1
    while (y >= 0) { // bottom-up row order
      out.put(img.bgr, y * img.width * 3, img.width * 3)
      var pad = rs - img.width * 3
      while (pad > 0) { out.put(0.toByte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  /** Strict sniff: only byte strings that really are a well-formed
    * uncompressed 24bpp BMP take the decode path (magic + declared file
    * size matching the payload length rules out text that happens to
    * start with "BM"). */
  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M' && {
      val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      in.getInt(2) == bytes.length && in.getShort(28) == 24 && in.getInt(30) == 0
    }

  /** Decoded pixel cap: a corrupt header claiming a multi-gigapixel image
    * must fail cleanly, not OOM the executor. 2²⁶ px ≈ 192 MB decoded. */
  private val MaxPixels = 1L << 26

  def decode(bytes: Array[Byte]): Image = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val offset = in.getInt(10)
    val w = in.getInt(18)
    val hRaw = in.getInt(22)
    require(in.getShort(28) == 24, "only 24bpp BMP supported")
    require(in.getInt(30) == 0, "only uncompressed BMP supported")
    // Header fields are untrusted input: bounds-check before any
    // allocation, in Long space so w*h etc. cannot overflow to a small
    // or negative Int and sail past the checks.
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"BMP dimensions out of range: ${w}x$hRaw")
    require(w.toLong * h <= MaxPixels, s"BMP too large: ${w}x$h")
    val rsL = ((w.toLong * 3) + 3) / 4 * 4
    require(offset >= 54 && offset.toLong + rsL * h <= bytes.length,
      s"BMP pixel data (offset=$offset, ${w}x$h) exceeds payload of ${bytes.length} bytes")
    val topDown = hRaw < 0
    val rs = rowSize(w)
    val bgr = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      System.arraycopy(bytes, offset + srcRow * rs, bgr, y * w * 3, w * 3)
      y += 1
    }
    Image(w, h, bgr)
  }
}

/** Per-clip decoded audio statistics: real header fields + exact sums over
  * decoded PCM samples (longs, so the oracle compare is bit-exact). */
final case class AudioStats(
    media_id: Long,
    sample_rate: Int,
    n_samples: Long,
    sum_abs: Long,
    peak: Int)

/** Minimal pure-JVM codec for canonical PCM WAV (public spec: RIFF header,
  * `fmt ` chunk with audio format 1 = uncompressed PCM, 16-bit mono
  * little-endian `data` chunk). Decoded form is an Array[Short]. */
private[graft] object Wav {
  def encode(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(36 + dataSize) // RIFF chunk size
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII"))
    out.putInt(16)            // fmt chunk size
    out.putShort(1)           // PCM
    out.putShort(1)           // mono
    out.putInt(sampleRateHz)
    out.putInt(sampleRateHz * 2) // byte rate
    out.putShort(2)           // block align
    out.putShort(16)          // bits per sample
    out.put("data".getBytes("US-ASCII"))
    out.putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Strict sniff: RIFF magic + declared chunk size matching the payload
    * + canonical PCM16-mono fmt chunk at the fixed offset. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E' && {
        val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        in.getInt(4) == bytes.length - 8 &&
          in.getShort(20) == 1 && in.getShort(22) == 1 && in.getShort(34) == 16
      }

  /** Returns (sampleRateHz, samples). Only the canonical 44-byte-header
    * layout produced by [[encode]] (and by most PCM tools) is supported. */
  def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(isWav(bytes), "not a canonical PCM16 mono WAV")
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rate = in.getInt(24)
    val dataSize = in.getInt(40)
    // untrusted header: the declared data-chunk size must fit the payload
    require(dataSize >= 0 && 44L + dataSize <= bytes.length,
      s"WAV data chunk ($dataSize bytes) exceeds payload of ${bytes.length} bytes")
    val n = dataSize / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = in.getShort(44 + i * 2); i += 1 }
    (rate, samples)
  }
}

/** Per-frame decoded video statistics: real decoded dimensions + exact
  * per-channel pixel sums per frame (longs — bit-exact cross-engine
  * oracle), one row per sampled frame. */
final case class FrameStats(
    media_id: Long,
    frame_idx: Int,
    width: Int,
    height: Int,
    sum_r: Long,
    sum_g: Long,
    sum_b: Long)

/** Minimal pure-JVM VIDEO container: a length-prefixed sequence of
  * PNG-encoded frames ("GVF1" magic, frame count, fps, then
  * `len:int32le` + PNG bytes per frame). PNG encode/decode is the JDK's
  * own `javax.imageio` (headless-safe, no external dependency) — so the
  * frame payloads are REAL compressed images a generic tool can open,
  * and the decode path exercises a genuine codec, not byte slicing. */
private[graft] object Gvf {
  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // round-trips a temp file, which dominates runtime for small frames
  // (measured ~10 s for ~7k frames at sf0.1 vs ~2 s in-memory). Media
  // frames here are small by construction, so cache in memory. JVM-wide,
  // set once per executor at class init.
  javax.imageio.ImageIO.setUseCache(false)

  /** Cap on frames declared by an (untrusted) header. */
  private val MaxFrames = 1 << 16

  def isGvf(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'G' && bytes(1) == 'V' && bytes(2) == 'F' && bytes(3) == '1'

  def encode(fps: Int, frames: Seq[Bmp.Image]): Array[Byte] = {
    val pngs = frames.map { img =>
      val bi = new java.awt.image.BufferedImage(
        img.width, img.height, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val data = bi.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      System.arraycopy(img.bgr, 0, data, 0, img.bgr.length)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "png", baos)
      baos.toByteArray
    }
    val out = java.nio.ByteBuffer
      .allocate(12 + pngs.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("GVF1".getBytes("US-ASCII"))
    out.putInt(frames.size)
    out.putInt(fps)
    pngs.foreach { p => out.putInt(p.length); out.put(p) }
    out.array()
  }

  /** Returns (fps, frames) with frames decoded to top-down BGR. PNG is
    * lossless, so decoded pixels are bit-exact vs the encoder's input. */
  def decode(bytes: Array[Byte]): (Int, Seq[Bmp.Image]) = {
    require(isGvf(bytes), "not a GVF1 video payload")
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nFrames = in.getInt(4)
    val fps = in.getInt(8)
    require(nFrames >= 0 && nFrames <= MaxFrames, s"frame count out of range: $nFrames")
    var off = 12
    val frames = (0 until nFrames).map { _ =>
      require(off + 4 <= bytes.length, "truncated GVF frame table")
      val len = in.getInt(off)
      require(len > 0 && off + 4L + len <= bytes.length,
        s"GVF frame ($len bytes at $off) exceeds payload of ${bytes.length} bytes")
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off + 4, len))
      require(bi != null, "undecodable PNG frame")
      off += 4 + len
      val (w, h) = (bi.getWidth, bi.getHeight)
      val bgr = new Array[Byte](w * h * 3)
      if (bi.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) {
        // The JDK PNG reader decodes RGB PNGs to exactly this layout
        // (top-down BGR bytes) — copy the raster buffer instead of one
        // getRGB color-model conversion per pixel.
        val data = bi.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        System.arraycopy(data, 0, bgr, 0, bgr.length)
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = bi.getRGB(x, y)
            val p = (y * w + x) * 3
            bgr(p)     = (rgb & 0xff).toByte
            bgr(p + 1) = ((rgb >> 8) & 0xff).toByte
            bgr(p + 2) = ((rgb >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
      }
      Bmp.Image(w, h, bgr)
    }
    (fps, frames)
  }
}

/** Multimodal column plumbing: the binary+struct schema, `Dataset
  * [MediaRecord]` encoders, partition-parallel `mapPartitions` batch shape
  * (the Scala analogue of arrow-batched `mapInPandas`), and the explode/
  * repartition behavior of frame sampling.
  *
  * IMAGES, AUDIO, AND VIDEO ARE REAL: records built by
  * [[fromDocumentsBmp]] carry genuine 24-bit BMP payloads,
  * [[fromDocumentsWav]] genuine PCM16 WAV payloads, and
  * [[fromDocumentsVideo]] genuine PNG-frame video containers ([[Gvf]],
  * PNG codec = the JDK's `javax.imageio`); [[decodeFeatures]] /
  * [[resize]] / [[decodeImageStats]] / [[decodeAudioStats]] /
  * [[videoFrameStats]] run real decodes on them. Payloads in any
  * UNRECOGNIZED format fall back to the clearly-marked deterministic
  * STUB paths; swapping in another codec changes only those function
  * bodies, not schemas, signatures, or the physical plan.
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

  /** Manufacture records with REAL 24-bit BMP payloads, one per document.
    * Dimensions derive from doc_id (width = doc_id%64+16, height =
    * doc_id%48+16) and each pixel's channels are closed-form in
    * (doc_id, x, y) — so a cross-engine oracle can recompute the decoded
    * statistics without a BMP decoder of its own, while the Spark side
    * must genuinely parse the bytes it wrote. Encoding runs per-partition
    * (amortized buffer allocation, streaming through rows). */
  def fromDocumentsBmp(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (id % 64).toInt + 16
        val h = (id % 48).toInt + 16
        val bgr = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = (y * w + x) * 3
            bgr(p)     = ((id * 3 + x * 7  + y * 11) % 256).toByte // B
            bgr(p + 1) = ((id * 5 + x * 13 + y * 17) % 256).toByte // G
            bgr(p + 2) = ((id * 7 + x * 19 + y * 23) % 256).toByte // R
            x += 1
          }
          y += 1
        }
        MediaRecord(id, Bmp.encode(Bmp.Image(w, h, bgr)),
          MediaMeta("image", w, h, 0, 0L))
      }
    }
  }

  /** Manufacture records with REAL PCM16 WAV payloads, one per document.
    * Clip length derives from doc_id (n = doc_id%800+200 samples at 8 kHz)
    * and each sample is closed-form in (doc_id, i) — so a cross-engine
    * oracle can recompute decoded statistics without a WAV decoder, while
    * the Spark side must genuinely parse the bytes it wrote. */
  def fromDocumentsWav(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    val Rate = 8000
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 800).toInt + 200
        val samples = Array.tabulate(n)(i => ((id * 131 + i * 97) % 2001 - 1000).toShort)
        MediaRecord(id, Wav.encode(Rate, samples),
          MediaMeta("audio", 0, 0, Rate, n.toLong * 1000 / Rate))
      }
    }
  }

  /** Manufacture records with REAL video payloads (PNG frame sequences in
    * the [[Gvf]] container), one per document. Frame count and dimensions
    * derive from doc_id (n = doc_id%4+2, w = doc_id%16+8, h = doc_id%12+8,
    * 10 fps) and each pixel's channels are closed-form in
    * (doc_id, frame, x, y) — a cross-engine oracle recomputes decoded
    * frame statistics without any codec, while the Spark side must
    * genuinely parse the container and inflate each PNG. */
  def fromDocumentsVideo(df: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    val Fps = 10
    df.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (id % 4).toInt + 2
        val w = (id % 16).toInt + 8
        val h = (id % 12).toInt + 8
        val frames = (0 until n).map { f =>
          val bgr = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = (y * w + x) * 3
              bgr(p)     = ((id * 3 + f * 29 + x * 7  + y * 11) % 256).toByte // B
              bgr(p + 1) = ((id * 5 + f * 31 + x * 13 + y * 17) % 256).toByte // G
              bgr(p + 2) = ((id * 7 + f * 37 + x * 19 + y * 23) % 256).toByte // R
              x += 1
            }
            y += 1
          }
          Bmp.Image(w, h, bgr)
        }
        MediaRecord(id, Gvf.encode(Fps, frames),
          MediaMeta("video", w, h, 0, n.toLong * 1000 / Fps))
      }
    }
  }

  /** REAL frame sampling over video payloads: parse the [[Gvf]] container,
    * PNG-decode every `everyNth` frame, and emit one row of decoded
    * statistics per kept frame (dimensions + exact per-channel sums).
    * The explode happens inside the partition iterator — rows stream out
    * without materializing a record's full frame set, and the output is a
    * plain DataFrame repartitionable downstream like any table. Fails
    * loudly on non-video payloads. */
  def videoFrameStats(ds: Dataset[MediaRecord], everyNth: Int = 1)(
      implicit spark: SparkSession): Dataset[FrameStats] = {
    import spark.implicits._
    require(everyNth >= 1, "everyNth must be >= 1")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val (_, frames) = Gvf.decode(r.payload)
        frames.iterator.zipWithIndex
          .filter { case (_, f) => f % everyNth == 0 }
          .map { case (img, f) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var i = 0
            while (i < img.bgr.length) {
              sb += img.bgr(i) & 0xff
              sg += img.bgr(i + 1) & 0xff
              sr += img.bgr(i + 2) & 0xff
              i += 3
            }
            FrameStats(r.media_id, f, img.width, img.height, sr, sg, sb)
          }
      }
    }
  }

  /** Real decoded audio statistics: header sample rate + exact sample
    * count, absolute-value sum and peak. Fails loudly on non-WAV input. */
  def decodeAudioStats(ds: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[AudioStats] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val (rate, samples) = Wav.decode(r.payload)
        var (sumAbs, peak) = (0L, 0)
        var i = 0
        while (i < samples.length) {
          val a = math.abs(samples(i).toInt)
          sumAbs += a
          if (a > peak) peak = a
          i += 1
        }
        AudioStats(r.media_id, rate, samples.length.toLong, sumAbs, peak)
      }
    }
  }

  /** Decode/feature-extract. BMP payloads take the REAL path: parse the
    * header, decode the pixel rows, and compute the features over decoded
    * pixel channel values (n_bytes = decoded size, not container size).
    * Non-BMP payloads fall back to the deterministic STUB (raw-byte
    * histogram) — no audio/video codec ships in this container. Runs
    * per-partition over iterator batches — the shape a real vectorized
    * decoder needs (amortized codec init per partition, streaming through
    * rows without materializing the partition). */
  def decodeFeatures(ds: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val data =
          if (Bmp.isBmp(r.payload)) Bmp.decode(r.payload).bgr // real decode
          else if (Wav.isWav(r.payload))                      // real decode:
            java.util.Arrays.copyOfRange(r.payload, 44, r.payload.length) // PCM bytes
          else if (Gvf.isGvf(r.payload))                      // real decode:
            Gvf.decode(r.payload)._2.toArray.flatMap(_.bgr)   // all frames' BGR
          else r.payload                                      // STUB fallback
        val hist = new Array[Long](16)
        var sum = 0L
        var i = 0
        while (i < data.length) {
          val b = data(i) & 0xff
          hist(b / 16) += 1
          sum += b * (i + 1)
          i += 1
        }
        MediaFeatures(r.media_id, r.meta.kind, data.length, hist, sum)
      }
    }
  }

  /** Real decoded image statistics: header dimensions + exact per-channel
    * pixel sums. Fails loudly on non-BMP input — stats over undecodable
    * bytes would be meaningless. */
  def decodeImageStats(ds: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[ImageStats] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val img = Bmp.decode(r.payload)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < img.bgr.length) {
          sb += img.bgr(i) & 0xff
          sg += img.bgr(i + 1) & 0xff
          sr += img.bgr(i + 2) & 0xff
          i += 3
        }
        ImageStats(r.media_id, img.width, img.height, sr, sg, sb)
      }
    }
  }

  /** Resize. BMP payloads take the REAL path: decode, nearest-neighbor
    * resample (source pixel = (x*W/w, y*H/h), integer floor), re-encode
    * as BMP. Non-BMP payloads fall back to the STUB byte subsample.
    * Metadata updates are real on both paths. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        if (Bmp.isBmp(r.payload)) {
          val src = Bmp.decode(r.payload)
          val bgr = new Array[Byte](w * h * 3)
          var y = 0
          while (y < h) {
            val sy = y * src.height / h
            var x = 0
            while (x < w) {
              val sx = x * src.width / w
              val sp = (sy * src.width + sx) * 3
              val dp = (y * w + x) * 3
              bgr(dp) = src.bgr(sp); bgr(dp + 1) = src.bgr(sp + 1); bgr(dp + 2) = src.bgr(sp + 2)
              x += 1
            }
            y += 1
          }
          MediaRecord(r.media_id, Bmp.encode(Bmp.Image(w, h, bgr)),
            r.meta.copy(width = w, height = h))
        } else {
          // STUB: deterministic byte subsample to exactly w*h bytes
          // (repeating cyclically when the payload is short).
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
