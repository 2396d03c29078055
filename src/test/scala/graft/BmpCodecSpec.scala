package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bmp, Gvf, MediaMeta, MediaRecord, Multimodal, Wav}

/** Pure-JVM BMP/WAV/GVF-video codecs + the real decode paths in
  * Multimodal. */
class BmpCodecSpec extends SparkSpec {
  import spark.implicits._

  private def mkImage(w: Int, h: Int): Bmp.Image = {
    val bgr = new Array[Byte](w * h * 3)
    var i = 0
    while (i < bgr.length) { bgr(i) = ((i * 31 + 7) % 256).toByte; i += 1 }
    Bmp.Image(w, h, bgr)
  }

  test("encode/decode round-trips at widths with every padding remainder") {
    // row stride pads to 4 bytes: w%4 ∈ {0,1,2,3} exercises all pad widths
    for (w <- Seq(4, 5, 6, 7, 16, 33); h <- Seq(1, 3, 8)) {
      val img = mkImage(w, h)
      val bytes = Bmp.encode(img)
      assert(Bmp.isBmp(bytes), s"w=$w h=$h should sniff as BMP")
      val back = Bmp.decode(bytes)
      assert(back.width == w && back.height == h)
      assert(back.bgr.toSeq == img.bgr.toSeq, s"pixel mismatch at w=$w h=$h")
    }
  }

  test("isBmp rejects text, truncated headers, and size-mismatched payloads") {
    assert(!Bmp.isBmp("BMOC wrote some text here that is long enough to pass 54 bytes....".getBytes))
    assert(!Bmp.isBmp(Array[Byte]('B', 'M', 1, 2)))
    val valid = Bmp.encode(mkImage(5, 5))
    assert(!Bmp.isBmp(valid.dropRight(1))) // declared size no longer matches
    assert(Bmp.isBmp(valid))
  }

  test("decode handles top-down (negative height) BMPs") {
    val img = mkImage(6, 4)
    val bytes = Bmp.encode(img)
    // flip to top-down: negate height, rows already bottom-up in the file →
    // reverse the row order so the image content stays identical
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4)
    val rs = 6 * 3 + 2 // width 6 → 18 bytes + 2 pad
    val rows = (0 until 4).map(r => bytes.slice(54 + r * rs, 54 + (r + 1) * rs))
    rows.reverse.zipWithIndex.foreach { case (row, r) =>
      System.arraycopy(row, 0, bytes, 54 + r * rs, rs)
    }
    val back = Bmp.decode(bytes)
    assert(back.bgr.toSeq == img.bgr.toSeq)
  }

  test("decodeImageStats matches the generator's closed-form pixel function") {
    val docs = spark.range(7).select(col("id").as("doc_id"))
    val stats = Multimodal.decodeImageStats(Multimodal.fromDocumentsBmp(docs))
      .collect().sortBy(_.media_id)
    stats.foreach { s =>
      val (w, h) = ((s.media_id % 64).toInt + 16, (s.media_id % 48).toInt + 16)
      assert(s.width == w && s.height == h)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += (s.media_id * 7 + x * 19 + y * 23) % 256
        eg += (s.media_id * 5 + x * 13 + y * 17) % 256
        eb += (s.media_id * 3 + x * 7 + y * 11) % 256
      }
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)), s"id=${s.media_id}")
    }
  }

  test("resize on BMP is a real nearest-neighbor resample, re-encoded as BMP") {
    val docs = spark.range(3).select(col("id").as("doc_id"))
    val resized = Multimodal.resize(Multimodal.fromDocumentsBmp(docs), 8, 8)
      .collect().sortBy(_.media_id)
    resized.foreach { r =>
      assert(Bmp.isBmp(r.payload))
      val img = Bmp.decode(r.payload)
      assert(img.width == 8 && img.height == 8)
      assert(r.meta.width == 8 && r.meta.height == 8)
      val (w0, h0) = ((r.media_id % 64).toInt + 16, (r.media_id % 48).toInt + 16)
      for (y <- 0 until 8; x <- 0 until 8) {
        val (sx, sy) = (x * w0 / 8, y * h0 / 8)
        assert(img.r(x, y) == ((r.media_id * 7 + sx * 19 + sy * 23) % 256).toInt,
          s"id=${r.media_id} ($x,$y)")
      }
    }
  }

  test("WAV encode/decode round-trips samples and rate; sniff rejects near-misses") {
    val samples = Array.tabulate(333)(i => ((i * 731 + 13) % 2001 - 1000).toShort)
    val bytes = Wav.encode(16000, samples)
    assert(Wav.isWav(bytes))
    val (rate, back) = Wav.decode(bytes)
    assert(rate == 16000)
    assert(back.toSeq == samples.toSeq)
    assert(!Wav.isWav(bytes.dropRight(1)))  // declared RIFF size mismatch
    assert(!Wav.isWav("RIFFxxxxWAVEfmt and then a lot of text padding to reach 44".getBytes))
    assert(!Bmp.isBmp(bytes))               // codecs must not cross-sniff
    assert(!Wav.isWav(Bmp.encode(mkImage(5, 5))))
  }

  test("decodeAudioStats matches the generator's closed-form sample function") {
    val docs = spark.range(5).select(col("id").as("doc_id"))
    val stats = Multimodal.decodeAudioStats(Multimodal.fromDocumentsWav(docs))
      .collect().sortBy(_.media_id)
    stats.foreach { s =>
      val n = (s.media_id % 800).toInt + 200
      assert(s.sample_rate == 8000 && s.n_samples == n)
      var (ea, ep) = (0L, 0)
      for (i <- 0 until n) {
        val v = math.abs((s.media_id * 131 + i * 97) % 2001 - 1000).toInt
        ea += v; ep = math.max(ep, v)
      }
      assert((s.sum_abs, s.peak) == ((ea, ep)), s"id=${s.media_id}")
    }
  }

  test("corrupt headers fail cleanly, never allocate from untrusted fields") {
    val valid = Bmp.encode(mkImage(6, 4))
    def mutated(off: Int, v: Int): Array[Byte] = {
      val b = valid.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(off, v)
      b
    }
    // width/height huge or negative, offset past the payload
    intercept[IllegalArgumentException](Bmp.decode(mutated(18, Int.MaxValue)))
    intercept[IllegalArgumentException](Bmp.decode(mutated(18, -5)))
    intercept[IllegalArgumentException](Bmp.decode(mutated(22, 1 << 20)))
    intercept[IllegalArgumentException](Bmp.decode(mutated(10, valid.length + 100)))
    // WAV with a data-chunk size larger than the payload
    val wav = Wav.encode(8000, Array.tabulate(50)(_.toShort))
    val badWav = wav.clone()
    java.nio.ByteBuffer.wrap(badWav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, wav.length * 4)
    intercept[IllegalArgumentException](Wav.decode(badWav))
  }

  test("GVF video: PNG frames round-trip bit-exact; truncation fails loudly") {
    val frames = (0 until 3).map { f =>
      val img = mkImage(9, 5)
      img.bgr.indices.foreach(i => img.bgr(i) = ((i * 13 + f * 41) % 256).toByte)
      img
    }
    val bytes = Gvf.encode(10, frames)
    assert(Gvf.isGvf(bytes))
    assert(!Gvf.isGvf(Bmp.encode(mkImage(4, 4))))
    val (fps, back) = Gvf.decode(bytes)
    assert(fps == 10 && back.size == 3)
    back.zip(frames).foreach { case (b, o) =>
      assert(b.width == o.width && b.height == o.height)
      assert(b.bgr.toSeq == o.bgr.toSeq, "PNG round-trip must be lossless")
    }
    intercept[IllegalArgumentException](Gvf.decode(bytes.dropRight(10)))
    val badCount = bytes.clone()
    java.nio.ByteBuffer.wrap(badCount).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, Int.MaxValue)
    intercept[IllegalArgumentException](Gvf.decode(badCount))
  }

  test("videoFrameStats matches the generator's closed-form pixel function, everyNth sampling") {
    val docs = spark.range(6).select(col("id").as("doc_id"))
    val stats = Multimodal.videoFrameStats(
      Multimodal.fromDocumentsVideo(docs), everyNth = 2)
      .collect().sortBy(s => (s.media_id, s.frame_idx))
    assert(stats.nonEmpty)
    stats.foreach { s =>
      val (w, h) = ((s.media_id % 16).toInt + 8, (s.media_id % 12).toInt + 8)
      assert(s.width == w && s.height == h)
      assert(s.frame_idx % 2 == 0, "everyNth=2 keeps even frames only")
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += (s.media_id * 7 + s.frame_idx * 37 + x * 19 + y * 23) % 256
        eg += (s.media_id * 5 + s.frame_idx * 31 + x * 13 + y * 17) % 256
        eb += (s.media_id * 3 + s.frame_idx * 29 + x * 7 + y * 11) % 256
      }
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)), s"id=${s.media_id} f=${s.frame_idx}")
    }
    // frame-count bookkeeping: id%4+2 frames, even indices kept
    val byId = stats.groupBy(_.media_id)
    (0L until 6L).foreach { id =>
      val n = (id % 4).toInt + 2
      assert(byId(id).length == (n + 1) / 2, s"id=$id")
    }
  }

  test("decodeFeatures: WAV features come from decoded PCM bytes") {
    val docs = spark.range(2).select(col("id").as("doc_id"))
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocumentsWav(docs))
      .collect().sortBy(_.media_id)
    feats.foreach { f =>
      val n = (f.media_id % 800).toInt + 200
      assert(f.n_bytes == n * 2, "n_bytes must be the PCM data size, not the container size")
      assert(f.kind == "audio")
    }
  }

  test("decodeFeatures: BMP features come from decoded pixels; non-BMP keeps the stub path") {
    val docs = spark.range(2).select(col("id").as("doc_id"))
    val real = Multimodal.decodeFeatures(Multimodal.fromDocumentsBmp(docs))
      .collect().sortBy(_.media_id)
    real.foreach { f =>
      val (w, h) = ((f.media_id % 64).toInt + 16, (f.media_id % 48).toInt + 16)
      assert(f.n_bytes == w * h * 3, "n_bytes must be DECODED size, not container size")
      assert(f.byte_histogram.sum == w * h * 3)
    }
    // non-BMP payload: histogram over the raw bytes (stub fallback)
    val raw = Seq(MediaRecord(1L, Array[Byte](0, 17, 34, 51), MediaMeta("audio", 0, 0, 8000, 1L)))
      .toDS()
    val stub = Multimodal.decodeFeatures(raw).collect().head
    assert(stub.n_bytes == 4)
    assert(stub.byte_histogram.toSeq == Seq(1L, 1L, 1L, 1L) ++ Seq.fill(12)(0L))
  }
}
