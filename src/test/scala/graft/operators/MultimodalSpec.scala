package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("decodeMeta is deterministic and bounded") {
    val m = Multimodal.decodeMeta("hello world, this is a fake png".getBytes("UTF-8"))
    assert(m.width >= 1 && m.width <= 128)
    assert(m.height >= 1 && m.height <= 128)
    assert(m.nBytes === 31)
    assert(m === Multimodal.decodeMeta("hello world, this is a fake png".getBytes("UTF-8")))
  }

  test("byte histogram partitions the payload exactly") {
    val sess = spark
    import sess.implicits._
    val payload = (0 until 500).map(i => (i % 251).toByte).toArray
    val media = Seq(Multimodal.MediaRow(1L, "image", payload)).toDS()
    val hist = Multimodal.byteHistograms(media).collect()(0).getSeq[Long](1)
    assert(hist.length === 16)
    assert(hist.sum === 500, "every byte lands in exactly one bin")
  }

  test("WAV decoder: golden bytes incl. sign extension and unknown-chunk skip") {
    // hand-built mono 16-bit WAV with a LIST chunk BEFORE data (the
    // decoder must walk past it) and samples exercising both extremes
    val samples = Seq[Short](1000, -1000, 32767, -32768)
    val listBody = "INFOgraftx".getBytes("US-ASCII") // filler, even length (word-aligned)
    val dataLen = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + 8 + listBody.length + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8 + listBody.length + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(44100).putInt(88200).putShort(2).putShort(16)
    b.put("LIST".getBytes("US-ASCII")).putInt(listBody.length).put(listBody)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(b.putShort)
    val m = MediaCodecs.decodeWav(b.array())
    assert(m.sampleRate === 44100 && m.channels === 1 && m.nSamples === 4)
    assert(m.sumSamples === 1000L - 1000L + 32767L - 32768L)
    assert(m.sumSquares ===
      1000L * 1000 + 1000L * 1000 + 32767L * 32767 + 32768L * 32768)
    // synth → decode closed-form agreement for a spread of ids
    for (id <- Seq(0L, 5L, 63L, 64L, 97L)) {
      val d = MediaCodecs.decodeWav(MediaCodecs.synthWav(id))
      val n = 64 + (id % 64).toInt
      val expect = (0 until n).map(i => (id * 31 + 7L * i) % 2001 - 1000)
      assert(d.nSamples === n)
      assert(d.sumSamples === expect.sum)
      assert(d.sumSquares === expect.map(v => v * v).sum)
    }
  }

  test("BMP decoder: golden bytes incl. bottom-up padded rows") {
    // every width 4..7 exercises a different row padding (0..3 bytes)
    for (id <- Seq(0L, 1L, 2L, 3L, 42L, 99L)) {
      val d = MediaCodecs.decodeBmp(MediaCodecs.synthBmp(id))
      val (w, h) = (4 + (id % 4).toInt, 2 + (id % 3).toInt)
      val px = 0 until (w * h)
      assert(d.width === w && d.height === h && d.bitsPerPixel === 24)
      assert(d.sumB === px.map(p => (id * 7 + 3L * p) % 256).sum)
      assert(d.sumG === px.map(p => (id * 7 + 3L * p + 1) % 256).sum)
      assert(d.sumR === px.map(p => (id * 7 + 3L * p + 2) % 256).sum)
    }
  }

  test("ImageIO decode: PNG roundtrip is pixel-exact for every size/padding case") {
    for (id <- Seq(0L, 1L, 2L, 3L, 42L, 99L)) {
      val d = MediaCodecs.decodeImage(MediaCodecs.synthPng(id))
      val (w, h) = (4 + (id % 4).toInt, 2 + (id % 3).toInt)
      val px = 0 until (w * h)
      assert(d.width === w && d.height === h)
      assert(d.sumB === px.map(p => (id * 7 + 3L * p) % 256).sum)
      assert(d.sumG === px.map(p => (id * 7 + 3L * p + 1) % 256).sum)
      assert(d.sumR === px.map(p => (id * 7 + 3L * p + 2) % 256).sum)
    }
  }

  test("ImageIO decode: JPEG gives exact dimensions and bounded pixel drift") {
    for (id <- Seq(0L, 7L, 42L)) {
      val jpegBytes = MediaCodecs.synthJpeg(id)
      // a real JFIF container, not a repackaged bitmap
      assert((jpegBytes(0) & 0xff) === 0xff && (jpegBytes(1) & 0xff) === 0xd8)
      val d = MediaCodecs.decodeImage(jpegBytes)
      val (w, h) = (4 + (id % 4).toInt, 2 + (id % 3).toInt)
      assert(d.width === w && d.height === h)
      // lossy: channel MEANS must stay within a coarse band of the
      // source means (the pattern is a mod-256 gradient; DCT error on
      // tiny blocks is real but bounded)
      val px = 0 until (w * h)
      def mean(s: Long) = s.toDouble / (w * h)
      val srcB = px.map(p => (id * 7 + 3L * p) % 256).sum
      assert(math.abs(mean(d.sumB) - mean(srcB)) < 64.0,
        s"JPEG blue mean drifted: ${mean(d.sumB)} vs ${mean(srcB)}")
    }
  }

  test("ImageIO decode rejects undecodable bytes instead of returning garbage") {
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeImage("definitely not an image".getBytes("UTF-8"))
    }
  }

  test("wavFingerprint: shift invariance away from wraps, closed-form agreement") {
    for (id <- Seq(0L, 5L, 42L, 63L)) {
      val f0 = MediaCodecs.wavFingerprint(MediaCodecs.synthWav(id))
      val n = 64 + (id % 64).toInt
      assert(f0.nSamples === n)
      // closed-form replay of the delta-energy bits
      def s(i: Int, d: Int) = (id * 31 + 7L * i + d) % 2001 - 1000
      def e(w: Int, d: Int) = (0 until 4).map(j => s(4 * w + j, d)).sum
      var expect = 0L
      for (w <- 1 until math.min(32, n / 4))
        if (e(w, 0) > e(w - 1, 0)) expect |= 1L << (w - 1)
      assert(f0.fp === expect, s"fingerprint mismatch for id=$id")
      // a uniform +3 amplitude shift flips at most a couple of bits
      // (only mod-wrap windows change their delta)
      val f3 = MediaCodecs.wavFingerprint(MediaCodecs.synthWavShifted(id, 3))
      assert(java.lang.Long.bitCount(f0.fp ^ f3.fp) <= 2,
        s"shift broke fingerprint stability for id=$id")
    }
  }

  test("frame sampling yields full fixed-size frames at the stride") {
    val sess = spark
    import sess.implicits._
    val media = Seq((1L, ("x" * 300).getBytes("UTF-8")), (2L, ("y" * 30).getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // 300 bytes -> 4 frames (0..3), stride 2 -> frames 0, 2
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSet === Set((1L, 0), (1L, 2)))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length === 64))
    // media 2 is shorter than one frame -> no rows
  }

  test("BMP box resize: dims floor-halve and sums match a per-pixel recompute") {
    // cover every (w, h) residue class of the synthesizer
    (0L until 12L).foreach { id =>
      val bytes = MediaCodecs.synthBmp(id)
      val m = MediaCodecs.decodeBmp(bytes)
      val r = MediaCodecs.bmpResizeBox(bytes)
      assert(r.outWidth === m.width / 2 && r.outHeight === m.height / 2)
      // independent recompute straight from the closed-form pixels
      def v(p: Long, k: Long): Long = (id * 7 + 3 * p + k) % 256
      var (er, eg, eb) = (0L, 0L, 0L)
      for (by <- 0 until m.height / 2; bx <- 0 until m.width / 2) {
        val p00 = (2L * by) * m.width + 2L * bx
        val p10 = (2L * by + 1L) * m.width + 2L * bx
        eb += (v(p00, 0) + v(p00 + 1, 0) + v(p10, 0) + v(p10 + 1, 0)) / 4
        eg += (v(p00, 1) + v(p00 + 1, 1) + v(p10, 1) + v(p10 + 1, 1)) / 4
        er += (v(p00, 2) + v(p00 + 1, 2) + v(p10, 2) + v(p10 + 1, 2)) / 4
      }
      assert((r.sumR, r.sumG, r.sumB) === ((er, eg, eb)),
        s"id=$id ${m.width}x${m.height}: resampler diverged from closed form")
    }
  }

  test("ev5 image-neardup eval reconciles with mm8's pair output") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists())
    val pairs = graft.SparkEntry.queries("mm8_image_neardup")(spark, sfDir)
      .select("media_a", "media_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nHit = pairs.count { case (a, b) => b == a + 1000L }
    val row = graft.SparkEntry.queries("ev5_image_neardup_eval")(spark, sfDir)
      .collect().head
    assert(row.getLong(0) === 50L)
    assert(row.getLong(1) === pairs.length.toLong)
    assert(row.getLong(2) === nHit.toLong)
    // +4 brightness only flips wrap-around pixels: aHash must recover
    // most planted copies or the fingerprint is broken
    assert(row.getDouble(3) > 0.5, s"planted-copy recall collapsed to ${row.getDouble(3)}")
  }
}
