package graft.operators

/** REAL pure-JVM media decoders, two tiers:
  *
  *  - hand-rolled parsers for the codec-free containers: PCM WAV
  *    (RIFF chunk walk, little-endian 16-bit samples) and uncompressed
  *    24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte-aligned
  *    bottom-up rows) — `mm4`/`mm5`;
  *  - COMPRESSED images (PNG/JPEG/GIF) via `javax.imageio.ImageIO`,
  *    the JDK java.desktop codecs already on every Spark JVM's
  *    classpath, zero external deps — `mm7`. PNG is lossless, so a
  *    synthesized deterministic PNG decodes to exactly the closed-form
  *    pixels a DuckDB oracle replays; JPEG (lossy) is spec-checked for
  *    exact dimensions + bounded pixel drift in MultimodalSpec.
  *
  * Every decoded quantity (sample sums, channel sums, header fields)
  * is hash-checked against a closed-form oracle — a parser or codec
  * binding that misreads an offset, sign bit, row padding, or color
  * channel fails the correctness gate. MP3/H.264 remain the swap
  * point for a real external codec binding.
  */
object MediaCodecs {

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xff).toLong | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  // ---------------------------------------------------------------- WAV

  case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     nSamples: Int, sumSamples: Long, sumSquares: Long)

  /** Decode a PCM WAV file: walk RIFF chunks to fmt/data, then fold
    * the little-endian signed 16-bit samples.
    */
  def decodeWav(b: Array[Byte]): WavMeta = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var rate, ch, bits = 0
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val len = u32(b, off + 4).toInt
      require(len >= 0 && off + 8 + len <= b.length, s"corrupt chunk $id at $off")
      id match {
        case "fmt " =>
          require(u16(b, off + 8) == 1, "PCM only")
          ch = u16(b, off + 10)
          rate = u32(b, off + 12).toInt
          bits = u16(b, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => // skip unknown chunks (LIST, etc.)
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(dataOff >= 0 && bits == 16, "missing data chunk or non-16-bit")
    val n = dataLen / 2
    var sum = 0L
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val v = u16(b, dataOff + 2 * i).toShort.toInt // sign-extend
      sum += v
      sumSq += v.toLong * v
      i += 1
    }
    WavMeta(rate, ch, bits, n, sum, sumSq)
  }

  /** Well-formed mono 16-bit 8 kHz PCM WAV with deterministic samples
    * s_i = (id*31 + 7i) mod 2001 - 1000 — closed form the oracle
    * recomputes without touching bytes.
    */
  def synthWav(id: Long): Array[Byte] = synthWavShifted(id, 0)

  /** synthWav re-rendered with a uniform +delta sample offset (inside
    * the mod — wrap-around samples flip the occasional fingerprint
    * bit in mm9's near-dup fixture).
    */
  def synthWavShifted(id: Long, delta: Int): Array[Byte] = {
    val n = 64 + (id % 64).toInt
    val dataLen = n * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000 * 2) // rate, byte rate
      .putShort(2).putShort(16) // block align, bits
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      b.putShort(((id * 31 + 7L * i + delta) % 2001 - 1000).toShort)
      i += 1
    }
    b.array()
  }

  case class WavFp(nSamples: Int, fp: Long)

  /** Delta-energy audio fingerprint over REAL decoded samples — the
    * Shazam-family shape reduced to its integer core: window the
    * samples (4 per window, non-overlapping), bit (w-1) is set iff
    * window w's energy sum exceeds window w-1's. Amplitude shifts
    * cancel in the delta, so a re-encoded clip keeps its fingerprint
    * except where sample values wrap — the stability property that
    * makes it a near-dup key. At most 31 delta bits (windows beyond
    * 32 ignored), so the fingerprint rides a single long.
    */
  def wavFingerprint(b: Array[Byte]): WavFp = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val len = u32(b, off + 4).toInt
      require(len >= 0 && off + 8 + len <= b.length, s"corrupt chunk $id at $off")
      if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    val nWin = n / 4
    var fp = 0L
    var prev = 0L
    var w = 0
    while (w < math.min(32, nWin)) {
      var e = 0L
      var j = 0
      while (j < 4) {
        e += u16(b, dataOff + 2 * (4 * w + j)).toShort.toInt
        j += 1
      }
      if (w > 0 && e > prev) fp |= 1L << (w - 1)
      prev = e
      w += 1
    }
    WavFp(n, fp)
  }

  case class Decimated(nIn: Int, nOut: Int, sumKept: Long, sumAbsKept: Long)

  /** Decimate-by-2 over the real PCM data chunk: keep every even
    * sample index (0, 2, 4, …) and report exact integer sums of the
    * kept signed samples and of their magnitudes — the audio twin of
    * mm12's resize check (an off-by-one in the stride or a
    * sign-extension bug shifts both sums).
    */
  def wavDecimate(b: Array[Byte]): Decimated = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val len = u32(b, off + 4).toInt
      require(len >= 0 && off + 8 + len <= b.length, s"corrupt chunk $id at $off")
      if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    var (s, a) = (0L, 0L)
    var i = 0
    while (i < n) {
      val v = u16(b, dataOff + 2 * i).toShort.toLong
      s += v
      a += math.abs(v)
      i += 2
    }
    Decimated(n, (n + 1) / 2, s, a)
  }

  case class WavSeg(segNo: Int, startFrame: Int, nFrames: Int, energy: Long)

  /** Energy-based segmentation over REAL decoded samples — the
    * VAD-shaped cut a speech pipeline runs before transcription:
    * non-overlapping 16-sample frames, frame energy = sum of |sample|
    * (partial tail frame included), a frame is ACTIVE when its energy
    * reaches the threshold, and maximal runs of active frames become
    * segments (1-based numbering). Pure per-clip computation — the
    * corpus plan stays a narrow map + explode.
    */
  def wavSegments(b: Array[Byte], frameLen: Int, threshold: Long): Seq[WavSeg] = {
    require(b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE",
      "not a RIFF/WAVE container")
    var off = 12
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val len = u32(b, off + 4).toInt
      require(len >= 0 && off + 8 + len <= b.length, s"corrupt chunk $id at $off")
      if (id == "data") { dataOff = off + 8; dataLen = len }
      off += 8 + len + (len & 1)
    }
    require(dataOff >= 0, "missing data chunk")
    val n = dataLen / 2
    val nFrames = (n + frameLen - 1) / frameLen
    val out = Seq.newBuilder[WavSeg]
    var seg = 0
    var runStart = -1
    var runEnergy = 0L
    var f = 0
    while (f <= nFrames) { // one past the end flushes the last run
      val active = f < nFrames && {
        var e = 0L
        var j = f * frameLen
        val end = math.min(n, (f + 1) * frameLen)
        while (j < end) {
          e += math.abs(u16(b, dataOff + 2 * j).toShort.toLong)
          j += 1
        }
        if (e >= threshold) { runEnergy += e; true } else false
      }
      if (active && runStart < 0) { runStart = f; seg += 1 }
      else if (!active && runStart >= 0) {
        out += WavSeg(seg, runStart, f - runStart, runEnergy)
        runStart = -1
        runEnergy = 0L
      }
      f += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------- BMP

  case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int,
                     sumR: Long, sumG: Long, sumB: Long)

  /** Decode an uncompressed 24-bit BMP: header offsets, then the
    * bottom-up pixel rows each padded to a 4-byte boundary.
    */
  def decodeBmp(b: Array[Byte]): BmpMeta = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    val dataOff = u32(b, 10).toInt
    val w = u32(b, 18).toInt
    val h = u32(b, 22).toInt
    val bpp = u16(b, 28)
    require(bpp == 24 && u32(b, 30) == 0, "24-bit uncompressed only")
    val stride = ((w * 3 + 3) / 4) * 4
    require(w > 0 && h > 0 && w <= 65536 && h <= 65536 &&
      dataOff >= 54 && dataOff.toLong + stride.toLong * h <= b.length,
      s"corrupt BMP: ${w}x$h @$dataOff exceeds ${b.length} bytes")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var row = 0
    while (row < h) {
      val rowOff = dataOff + row * stride
      var c = 0
      while (c < w) {
        sb += b(rowOff + 3 * c) & 0xff
        sg += b(rowOff + 3 * c + 1) & 0xff
        sr += b(rowOff + 3 * c + 2) & 0xff
        c += 1
      }
      row += 1
    }
    BmpMeta(w, h, bpp, sr, sg, sb)
  }

  case class BmpHash(width: Int, height: Int, meanGray: Long, ahash: Long)

  /** Average-hash (aHash) over a decoded 24-bit BMP — the perceptual
    * fingerprint used for near-duplicate image detection: per-pixel
    * integer gray = (r+g+b)/3, mean gray over the image, bit p set
    * iff pixel p is brighter than the mean. All-integer arithmetic so
    * the hash replays bit-exactly anywhere; pixel index p follows BMP
    * storage order (row-major from the bottom row), the same ordering
    * synthBmp's closed form uses. A production variant downscales to
    * 8x8 first; these test images are already <= 7x4, so the resize
    * stage is the identity here.
    */
  def bmpAHash(b: Array[Byte]): BmpHash = {
    val m = decodeBmp(b) // validates the container
    val dataOff = u32(b, 10).toInt
    val stride = ((m.width * 3 + 3) / 4) * 4
    val n = m.width * m.height
    val grays = new Array[Long](n)
    var row = 0
    while (row < m.height) {
      val rowOff = dataOff + row * stride
      var c = 0
      while (c < m.width) {
        val blue = b(rowOff + 3 * c) & 0xff
        val green = b(rowOff + 3 * c + 1) & 0xff
        val red = b(rowOff + 3 * c + 2) & 0xff
        grays(row * m.width + c) = (red + green + blue) / 3
        c += 1
      }
      row += 1
    }
    val mean = grays.sum / n
    var hash = 0L
    var p = 0
    while (p < n) {
      if (grays(p) > mean) hash |= 1L << p
      p += 1
    }
    BmpHash(m.width, m.height, mean, hash)
  }

  // ------------------------------------------- compressed images (ImageIO)

  case class ImageMeta(width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Decode any JDK-supported compressed image (PNG, JPEG, GIF, BMP)
    * with `javax.imageio.ImageIO` and fold per-channel pixel sums.
    * Pure JVM — the codecs ship in java.desktop, so this runs on any
    * executor with no native library. The file-backed stream cache is
    * disabled: decodes happen on executor threads and must never
    * contend on temp-dir files (memory-only cache, same speed class
    * for the small-payload media-column shape).
    */
  def decodeImage(bytes: Array[Byte]): ImageMeta = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "bytes not decodable by any registered ImageIO codec")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y) // packed sRGB regardless of source layout
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    ImageMeta(img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** Well-formed PNG (via the JDK encoder — lossless, so the decode
    * side recovers these exact pixels): width 4+id%4, height 2+id%3,
    * pixel p (row-major from the top) has R/G/B =
    * (id*7 + 3p + 2/1/0) mod 256 — the same closed form as synthBmp,
    * which the oracle replays without touching bytes. Channel SUMS are
    * row-order independent, so the oracle is shared arithmetic.
    */
  def synthPng(id: Long): Array[Byte] = {
    val w = 4 + (id % 4).toInt
    val h = 2 + (id % 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = ((id * 7 + 3L * p + 2) % 256).toInt
      val g = ((id * 7 + 3L * p + 1) % 256).toInt
      val bl = ((id * 7 + 3L * p) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | bl)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "png", bos), "no PNG encoder")
    bos.toByteArray
  }

  /** Same deterministic pixels as synthPng, encoded as high-quality
    * JPEG — lossy, so only dimensions are exact; MultimodalSpec bounds
    * the per-channel drift.
    */
  def synthJpeg(id: Long): Array[Byte] = {
    val w = 4 + (id % 4).toInt
    val h = 2 + (id % 3).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val r = ((id * 7 + 3L * p + 2) % 256).toInt
      val g = ((id * 7 + 3L * p + 1) % 256).toInt
      val bl = ((id * 7 + 3L * p) % 256).toInt
      img.setRGB(p % w, p / w, (r << 16) | (g << 8) | bl)
      p += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    require(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG encoder")
    bos.toByteArray
  }

  /** Well-formed 24-bit BMP, width 4+id%4 (exercises row padding),
    * height 2+id%3, pixel p (row-major from the bottom, matching BMP
    * order) has B/G/R = (id*7 + 3p) mod 256 (+1, +2) — closed form
    * for the oracle.
    */
  case class ResizedMeta(outWidth: Int, outHeight: Int,
                         sumR: Long, sumG: Long, sumB: Long)

  /** 2×2 box-filter downsample over the raw BMP pixel rows: each
    * output pixel is the truncating integer mean of its 2×2 input
    * block, odd edge rows/columns dropped (floor semantics). Blocks
    * pair FILE rows (BMP stores bottom-up; pairing is identical
    * either way for even heights, and for odd heights the dropped
    * row is simply the last stored one — the spec the oracle
    * replays). Returns the resized dimensions and exact per-channel
    * sums of the output image, so a resampler regression (offset,
    * stride, channel swap, rounding) is hash-visible.
    */
  def bmpResizeBox(b: Array[Byte]): ResizedMeta = {
    val m = decodeBmp(b) // validates the container
    val dataOff = u32(b, 10).toInt
    val stride = ((m.width * 3 + 3) / 4) * 4
    val (ow, oh) = (m.width / 2, m.height / 2)
    def ch(rowOff: Int, c: Int, k: Int): Int = b(rowOff + 3 * c + k) & 0xff
    var (sr, sg, sb) = (0L, 0L, 0L)
    var by = 0
    while (by < oh) {
      val r0 = dataOff + (2 * by) * stride
      val r1 = dataOff + (2 * by + 1) * stride
      var bx = 0
      while (bx < ow) {
        val c0 = 2 * bx
        sb += (ch(r0, c0, 0) + ch(r0, c0 + 1, 0) + ch(r1, c0, 0) + ch(r1, c0 + 1, 0)) / 4
        sg += (ch(r0, c0, 1) + ch(r0, c0 + 1, 1) + ch(r1, c0, 1) + ch(r1, c0 + 1, 1)) / 4
        sr += (ch(r0, c0, 2) + ch(r0, c0 + 1, 2) + ch(r1, c0, 2) + ch(r1, c0 + 1, 2)) / 4
        bx += 1
      }
      by += 1
    }
    ResizedMeta(ow, oh, sr, sg, sb)
  }

  def synthBmp(id: Long): Array[Byte] = synthBmpShifted(id, 0)

  /** synthBmp re-rendered with a uniform +delta brightness shift
    * (mod 256 — wrap-around pixels are what flips the occasional
    * aHash bit in mm8's near-dup fixture).
    */
  def synthBmpShifted(id: Long, delta: Int): Array[Byte] = {
    val w = 4 + (id % 4).toInt
    val h = 2 + (id % 3).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val dataLen = stride * h
    val b = java.nio.ByteBuffer.allocate(54 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved, data offset
    b.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0) // planes, bpp, BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = 0
    while (row < h) {
      var c = 0
      while (c < w) {
        val p = row * w + c
        b.put((54 + row * stride + 3 * c).toInt, ((id * 7 + 3L * p + delta) % 256).toByte)
        b.put((54 + row * stride + 3 * c + 1).toInt, ((id * 7 + 3L * p + 1 + delta) % 256).toByte)
        b.put((54 + row * stride + 3 * c + 2).toInt, ((id * 7 + 3L * p + 2 + delta) % 256).toByte)
        c += 1
      }
      row += 1
    }
    b.array()
  }
}
