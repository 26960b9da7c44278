package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SPARSE/DENSE aggregation buffer for the HLL aggregators (the
  * HyperLogLog++ sparse-mode idea, Heule et al. 2013): a group that
  * has only seen a handful of ids carries a few (idx, rank) entries —
  * 3 bytes each — instead of the full 2^p register array. This is a
  * SCALE property, not an accuracy one: a minute-grain rollup in its
  * sparse regime (groups ≈ rows, e.g. a2d's (minute, workspace,
  * source, instance) table early in saturation) would otherwise push
  * group-count × 2^p bytes through partial aggregation and the
  * shuffle — the K=8 replica probe measured that as a 1.22 exponent
  * before this buffer (BENCH_SCALE r14). Registers after densify are
  * BIT-IDENTICAL to the always-dense form (the entry log keeps every
  * (idx, rank); densify takes the max), so estimates, stored sketch
  * bytes and the DuckDB oracle replays are unchanged.
  *
  * Layout: [tag 0][n: u16][(idx: u16, rank: u8) × n, capacity-padded]
  * — an append log (duplicate idx allowed, resolved at densify),
  * grown ×2 in place and switched to [tag 1][2^p registers] once n
  * reaches `switchEntries` (≈ 1.5 KB, under half the dense size).
  */
private[functions] object HllBuffer {
  val TagSparse: Byte = 0
  val TagDense: Byte = 1
  val switchEntries = 512

  def empty: Array[Byte] = new Array[Byte](3) // tag 0, n = 0

  private def n(b: Array[Byte]): Int = ((b(1) & 0xff) << 8) | (b(2) & 0xff)
  private def setN(b: Array[Byte], v: Int): Unit = {
    b(1) = (v >>> 8).toByte; b(2) = v.toByte
  }
  private def capacity(b: Array[Byte]): Int = (b.length - 3) / 3

  def densify(b: Array[Byte], m: Int): Array[Byte] =
    if (b(0) == TagDense) b
    else {
      val d = new Array[Byte](1 + m)
      d(0) = TagDense
      val cnt = n(b)
      var i = 0
      while (i < cnt) {
        val off = 3 + 3 * i
        val idx = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        val rank = b(off + 2)
        if (rank > d(1 + idx)) d(1 + idx) = rank
        i += 1
      }
      d
    }

  /** The raw 2^p register array (no tag) — the stored-sketch format. */
  def registers(b: Array[Byte], m: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(densify(b, m), 1, 1 + m)

  def add(b: Array[Byte], idx: Int, rank: Byte, m: Int): Array[Byte] =
    if (b(0) == TagDense) {
      if (rank > b(1 + idx)) b(1 + idx) = rank
      b
    } else {
      val cnt = n(b)
      if (cnt + 1 >= switchEntries) {
        val d = densify(b, m)
        if (rank > d(1 + idx)) d(1 + idx) = rank
        d
      } else {
        val t = if (cnt < capacity(b)) b
        else { // grow ×2 (at least 16 entries)
          val grown = new Array[Byte](3 + 3 * math.max(16, cnt * 2))
          System.arraycopy(b, 0, grown, 0, 3 + 3 * cnt)
          grown
        }
        val off = 3 + 3 * cnt
        t(off) = (idx >>> 8).toByte; t(off + 1) = idx.toByte; t(off + 2) = rank
        setN(t, cnt + 1)
        t
      }
    }

  def merge(a: Array[Byte], b: Array[Byte], m: Int): Array[Byte] =
    if (a(0) == TagDense && b(0) == TagDense) {
      var i = 1
      while (i <= m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    } else if (b(0) == TagDense) merge(b, a, m) // fold sparse a into dense b
    else {
      // b is sparse: replay its entry log into a
      var acc = a
      val cnt = n(b)
      var i = 0
      while (i < cnt) {
        val off = 3 + 3 * i
        val idx = ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
        acc = add(acc, idx, b(off + 2), m)
        i += 1
      }
      acc
    }
}

/** Mergeable HyperLogLog sketch as a typed Spark Aggregator — the
  * stored-sketch form of A2 tracked-users (reference:
  * enterprise/trackedusers/users_reporter.go:44-46,104-190 keeps
  * per-(workspace, source, idType) HLL sketch bytes so downstream
  * consumers can merge across reports; `approx_count_distinct` alone
  * cannot do that because Spark never exposes its internal buffer).
  *
  * Standard HLL (Flajolet et al.): 2^p byte registers, register index
  * from the top p bits of a 64-bit md5-derived hash, rank = leading
  * zeros of the remaining bits + 1, estimate = bias-corrected harmonic
  * mean with linear counting for the small range.
  *
  * The reduce/merge buffers are register-wise max, so partial
  * aggregation is exact: merge(sketch(A), sketch(B)) ==
  * sketch(A ∪ B) register-for-register — the property HllSpec asserts.
  * At 100 TB the shuffle carries at most 2^p bytes per group — and in
  * the sparse regime only the [[HllBuffer]] entry log — instead of
  * the distinct id set.
  */
class HllAggregator(p: Int = 12) extends Aggregator[String, Array[Byte], Long] {
  // HllBuffer's sparse entry log encodes the register index as u16 —
  // a p > 16 would silently truncate indices and corrupt the sketch,
  // so the documented domain is enforced at construction.
  require(p >= 4 && p <= 16, s"HLL precision p=$p outside [4, 16]")
  private val m = 1 << p

  private def hash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  override def zero: Array[Byte] = HllBuffer.empty

  override def reduce(buf: Array[Byte], value: String): Array[Byte] = {
    if (value == null) buf
    else {
      val h = hash64(value)
      val idx = (h >>> (64 - p)).toInt
      val rest = h << p
      val rank = (if (rest == 0L) 64 - p + 1
                  else java.lang.Long.numberOfLeadingZeros(rest) + 1).toByte
      HllBuffer.add(buf, idx, rank, m)
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    HllBuffer.merge(a, b, m)

  /** The densified raw registers of a buffer — what the stored-sketch
    * form persists and what HllSpec compares register-for-register.
    */
  def registersOf(buf: Array[Byte]): Array[Byte] = HllBuffer.registers(buf, m)

  override def finish(buf: Array[Byte]): Long =
    HllAggregator.estimate(registersOf(buf))

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

/** The registers-out form of HllAggregator — the FIRST-level report
  * writer persists these sketch BYTES (reference:
  * enterprise/trackedusers/users_reporter.go:104-190 marshals
  * hll.ToBytes() into tracked_users_reports rows) so a second-level
  * consumer can re-aggregate stored reports without the raw ids.
  * Identical register math to HllAggregator; only finish differs.
  */
class HllSketchAggregator(p: Int = 12) extends Aggregator[String, Array[Byte], Array[Byte]] {
  private val inner = new HllAggregator(p)
  override def zero: Array[Byte] = inner.zero
  override def reduce(buf: Array[Byte], value: String): Array[Byte] = inner.reduce(buf, value)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = inner.merge(a, b)
  // stored format is the PLAIN 2^p register array (no buffer tag), so
  // everything persisted before the sparse-buffer change — and every
  // DuckDB register replay — reads identically
  override def finish(buf: Array[Byte]): Array[Byte] = inner.registersOf(buf)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Second-level merge of STORED sketch bytes — the reporting
  * flusher's aggregator (reference:
  * enterprise/reporting/flusher/aggregator/tracked_users_inapp.go:40-108
  * decodes each row's hll bytes and Union()s them per key). Input is
  * a persisted register array, merge is register-wise max (exact:
  * merge(sketch(A), sketch(B)) == sketch(A ∪ B)), output the
  * bias-corrected estimate. State is 2^p bytes per group regardless
  * of how many stored reports merge — the property that makes the
  * second level as cheap as the first at 100 TB.
  */
class HllMergeAggregator(p: Int = 12) extends Aggregator[Array[Byte], Array[Byte], Long] {
  require(p >= 4 && p <= 16, s"HLL precision p=$p outside [4, 16]")
  private val m = 1 << p
  override def zero: Array[Byte] = new Array[Byte](m)
  override def reduce(buf: Array[Byte], value: Array[Byte]): Array[Byte] =
    if (value == null) buf else merge(buf, value)
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // a sketch row written at a different precision (or truncated in
    // transit) must surface as a clear error, not an out-of-bounds
    // throw mid-loop (shorter input) or a silent prefix-merge that
    // under-counts (longer input)
    require(b.length == m,
      s"HLL sketch length ${b.length} != expected $m (precision mismatch " +
        s"between sketch writer and merger, or corrupt stored sketch)")
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Byte]): Long = HllAggregator.estimate(buf)
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllAggregator {
  /** Bias-corrected HLL estimate with linear-counting small range.
    *
    * The harmonic-mean denominator is accumulated as an EXACT integer
    * (sum of 2^(64-reg), each register value <= 64), then converted to
    * double once. A double-accumulation loop would make the estimate
    * depend on register iteration order (the partial sums round), which
    * would break both partition-order determinism and the DuckDB oracle
    * mirror in Transforms (`a2c_tracked_users_sketch`) — there the same
    * numerator is a HUGEINT sum, so both sides round the identical
    * integer to double exactly once.
    */
  def estimate(registers: Array[Byte]): Long = {
    val m = registers.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSumNum = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < m) {
      invSumNum += BigInt(1) << (64 - registers(i))
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val invSum = invSumNum.toDouble / java.lang.Math.pow(2.0, 64)
    val raw = alpha * m * m / invSum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(corrected)
  }
}
