package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded min-k threshold aggregate over lexicographic (a, b) long
  * pairs — the scale-honest form of "first k per group" selection
  * (reference: router/throttler picks the first N attempts inside a
  * rate window, `router/throttler/factory.go`).
  *
  * A `row_number` window computes the same thing by SORTING every
  * group: one hot (event_type, minute) funnels its whole row set
  * through a single task. This aggregate instead keeps AT MOST k
  * pairs in its buffer, so Spark's partial aggregation caps per-group
  * state at k on EVERY mapper before the shuffle — the shuffle
  * carries k pairs per (group, mapper), never the rows. A hot minute
  * costs the same as a cold one.
  *
  * `finish` returns the k-th smallest pair (the admission threshold):
  * a row is among the first k of its group iff its pair is <= the
  * threshold — exact, because (ts, event_id) pairs are unique. Groups
  * smaller than k return their max pair, which admits every row.
  *
  * Buffer layout: flattened pairs `[a0,b0,a1,b1,...]`, sorted
  * lexicographically, length <= 2k. reduce/merge are a capped sorted
  * merge, so partial aggregation is exact and order-insensitive
  * (MinKSpec asserts merge(minK(A), minK(B)) == minK(A ++ B)).
  */
class MinKAggregator(k: Int)
    extends Aggregator[MinKAggregator.Pair, Array[Long], MinKAggregator.Pair] {
  import MinKAggregator.Pair

  override def zero: Array[Long] = Array.emptyLongArray

  private def lt(a1: Long, b1: Long, a2: Long, b2: Long): Boolean =
    a1 < a2 || (a1 == a2 && b1 < b2)

  private def mergeSorted(x: Array[Long], y: Array[Long]): Array[Long] = {
    val n = math.min(x.length + y.length, 2 * k)
    val out = new Array[Long](n)
    var i = 0; var j = 0; var o = 0
    while (o < n) {
      val takeX =
        j >= y.length || (i < x.length && !lt(y(j), y(j + 1), x(i), x(i + 1)))
      if (takeX) { out(o) = x(i); out(o + 1) = x(i + 1); i += 2 }
      else { out(o) = y(j); out(o + 1) = y(j + 1); j += 2 }
      o += 2
    }
    out
  }

  override def reduce(buf: Array[Long], in: Pair): Array[Long] = {
    // fast path: buffer full and the new pair is not below its max
    if (buf.length == 2 * k &&
        !lt(in.a, in.b, buf(buf.length - 2), buf(buf.length - 1))) buf
    else mergeSorted(buf, Array(in.a, in.b))
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    mergeSorted(x, y)

  override def finish(buf: Array[Long]): Pair =
    if (buf.isEmpty) Pair(Long.MaxValue, Long.MaxValue)
    else Pair(buf(buf.length - 2), buf(buf.length - 1))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Pair] = Encoders.product[Pair]
}

object MinKAggregator {
  /** Lexicographic (a, b) key pair — e.g. (event-time micros, event id). */
  case class Pair(a: Long, b: Long)
}
