package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV / bottom-k theta) distinct sketch as a typed
  * Spark Aggregator — the mergeable set-operation companion to the
  * HLL register sketch (a2c/prof4): where HLL only estimates |A| and
  * |A ∪ B|, a KMV sketch supports INTERSECTION estimates because the
  * k smallest hashes of A ∪ B are computable from the two sketches
  * alone and the fraction of them present in both sketches estimates
  * the Jaccard similarity (Beyer et al., SIGMOD'07 "On synopses for
  * distinct-value estimation"; the DataSketches theta sketch is the
  * production form of the same idea).
  *
  * State is the ≤ k smallest DISTINCT hash values seen, kept sorted
  * ascending — bounded at 8·k bytes per group no matter the corpus,
  * and the reduce/merge pair is exactly a sorted-set union truncated
  * to k, so partial aggregation is lossless: merge(sk(A), sk(B)) ==
  * sk(A ∪ B) element-for-element. That determinism (the sketch
  * CONTENT is a pure function of the input SET, independent of
  * partitioning or arrival order) is what lets a plain rank-k SQL
  * oracle verify it value-for-value. At 100 TB the shuffle carries
  * k longs per group instead of the distinct id set.
  *
  * Estimator (with 32-bit hash domain D = 2^32, values in [0, D)):
  * full sketch → ndv ≈ (k−1)·D / h_(k); under-full → the sketch IS
  * the distinct set, ndv = |sketch|. Callers do that arithmetic in
  * the plan (integer DIV) so the whole output stays oracle-exact.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) buf // already in the sketch
    else {
      val ins = -i - 1
      if (buf.length >= k && ins >= k) buf // above the current kth min
      else {
        val out = new Array[Long](math.min(buf.length + 1, k))
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        if (ins < out.length - 1)
          System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-distinct two-pointer union, truncated at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          if (j < b.length && i < a.length && a(i) == b(j)) j += 1 // dedup
          val v = a(i); i += 1; v
        } else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
