package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** KMV sketch invariants: the sketch is a pure function of the input
  * SET (dedup, order- and partition-independence — what lets kmv1/
  * kmv2's rank-k SQL oracle check it value-for-value), the buffer
  * never exceeds k values, merge is exact (sk(A) ⊎ sk(B) == sk(A∪B)),
  * and the estimator lands within the (k−1)/√k KMV error envelope.
  */
class KmvSpec extends SparkSpec {

  private val k = 64
  private val agg = new KmvAggregator(k)

  private def fold(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)

  test("sketch is the k smallest distinct values, sorted") {
    val rnd = new Random(3)
    val xs = Seq.fill(5000)(rnd.nextLong() & 0xffffffffL)
    val expect = xs.distinct.sorted.take(k)
    assert(fold(xs).toSeq == expect)
    assert(fold(rnd.shuffle(xs)).toSeq == expect) // order-independent
    assert(fold(xs ++ xs).toSeq == expect)        // set semantics
  }

  test("under-full sketch IS the distinct set") {
    val xs = Seq(9L, 2L, 9L, 5L, 2L)
    assert(fold(xs).toSeq == Seq(2L, 5L, 9L))
  }

  test("merge of arbitrary splits equals the unsplit fold, size ≤ k") {
    val rnd = new Random(17)
    val xs = Seq.fill(3000)(rnd.nextLong() & 0xffffffffL)
    val whole = fold(xs)
    assert(whole.length == k)
    for (cut <- Seq(1, 13, 1500, 2999)) {
      val (l, r) = xs.splitAt(cut)
      assert(agg.merge(fold(l), fold(r)).toSeq == whole.toSeq, s"cut $cut")
    }
    assert(agg.merge(agg.zero, whole).toSeq == whole.toSeq)
    assert(agg.merge(whole, agg.zero).toSeq == whole.toSeq)
  }

  test("estimator within the KMV envelope at 20k distinct") {
    val rnd = new Random(29)
    val n = 20000
    val hs = (1 to n).map(_ => rnd.nextLong() & 0xffffffffL).distinct
    val sk = fold(hs)
    val est = (k - 1).toLong * 4294967296L / sk.last
    // standard error ≈ n/√(k−2); allow 4 sigma
    assert(math.abs(est - hs.length) < 4.0 * hs.length / math.sqrt(k - 2.0),
      s"estimate $est vs ${hs.length}")
  }

  test("udaf over a partitioned DataFrame matches the rank-k window") {
    import spark.implicits._
    val rnd = new Random(41)
    val rows = Seq.fill(2000)((rnd.nextInt(3).toString, rnd.nextLong() & 0xffffffffL))
    val df = rows.toDF("g", "hv").repartition(7)
    val kmv = udaf(new KmvAggregator(k))
    val got = df.groupBy($"g").agg(kmv($"hv").as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val expect = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(k)
    }
    assert(got == expect)
  }
}
