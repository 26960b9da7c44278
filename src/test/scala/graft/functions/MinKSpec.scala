package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** MinK invariants: the threshold equals the k-th smallest pair under
  * any partitioning of the input (partial aggregation is exact), the
  * buffer never exceeds k pairs (the bounded-shuffle claim d3 makes),
  * and the udaf surface agrees with a row_number window.
  */
class MinKSpec extends SparkSpec {
  import MinKAggregator.Pair

  private val k = 5
  private val agg = new MinKAggregator(k)

  private def fold(xs: Seq[Pair]) = xs.foldLeft(agg.zero)(agg.reduce)

  private def sorted(xs: Seq[Pair]) =
    xs.sortBy(p => (p.a, p.b))

  test("finish returns the k-th smallest pair; small groups return their max") {
    val rnd = new Random(7)
    val xs = Seq.fill(200)(Pair(rnd.nextInt(50).toLong, rnd.nextLong().abs))
    assert(agg.finish(fold(xs)) == sorted(xs)(k - 1))
    val small = xs.take(3)
    assert(agg.finish(fold(small)) == sorted(small).last)
    assert(agg.finish(agg.zero) == Pair(Long.MaxValue, Long.MaxValue))
  }

  test("merge of arbitrary splits equals the unsplit fold") {
    val rnd = new Random(11)
    val xs = Seq.fill(500)(Pair(rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong))
    val whole = fold(xs.distinct)
    for (cut <- Seq(1, 7, 250, 499)) {
      val (l, r) = xs.distinct.splitAt(cut)
      assert(agg.merge(fold(l), fold(r)).toSeq == whole.toSeq, s"cut $cut")
    }
  }

  test("buffer is bounded at k pairs") {
    val xs = (1 to 10000).map(i => Pair(i.toLong, i.toLong))
    assert(fold(xs).length == 2 * k)
    assert(agg.merge(fold(xs), fold(xs.reverse)).length == 2 * k)
  }

  test("udaf threshold matches row_number admission on a skewed frame") {
    val sess = spark
    import sess.implicits._
    val rnd = new Random(3)
    // one hot group (5000 rows), many cold ones
    val rows = (1 to 5000).map(i => ("hot", rnd.nextInt(100).toLong, i.toLong)) ++
      (1 to 50).map(i => (s"cold${i % 10}", i.toLong, (1000 + i).toLong))
    val df = rows.toDF("g", "ts_us", "id")
    val minK = udaf(agg)
    val viaAgg = df.groupBy($"g").agg(minK($"ts_us", $"id").as("thr"))
      .select($"g", $"thr.a", $"thr.b")
      .as[(String, Long, Long)].collect().map { case (g, a, b) => g -> ((a, b)) }.toMap
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val srt = rs.map(r => (r._2, r._3)).sorted
      g -> srt(math.min(k, srt.size) - 1)
    }
    assert(viaAgg == expected)
  }
}
