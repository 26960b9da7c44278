package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Percentiles.exact must reproduce Spark's interpreted `percentile()`
  * (= DuckDB quantile_cont) BIT-FOR-BIT — it replaces it in
  * q37/q38/q26/a7/prof6 purely for bounded state, so any value drift
  * breaks the differential oracle.
  */
class PercentilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p10" -> 0.1, "p33" -> 0.33333333, "p50" -> 0.5,
    "p90" -> 0.9, "p0" -> 0.0, "p100" -> 1.0)

  /** exact() vs interpreted percentile() on the same grouped data. */
  private def check(rows: Seq[(String, Long)], width: Long): Unit = {
    val df = rows.toDF("k", "v").repartition(4)
    val got = Percentiles.exact(df, Seq("k"), "v", qs, width)
      .collect().map(r => r.getString(0) ->
        (qs.indices.map(i => r.getDouble(i + 1)), r.getLong(qs.size + 1))).toMap
    val aggExprs = qs.map { case (_, q) => expr(s"percentile(v, ${q}D)") } :+
      count(lit(1))
    val want = df.groupBy($"k").agg(aggExprs.head, aggExprs.tail: _*)
      .collect().map(r => r.getString(0) ->
        (qs.indices.map(i => r.getDouble(i + 1)), r.getLong(qs.size + 1))).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { k =>
      assert(got(k)._2 == want(k)._2, s"n_rows mismatch for $k")
      qs.indices.foreach { i =>
        val (g, w) = (got(k)._1(i), want(k)._1(i))
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(w),
          s"group $k ${qs(i)._1}: exact=$g percentile()=$w")
      }
    }
  }

  test("matches percentile() on random multi-group data with ties") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 3000).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong)
    }
    check(rows, width = 64L) // forces multi-bucket coarse stage
  }

  test("matches percentile() when a group has a single row") {
    check(Seq(("a", 7L), ("b", 1L), ("b", 9L), ("b", 9L)), width = 4L)
  }

  test("matches percentile() on heavy skew (one dominant value)") {
    val rows = Seq.fill(2000)(("s", 100L)) ++
      Seq(("s", 0L), ("s", 3L), ("s", 250L), ("s", 4095L))
    check(rows, width = 16L)
  }

  test("matches percentile() on wide-range sparse values") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(_ => ("w", math.abs(rnd.nextLong()) % 100000000L))
    check(rows, width = 4096L)
  }

  test("global (no-key) form returns one row; no cartesian product") {
    val df = (1L to 1000L).map(v => v * 3 % 997).toDF("v")
    val out = Percentiles.exact(df, Nil, "v", Seq("p90" -> 0.9), 64L)
    // the locate step IS a broadcast cross join — but against a 1-row
    // collect_list aggregate (ScaleGuard rule (b)'s sanctioned shape);
    // a CartesianProduct would mean the 1-row side regressed
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    val want = df.agg(expr("percentile(v, 0.9D)")).first().getDouble(0)
    val row = out.first()
    assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(want))
    assert(row.getLong(1) == 1000L)
  }

  test("matches percentile() when the value column contains NULLs") {
    // percentile() skips null inputs; exact() must too (the r11
    // advisor caught the null bucket inflating n_rows and shifting
    // every rank). A group of ONLY nulls yields a null percentile()
    // — exact() drops it, same as a dense-group join would.
    val rows: Seq[(String, java.lang.Long)] = Seq(
      ("a", 1L), ("a", null), ("a", 5L), ("a", null), ("a", 9L),
      ("a", 200L), ("b", null), ("b", 4L), ("c", null), ("c", null))
    val df = rows.toDF("k", "v").repartition(3)
    val got = Percentiles.exact(df, Seq("k"), "v", qs, 8L)
      .collect().map(r => r.getString(0) ->
        (qs.indices.map(i => r.getDouble(i + 1)), r.getLong(qs.size + 1))).toMap
    assert(got.keySet === Set("a", "b"), "all-null group must vanish")
    val aggExprs = qs.map { case (_, q) => expr(s"percentile(v, ${q}D)") } :+
      count($"v") // non-null count = exact()'s n_rows
    val want = df.filter($"v".isNotNull).select($"k").distinct()
      .join(df.groupBy($"k").agg(aggExprs.head, aggExprs.tail: _*), "k")
      .collect().map(r => r.getString(0) ->
        (qs.indices.map(i => r.getDouble(i + 1)), r.getLong(qs.size + 1))).toMap
    assert(got.keySet == want.keySet)
    got.keySet.foreach { k =>
      assert(got(k)._2 == want(k)._2, s"n_rows mismatch for $k")
      qs.indices.foreach { i =>
        val (g, w) = (got(k)._1(i), want(k)._1(i))
        assert(java.lang.Double.doubleToLongBits(g) ==
          java.lang.Double.doubleToLongBits(w),
          s"group $k ${qs(i)._1}: exact=$g percentile()=$w")
      }
    }
  }
}
