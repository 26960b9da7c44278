package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSpec {

  test("native as-of join: tiny fixture matches hand semantics") {
    val sess = spark
    import sess.implicits._
    val ev = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 7L, 103L))
      .toDF("k", "t", "event_id")
    val ord = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 6L, 902L))
      .toDF("rk", "rt", "okey")
    val out = graft.plans.AsOfJoins.asof(ev, ord)
      .select(col("event_id"), col("okey"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(100L -> 900L, 101L -> 901L, 102L -> -1L, 103L -> -1L))
  }

  test("native as-of join: randomized fixtures match a naive reference join") {
    val sess = spark
    import sess.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 5).foreach { trial =>
      val evs = (0 until 200).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, 1000L + i))
      // rights unique per (key, ts) — the operator's determinism contract
      val ords = rnd.shuffle(
        (for (k <- 0L until 8L; t <- 0L until 50L) yield (k, t)).toList)
        .take(60).zipWithIndex.map { case ((k, t), i) => (k, t, 5000L + i) }
      val got = graft.plans.AsOfJoins.asof(
          evs.toDF("k", "t", "event_id"), ords.toDF("rk", "rt", "okey"))
        .select(col("event_id"), col("okey")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expected = evs.map { case (k, t, id) =>
        val c = ords.filter(o => o._1 == k && o._2 <= t)
        id -> (if (c.isEmpty) -1L else c.maxBy(_._2)._3)
      }.toMap
      assert(got === expected, s"trial $trial diverged from the naive reference")
    }
  }

  test("config-registered extensions serve the strategy and native functions") {
    // `spark.sql.extensions` is a STATIC conf — unreachable once the
    // shared test JVM holds a SparkContext — so the spec applies
    // GraftExtensions to a sibling session exactly the way startup
    // would, then restores the shared session.
    import org.apache.spark.sql.SparkSession
    val prev = spark
    try {
      val s2 = org.apache.spark.sql.GraftPlanProbe
        .sessionWithExtensions(prev, new graft.GraftExtensions()(_))
      SparkSession.setActiveSession(s2)
      SparkSession.setDefaultSession(s2)
      import s2.implicits._
      val out = graft.plans.AsOfJoins.asof(
          Seq((1L, 10L, 1L)).toDF("k", "t", "id"),
          Seq((1L, 5L, 7L)).toDF("rk", "rt", "v"))
        .select("v").collect()
      assert(out.head.getLong(0) === 7L)
      // injected native function resolves by name
      val fl = s2.sql("SELECT utf16_length('ab') AS n").collect().head.getInt(0)
      assert(fl === 2)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("native limit-per-group: fixture semantics (short groups, exact k, ties)") {
    val sess = spark
    import sess.implicits._
    val df = Seq(
      ("a", 3.0, 1L), ("a", 2.0, 2L), ("a", 2.0, 3L), ("a", 1.0, 4L),
      ("b", 9.0, 5L),
      ("c", 5.0, 6L), ("c", 5.0, 7L))
      .toDF("g", "v", "id")
    val out = graft.plans.LimitPerGroup
      .limitPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(out === Set(
      ("a", 3.0, 1L), ("a", 2.0, 2L), // k=2 under (v desc, id asc): tie broken by id
      ("b", 9.0, 5L),                 // short group passes whole
      ("c", 5.0, 6L), ("c", 5.0, 7L)))
  }

  test("native limit-per-group q28b equals the window formulation q28 on real data") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists())
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows("q28b_topk_native") === rows("q28_topk_per_group"))
  }

  test("native as-of join equals the union-trick window formulation on real data") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(sfDir).exists())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))
    val native = graft.SparkEntry.queries("q17b_asof_native")(spark, sfDir)
      .collect().map(key).toSet
    val union = graft.SparkEntry.queries("q17_asof_join")(spark, sfDir)
      .collect().map(key).toSet
    assert(native === union)
  }
}
