package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Boundary semantics of the behavioral-analytics operators, driven
  * through the real `Sessions.defs` plans over synthetic events/orders
  * parquet written to a temp sfDir. events.ts is written as raw
  * nanosecond longs — the round-1..8 driver encoding — which ALSO
  * keeps the events loader's legacy LongType branch covered now that
  * the real testdata ships timestamp[us] (see Tables.events).
  */
class SessionsSpec extends SparkSpec {

  private val us = 1000L // ns per us
  private def minUs(m: Long): Long = m * 60L * 1000000L

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos — pins the loader's legacy branch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  /** Writes events (and optionally orders) parquet into a fresh temp
    * sfDir; event tuples are (event_id, ts_us, user_id, type, value).
    */
  private def sfDirWith(
      events: Seq[(Long, Long, Long, String, Double)],
      orders: Seq[(Long, Long, Double, Long)] = Nil): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sessions").toString
    val evRows = events.map { case (id, tsUs, uid, tpe, v) =>
      Row(id, tsUs * us, uid, tpe, v, "{}")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(evRows, 2), eventsSchema)
      .write.parquet(s"$dir/events.parquet")
    val ordRows = orders.map { case (okey, ckey, price, tsUs) =>
      Row(okey, ckey, "O", price, new java.sql.Timestamp(tsUs / 1000L), "1-URGENT")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(ordRows, 1), ordersSchema)
      .write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("sessionize: a gap of exactly 30 minutes continues the session; one more microsecond breaks it") {
    val t0 = minUs(1000)
    val dir = sfDirWith(Seq(
      (1L, t0, 7L, "view", 1.0),
      (2L, t0 + minUs(30), 7L, "view", 1.0), // exactly the gap: same session
      (3L, t0 + minUs(60) + 1, 7L, "view", 1.0))) // gap + 1us: new session
    val out = Sessions.defs("q16_sessionize")(spark, dir)
      .orderBy("sess_no").collect()
    assert(out.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L))
    assert(out.head.getAs[Long]("session_end_us") == t0 + minUs(30))
  }

  test("sessionize: sessions are per-user islands numbered from 1") {
    val t0 = minUs(5000)
    val dir = sfDirWith(Seq(
      (1L, t0, 1L, "view", 2.0),
      (2L, t0 + minUs(90), 1L, "view", 3.0),
      (3L, t0, 2L, "view", 5.0)))
    val out = Sessions.defs("q16_sessionize")(spark, dir).collect()
    assert(out.length == 3) // two sessions for user 1, one for user 2
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L).map(_.getAs[Long]("sess_no")).sorted
    assert(u1.toSeq == Seq(1L, 2L))
    assert(out.filter(_.getAs[Long]("user_id") == 2L).head.getAs[Double]("sum_value") == 5.0)
  }

  test("asof join: most recent at-or-before order wins; no prior order gives nulls; date ties pick max orderkey") {
    val t = minUs(2000000)
    val dir = sfDirWith(
      events = Seq(
        (1L, t - minUs(10), 3L, "view", 1.0), // before any order -> nulls
        (2L, t, 3L, "view", 1.0), // exactly at order date -> that order (<= contract)
        (3L, t + minUs(500), 3L, "view", 1.0)), // after both -> latest
      orders = Seq(
        (100L, 3L, 11.0, t),
        (101L, 3L, 22.0, t), // same date: max orderkey (101) must win
        (200L, 3L, 33.0, t + minUs(100))))
    val out = Sessions.defs("q17_asof_join")(spark, dir)
      .orderBy("event_id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("o_orderkey")))
    assert(out(1).getAs[Long]("o_orderkey") == 101L)
    assert(out(1).getAs[Double]("o_totalprice") == 22.0)
    assert(out(2).getAs[Long]("o_orderkey") == 200L)
  }

  test("funnel: stages must be strictly ordered in time; out-of-order or equal timestamps do not advance") {
    val t = minUs(9000)
    val dir = sfDirWith(Seq(
      // user 1: view BEFORE signup, purchase after signup but with no
      // qualifying view in between -> funnel stops at signup
      (1L, t - minUs(5), 1L, "view", 0.0),
      (2L, t, 1L, "signup", 0.0),
      (3L, t + minUs(1), 1L, "purchase", 0.0),
      // user 2: full path, but the view shares the signup timestamp ->
      // strict > rejects it; the later view counts
      (4L, t, 2L, "signup", 0.0),
      (5L, t, 2L, "view", 0.0),
      (6L, t + minUs(2), 2L, "view", 0.0),
      (7L, t + minUs(3), 2L, "purchase", 0.0)))
    val out = Sessions.defs("q18_funnel")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("t_signup") == t)
    assert(out(1L).isNullAt(out(1L).fieldIndex("t_view")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("t_purchase")))
    assert(out(2L).getAs[Long]("t_view") == t + minUs(2))
    assert(out(2L).getAs[Long]("t_purchase") == t + minUs(3))
  }

  test("cohort retention: the offset-0 cell counts every user of the cohort") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val df = Sessions.defs("q19_cohort_retention")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    // every user appears in exactly one cohort, and always in its own offset-0 cell
    val offset0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(offset0 == users)
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0L))
  }

  test("q25 interval join: bucketized equi-join matches the naive driver-side range join") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val sfDir001 = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val events = graft.Tables.events(spark, sfDir001)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // purchases open the [ts, ts+7d) windows — same derivation as the operator
    val windows = events.filter(_._3 == "purchase")
      .map { case (eid, uid, _, ts) => (uid, eid, ts) }
    val byUser = windows.groupBy(_._1)
    val expected = events.flatMap { case (eid, uid, _, ts) =>
      val hits = byUser.getOrElse(uid, Array.empty[(Long, Long, Long)])
        .filter { case (_, _, st) => ts >= st && ts < st + 7L * dayUs }
      if (hits.isEmpty) None
      else Some(eid -> ((hits.length.toLong, hits.map(_._2).min)))
    }.toMap
    // structurally nonempty: every purchase matches at least itself, so the
    // equivalence below can never be a vacuous empty-vs-empty comparison
    // (the r12 verdict caught exactly that with orders-derived intervals)
    assert(expected.nonEmpty, "event-time windows must produce matches at sf0.001")
    val got = Sessions.defs("q25_interval_join")(spark, sfDir001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected,
      "the day-bucket decomposition must reproduce the exact range-join match set")
  }

  test("q52 interval overlap: single-bucket attribution counts each overlapping pair exactly once") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val sfDir001 = "/root/testdata/sf0.001"
    val dayUs = 86400000000L
    val events = graft.Tables.events(spark, sfDir001)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val purchases = events.filter(_._3 == "purchase")
      .map { case (eid, uid, _, ts) => (eid, uid, ts, ts + 3L * dayUs) }
    val signups = events.filter(_._3 == "signup")
      .map { case (eid, uid, _, ts) => (eid, uid, ts, ts + 1L * dayUs) }
      .groupBy(_._2)
    // literal theta join: s1 < e2 && s2 < e1, same user
    val expected = purchases.flatMap { case (pid, uid, s1, e1) =>
      val hits = signups.getOrElse(uid, Array.empty[(Long, Long, Long, Long)])
        .filter { case (_, _, s2, e2) => s1 < e2 && s2 < e1 }
      if (hits.isEmpty) None
      else Some(pid -> ((hits.length.toLong, hits.map(_._1).min)))
    }.toMap
    // multi-bucket overlaps must exist, or the dedup trick is untested:
    // some pair must share >= 2 day buckets (any signup inside a
    // purchase window does, both covering the signup's bucket + next)
    val multi = purchases.exists { case (_, uid, s1, e1) =>
      signups.getOrElse(uid, Array.empty[(Long, Long, Long, Long)])
        .exists { case (_, _, s2, e2) =>
          s1 < e2 && s2 < e1 &&
            (math.min(e1, e2) - 1) / dayUs > math.max(s1, s2) / dayUs }
    }
    assert(expected.nonEmpty, "overlaps must exist at sf0.001")
    assert(multi, "fixture must contain a pair sharing multiple buckets")
    val got = Sessions.defs("q52_interval_overlap")(spark, sfDir001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected,
      "bucketized overlap join must equal the naive theta join with no double counting")
  }

  test("q53 incremental sessionize: fusions are exercised and the merge equals full recompute") {
    assume(new java.io.File("/root/testdata/sf0.001").exists())
    val sfDir001 = "/root/testdata/sf0.001"
    val splitUs = 1705708800000000L
    val gapUs = 86400000000L
    val events = graft.Tables.events(spark, sfDir001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the fusion branch must be live: some user's last stored event and
    // first delta event close the gap across the boundary (the q25
    // lesson — a structurally dead branch makes the differential hollow)
    val fusedUsers = events.groupBy(_._1).count { case (_, evs) =>
      val before = evs.filter(_._3 < splitUs).map(_._3)
      val after = evs.filter(_._3 >= splitUs).map(_._3)
      before.nonEmpty && after.nonEmpty && after.min - before.max <= gapUs
    }
    assert(fusedUsers > 0, "fixture must fuse at least one boundary session")
    // literal full sessionization driver-side
    val expected = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      val islands = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Long)]]) {
        case (acc, e) =>
          if (acc.nonEmpty && e._3 - acc.last.last._3 <= gapUs)
            acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
      }
      islands.map(i => (uid, i.head._3) -> ((i.last._3, i.length.toLong)))
    }.toMap
    val got = Sessions.defs("q53_incremental_sessionize")(spark, sfDir001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected,
      "incremental boundary merge must equal the from-scratch sessionization")
  }

  test("a9 EWMA: a planted 10x hour is flagged, the recovered baseline absorbs it") {
    val hourUs = 3600000000L
    val counts = Seq(10, 10, 10, 100, 10, 10)
    val evs = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i =>
        ((h * 1000 + i).toLong, h * hourUs + i, 1L, "view", 1.0))
    }
    val dir = sfDirWith(evs)
    val out = Sessions.defs("a9_ewma_spikes")(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L) === ((10L, -1L, false)), "series head has no baseline")
    assert(out(3L) === ((100L, 10000L, true)), "10x the carried baseline must flag")
    assert(out(4L) === ((10L, 32500L, false)),
      "post-spike baseline (3*10000 + 100000)/4 absorbs the spike")
    assert(out.values.count(_._3) === 1, "exactly one spike in the series")
  }

  test("a10 Holt: a linear ramp never spikes (the trend term a9 lacks), a plateau break does") {
    val hourUs = 3600000000L
    // steady 10%-per-hour growth, then a genuine 10x break at hour 6
    val counts = Seq(100, 110, 120, 130, 140, 150, 1500)
    val evs = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i =>
        ((h * 1000 + i).toLong, h * hourUs + i, 1L, "view", 1.0))
    }
    val dir = sfDirWith(evs)
    val out = Sessions.defs("a10_holt_winters")(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(0L)._2 === -1L, "series head has no forecast")
    assert((1L to 5L).forall(h => !out(h)._3),
      s"the ramp must never spike under a trend-aware forecast: $out")
    assert(out(6L)._3, "the 10x plateau break must still flag")
    // the learned positive trend shows up as strictly growing
    // carried forecasts along the ramp
    val fs = (1L to 6L).map(h => out(h)._2)
    assert(fs == fs.sorted && fs.distinct == fs,
      s"forecasts must strictly increase along the ramp, got $fs")
  }

  test("q41 Kaplan-Meier: hand-computed survival with censoring") {
    val dayUs = 86400000000L
    // u1: seen d0, purchase d1 (t=1); u2: seen d0, never (censored at
    // horizon 3 -> t=3); u3: purchase immediately (t=0); u4: seen d1,
    // purchase d3 (t=2). KM: S(0)=3/4, S(1)=1/2, S(2)=1/4, S(3)=1/4.
    val dir = sfDirWith(Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, dayUs, 1L, "purchase", 1.0),
      (3L, 0L, 2L, "view", 1.0),
      (4L, 0L, 3L, "purchase", 1.0),
      (5L, dayUs, 4L, "view", 1.0), (6L, 3 * dayUs, 4L, "purchase", 1.0)))
    val out = Sessions.defs("q41_survival_km")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(
      0L -> ((4L, 1L, 0L, 750000L)),
      1L -> ((3L, 1L, 0L, 500000L)),
      2L -> ((2L, 1L, 0L, 250000L)),
      3L -> ((1L, 0L, 1L, 250000L))))
  }

  test("percentiles: interpolation matches the closed form on a known distribution") {
    val t = minUs(100)
    // values 1..5 for one event type: p50 = 3, p95 = 1 + 0.95*4 = 4.8
    val dir = sfDirWith((1L to 5L).map(i => (i, t + minUs(i), 1L, "view", i.toDouble)))
    val r = Sessions.defs("a7_value_percentiles")(spark, dir).collect().head
    assert(r.getAs[Double]("p50") == 3.0)
    assert(math.abs(r.getAs[Double]("p95") - 4.8) < 1e-12)
    assert(r.getAs[Long]("n") == 5L)
  }
}
