package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** a2d flusher invariants: the closed-form flush-window assignment
  * must equal a LITERAL replay of the reference's getRange loop
  * (flusher.go:232-259) — including on an hour-UNALIGNED corpus start
  * where the first two windows clamp to the hour boundary, the case
  * the sf data (which starts at midnight) never exercises.
  */
class FlusherSpec extends SparkSpec {

  private val MIN = 60000000L
  private val HALF = 1800000000L
  private val HOUR = 3600000000L

  /** The reference loop verbatim: start = previous end (first: min
    * pending), end = min(start + flushWindow, next hour boundary
    * strictly after start); flush while end <= endLimit.
    */
  private def getRangeReplay(minutes: Seq[Long]): Map[Long, Long] = {
    val lim = minutes.max + MIN - 600000000L
    var start = minutes.min
    val out = Map.newBuilder[Long, Long]
    var done = false
    while (!done) {
      val end = math.min(start + HALF, (start / HOUR + 1) * HOUR)
      if (end <= lim) {
        minutes.filter(t => t >= start && t < end).foreach(t => out += t -> start)
        start = end
      } else done = true
    }
    out.result()
  }

  private def closedForm(minutes: Seq[Long]): Map[Long, Long] = {
    val sess = spark
    import sess.implicits._
    Transforms.flushWindowed(minutes.toDF("reported_at_us"))
      .select("reported_at_us", "window_start_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("closed-form window assignment == getRange replay, hour-unaligned start") {
    // corpus starts at 00:47 — window 1 = [00:47, 01:00) (hour clamp),
    // window 2 = [01:00, 01:30) (full), then aligned half-hours; the
    // last 10 minutes sit inside the recent-exclusion window
    val base = 47L * MIN
    val minutes = (0L until 200L).map(i => base + i * 7L * MIN)
    val expected = getRangeReplay(minutes)
    assert(expected.nonEmpty && expected.values.toSet.size > 3,
      "fixture must span several windows")
    assert(expected.values.toSet.exists(_ % HALF != 0L),
      "fixture must contain an UNALIGNED window start")
    assert(closedForm(minutes) === expected)
  }

  test("closed-form window assignment == getRange replay, aligned start + exclusion tail") {
    val minutes = (0L until 90L).map(_ * MIN) // 90 straight minutes from 00:00
    val expected = getRangeReplay(minutes)
    // [00:00,00:30) and [00:30,01:00) flush; [01:00,01:30) would end at
    // 01:30 > lim = 01:30 - 10min + 1min -> excluded
    assert(expected.values.toSet === Set(0L, HALF))
    assert(closedForm(minutes) === expected)
  }

  /** The reference loop with its ACTUAL restart rule: each cycle's
    * start = min(pending reported_at) (getStart reads the store), so
    * after a data gap the next window opens UNALIGNED at the next
    * pending minute. On a dense corpus this agrees with
    * getRangeReplay; the divergence only appears past a >30-min gap.
    */
  private def getRangeReplayGapAware(minutes: Seq[Long]): Map[Long, Long] = {
    val lim = minutes.max + MIN - 600000000L
    var pending = minutes.sorted
    val out = Map.newBuilder[Long, Long]
    var done = false
    while (!done && pending.nonEmpty) {
      val start = pending.head // getStart: min pending, NOT previous end
      val end = math.min(start + HALF, (start / HOUR + 1) * HOUR)
      if (end <= lim) {
        val (in, rest) = pending.span(_ < end)
        in.filter(_ >= start).foreach(t => out += t -> start)
        pending = rest
      } else done = true
    }
    out.result()
  }

  test("density precondition: closed form == gap-aware replay on dense stores only") {
    // minute-dense corpus (a report at every minute, so min pending
    // == previous window end): the two replay rules and the closed
    // form all agree — the steady state of a continuously-reporting
    // service
    val dense = (0L until 200L).map(i => 47L * MIN + i * MIN)
    assert(getRangeReplayGapAware(dense) === getRangeReplay(dense))
    assert(closedForm(dense) === getRangeReplayGapAware(dense))

    // sparse corpus with a 75-min gap: the reference restarts the
    // post-gap window at the next pending minute (UNALIGNED), the
    // closed form bucket-aligns it — the documented divergence that
    // scopes flushWindowed to dense stores
    val gapped = (0L until 40L).map(_ * MIN) ++
      (0L until 120L).map(i => 115L * MIN + i * MIN)
    val ref = getRangeReplayGapAware(gapped)
    val cf = closedForm(gapped)
    assert(ref !== cf, "a >30-min gap must expose the density precondition")
    // the divergence is confined to alignment AFTER the gap: pre-gap
    // assignments agree, and the reference's post-gap window opens
    // unaligned at the next pending minute where the closed form
    // bucket-aligns it
    val post = 115L * MIN
    assert(ref.filter(_._1 < 40L * MIN) === cf.filter(_._1 < 40L * MIN),
      "pre-gap assignments must agree")
    assert(ref(post) === post, "reference opens the post-gap window at min pending")
    assert(cf(post) === (post / HALF) * HALF, "closed form bucket-aligns it")
  }

  test("every flushed window is within one hour and at most 30 minutes long") {
    val base = 13L * MIN
    val minutes = (0L until 300L).map(i => base + i * 3L * MIN)
    val sess = spark
    import sess.implicits._
    val rows = Transforms.flushWindowed(minutes.toDF("reported_at_us"))
      .select("window_start_us", "window_end_us").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (s0, e0) =>
      assert(e0 - s0 <= HALF, s"window [$s0,$e0) longer than the flush window")
      assert(s0 / HOUR === (e0 - 1) / HOUR, s"window [$s0,$e0) straddles an hour")
    }
  }
}
