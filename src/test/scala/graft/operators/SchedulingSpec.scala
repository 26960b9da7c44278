package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sch1/trk1 invariants beyond the differential gate: the reference's
  * own documented prevScheduledTime example, exclude-window boundary
  * exclusivity, and the planted-stuck tracker fixture.
  */
class SchedulingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def sch() = graft.SparkEntry.queries("sch1_upload_scheduling")(spark, sfDir)

  test("prevScheduledTime: the 3h-from-13:00 example (scheduling.go doc comment)") {
    // marks: 01:00 04:00 07:00 10:00 13:00 16:00 19:00 22:00.
    // 18:00 -> 16:00 same day; 00:30 -> 22:00 PREVIOUS day.
    val sess = spark
    import sess.implicits._
    val rows = Seq(
      (1440L * 10 + 18 * 60, 0L),  // day 10, 18:00
      (1440L * 10 + 30, 0L))       // day 10, 00:30
      .toDF("now_min", "t_idx")
      .withColumn("freq_min", lit(180L)).withColumn("start_min", lit(780L))
      .withColumn("cm", expr("now_min % 1440"))
      .withColumn("day0", expr("now_min - cm"))
      .withColumn("prev_sched", expr(
        """CASE WHEN cm >= start_min % freq_min
            THEN day0 + start_min % freq_min
              + ((cm - start_min % freq_min) DIV freq_min) * freq_min
            ELSE day0 + start_min
              + ((1439 - start_min) DIV freq_min) * freq_min - 1440 END"""))
      .select("now_min", "prev_sched").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(1440L * 10 + 18 * 60) === 1440L * 10 + 16 * 60)
    assert(rows(1440L * 10 + 30) === 1440L * 9 + 22 * 60)
  }

  test("sch1: every decision arm fires on the fixture, boundaries are exclusive") {
    val rows = sch().collect()
    val verdicts = rows.map(_.getString(3)).toSet
    assert(verdicts === Set("allow:forced", "allow:triggered",
      "deny:manual_sync", "allow:freq", "deny:freq_exceeded",
      "deny:exclude_window", "allow:scheduled", "deny:before_scheduled"),
      s"arms missing or extra: $verdicts")
    // cfg 6's exclude window (309, 547) is boundary-EXCLUSIVE: a now
    // landing exactly on either edge must fall through to scheduling
    rows.filter(r => r.getLong(0) == 6L).foreach { r =>
      val cm = r.getLong(1) % 1440
      if (cm == 309L || cm == 547L)
        assert(r.getString(3) != "deny:exclude_window",
          s"boundary minute $cm must not be inside the window")
      if (cm > 309L && cm < 547L)
        assert(r.getString(3) === "deny:exclude_window")
    }
  }

  test("sch1: prev_sched is always a scheduled mark at or before now") {
    sch().filter(col("prev_sched").isNotNull).collect().foreach { r =>
      val (now, prev) = (r.getLong(1), r.getLong(2))
      assert(prev <= now, "prev scheduled time must not be in the future")
      assert(now - prev < 1440 + 180, "prev must be within a day + one period")
    }
  }

  test("trk1: disabled and exclude-window warehouses are skipped; the planted " +
    "no-uploads warehouse is stuck when probed") {
    val rows = graft.SparkEntry.queries("trk1_sync_stuck")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.get(3)), Option(r.get(5))))).toMap
    assert(!rows(3L)._1 && rows(3L)._3.isEmpty, "disabled wh 3 must be skipped")
    assert(!rows(5L)._1 && rows(5L)._3.isEmpty, "excluded wh 5 must be skipped")
    // wh 4 has NO uploads by construction: probed -> missing = 1
    val (tracked4, probe4, missing4) = rows(4L)
    assert(tracked4)
    if (probe4.nonEmpty)
      assert(missing4.contains(1L), "a probed warehouse with no uploads is stuck")
  }
}
