package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit pins for the relational family's helpers — currently the
  * wide-users stress (r16 item #6): the reference's users table
  * carries hundreds of trait columns, and the per-column
  * latest-non-null semantics must hold at width, not just on q11's
  * 3-column fixture.
  */
class RelationalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("usersWideOf at width 300: per-column latest-non-null, nulls never clobber") {
    val sess = spark
    import sess.implicits._
    // user 1: two events routed to trait_w005 (ids 5, 305) — the LATER
    // one has a NULL value, so the earlier non-null must survive; one
    // event on trait_w017; user 2 only touches trait_w000
    val events = Seq(
      (5L, ts("2024-01-01 10:00:00"), 1L, Option(11.0)),
      (305L, ts("2024-01-02 10:00:00"), 1L, None: Option[Double]),
      (17L, ts("2024-01-03 10:00:00"), 1L, Option(42.0)),
      (605L, ts("2024-01-04 10:00:00"), 1L, Option(99.0)), // 605 % 300 = 5: later non-null wins
      (600L, ts("2024-01-01 09:00:00"), 2L, Option(7.0))
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Relational.usersWideOf(events, 300)
    assert(out.columns.length === 301, "user_id + 300 trait columns")
    val rows = out.collect().map(r => r.getLong(r.fieldIndex("user_id")) -> r).toMap
    val u1 = rows(1L)
    assert(u1.getDouble(u1.fieldIndex("trait_w005")) === 99.0,
      "the latest NON-NULL value must win (the null event_id 305 is skipped)")
    assert(u1.getDouble(u1.fieldIndex("trait_w017")) === 42.0)
    assert(u1.isNullAt(u1.fieldIndex("trait_w018")),
      "untouched trait columns stay null")
    val u2 = rows(2L)
    assert(u2.getDouble(u2.fieldIndex("trait_w000")) === 7.0)
    assert(u2.isNullAt(u2.fieldIndex("trait_w005")))
  }

  test("usersWideOf ties on ts break by event_id, matching q11's ordering key") {
    val sess = spark
    import sess.implicits._
    val t = ts("2024-01-01 10:00:00")
    val events = Seq(
      (3L, t, 1L, Option(1.0)),
      (303L, t, 1L, Option(2.0)) // same ts, higher event_id: must win
    ).toDF("event_id", "ts", "user_id", "value")
    val out = Relational.usersWideOf(events, 300).collect().head
    assert(out.getDouble(out.fieldIndex("trait_w003")) === 2.0)
  }
}
