package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Warehouse upload scheduling + cron sync tracking (reference:
  * warehouse/router/scheduling.go:28-196, router.go:673-693,
  * tracker.go:56-160) — the control-plane calendar arithmetic that
  * decides WHEN the heavy load paths (L1-L12) run. Both operators are
  * pure integer calendar algebra over (config × time) state, so the
  * whole decision tree is one declarative expression both engines
  * evaluate bit-identically; nothing here ever touches event-grain
  * data, which is exactly why it stays cheap at any corpus size.
  */
object Scheduling {

  /** canCreateUpload's decision tree, interpolated once per dialect
    * ($div = integer floor division on non-negative operands: Spark
    * `DIV`, DuckDB `//` — both truncate toward zero, and every
    * dividend below is non-negative so truncation IS floor).
    * Columns in scope: always_f/triggered_f/manual_f/ignore_f
    * booleans, freq_min/start_min/excl_s/excl_e nullable minutes,
    * now_min epoch minutes, last_upload_min/marker_min nullable.
    *
    * Rule order is the reference's: forced → triggered → manual sync
    * block → syncFreqIgnore (frequency debounce at the DEFAULT 30 min
    * — uploadFrequencyExceeded is called with "" there) → exclude
    * window (boundary-EXCLUSIVE, with the two midnight-wrap cases) →
    * unset freq/startAt (frequency debounce at freq or default) →
    * prevScheduledTime vs last upload (strictly Before allows).
    */
  private def schedExprs(div: String): Seq[(String, String)] = Seq(
    "cm" -> "now_min % 1440",
    "day0" -> "now_min - cm",
    // scheduledTimes: marks = start ± k·freq clipped to [0, 1440);
    // smallest = start % freq, largest = start + ((1439-start) div
    // freq)·freq; prev = floor-snap of cm, else prev day's largest
    "prev_sched" -> s"""CASE WHEN freq_min IS NOT NULL AND start_min IS NOT NULL THEN
        day0 + (CASE WHEN cm >= start_min % freq_min
          THEN start_min % freq_min
            + ((cm - start_min % freq_min) $div freq_min) * freq_min
          ELSE start_min + ((1439 - start_min) $div freq_min) * freq_min
            - 1440 END)
        END""",
    "in_excl" -> """excl_s IS NOT NULL AND excl_e IS NOT NULL AND (
        (excl_s < cm AND cm < excl_e) OR
        (excl_s > excl_e AND ((excl_s > cm AND cm < excl_e) OR
                              (excl_s < cm AND cm > excl_e))))""",
    "verdict" -> """CASE
        WHEN always_f THEN 'allow:forced'
        WHEN triggered_f THEN 'allow:triggered'
        WHEN manual_f THEN 'deny:manual_sync'
        WHEN ignore_f THEN CASE
          WHEN marker_min IS NULL OR now_min - marker_min > 30
          THEN 'allow:freq' ELSE 'deny:freq_exceeded' END
        WHEN in_excl THEN 'deny:exclude_window'
        WHEN freq_min IS NULL OR start_min IS NULL THEN CASE
          WHEN marker_min IS NULL
            OR now_min - marker_min > COALESCE(freq_min, 30)
          THEN 'allow:freq' ELSE 'deny:freq_exceeded' END
        WHEN last_upload_min IS NULL OR last_upload_min < prev_sched
          THEN 'allow:scheduled'
        ELSE 'deny:before_scheduled' END""")

  /** The 9-config fixture: one row per decision-tree arm, including
    * the 3h-from-13:00 example the reference documents, a same-day
    * and a midnight-wrapping exclude window, and both unset-config
    * frequency-debounce arms.
    * (cfg_id, always, triggered, manual, ignore, freq, start,
    * excl_s, excl_e)
    */
  private val configs: Seq[(Long, Boolean, Boolean, Boolean, Boolean,
    Option[Long], Option[Long], Option[Long], Option[Long])] = Seq(
    (1L, true, false, false, false, None, None, None, None),
    (2L, false, true, false, false, None, None, None, None),
    (3L, false, false, true, false, None, None, None, None),
    (4L, false, false, false, true, Some(180L), Some(780L), None, None),
    (5L, false, false, false, false, Some(180L), Some(780L), None, None),
    (6L, false, false, false, false, Some(180L), Some(780L), Some(309L), Some(547L)),
    (7L, false, false, false, false, None, None, None, None),
    (8L, false, false, false, false, Some(60L), Some(30L), Some(1329L), Some(547L)),
    (9L, false, false, false, false, Some(45L), None, None, None))

  private val configsSqlValues: String = configs.map { case (id, a, t, m, i, f, st, es, ee) =>
    def n(o: Option[Long]) = o.map(_.toString).getOrElse("NULL")
    s"($id, $a, $t, $m, $i, ${n(f)}, ${n(st)}, ${n(es)}, ${n(ee)})"
  }.mkString(", ")

  val defs: Map[String, Q] = Map(

    // SCH1: UPLOAD SYNC SCHEDULING GATE (scheduling.go:28-196) — the
    // full canCreateUpload decision tree over the 9-arm config
    // fixture × 78 scale-free candidate clock times (distinct
    // o_orderkey % 78 spread over ~2 days at 37-min steps, with
    // hash-staggered last-upload and job-marker ages so every arm
    // lands on both sides of its threshold — including the strict-">"
    // boundary of the 30-min frequency debounce and the exact
    // prev-scheduled minute). One broadcast cross join, zero
    // shuffles past it: the gate is (warehouses × 1) work at any
    // scale, evaluated here at fixture width for oracle coverage.
    "sch1_upload_scheduling" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val cfg = configs.toDF("cfg_id", "always_f", "triggered_f", "manual_f",
        "ignore_f", "freq_min", "start_min", "excl_s", "excl_e")
      val times = Tables.orders(s, dir)
        .select((col("o_orderkey") % 78).as("t_idx")).distinct()
        .withColumn("now_min", lit(1000000L) + col("t_idx") * 37)
        .withColumn("last_upload_min",
          expr("CASE WHEN t_idx % 3 = 0 THEN NULL " +
            "ELSE now_min - (t_idx % 5) * 90 END"))
        .withColumn("marker_min",
          expr("CASE WHEN t_idx % 4 = 0 THEN NULL " +
            "ELSE now_min - (t_idx % 7) * 10 END"))
      schedExprs("DIV").foldLeft(times.crossJoin(broadcast(cfg))) {
        case (df, (name, e)) => df.withColumn(name, expr(e))
      }.select(col("cfg_id"), col("now_min"), col("prev_sched"), col("verdict"))
    }),

    // TRK1: CRON SYNC-STUCK TRACKER (tracker.go:56-160) — the
    // upload-grain sibling of dq5's freshness SLA: per warehouse,
    // take the LATEST staging file (max id, its created_at) inside
    // the probe window (now − 2·tw, now − tw) where tw =
    // uploadBufferTime (180 min) + syncFrequency, then ask whether
    // any upload reached exported_data / aborted / *_failed AFTER
    // that file landed. No qualifying upload = the sync is stuck
    // (missing = 1). Disabled warehouses and those inside their
    // exclude window are skipped (missing NULL), as is a warehouse
    // with nothing in the probe window. Staging = events keyed
    // wh = user_id % 6; uploads = an event slice restricted to
    // warehouses 0-2, so 4 is the PLANTED STUCK candidate whenever
    // its probe lands. Plan: one global max (broadcast scalar), one
    // filtered max_by aggregation, one key+time-predicate join —
    // map-side combinable at any staging-table size.
    "trk1_sync_stuck" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      val staging = Tables.events(s, dir).select(
        (col("user_id") % 6).as("wh"), col("event_id").as("id"),
        expr("unix_micros(ts) DIV 60000000").as("created_min"))
      val uploads = Tables.events(s, dir)
        .filter(col("event_id") % 11 === 0 && col("user_id") % 6 <= 2)
        .select((col("user_id") % 6).as("wh"),
          expr("CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 'exported_data' " +
            "WHEN 1 THEN 'aborted' WHEN 2 THEN 'exporting_data_failed' " +
            "WHEN 3 THEN 'waiting' ELSE 'exporting_data' END").as("status"),
          expr("unix_micros(ts) DIV 60000000 + (event_id % 7) * 30")
            .as("updated_min"))
      val wh = Seq(
        (0L, true, None: Option[Long], None: Option[Long], None: Option[Long]),
        (1L, true, Some(120L), None, None),
        (2L, true, Some(240L), None, None),
        (3L, false, None, None, None),
        (4L, true, Some(120L), None, None),
        (5L, true, Some(240L), Some(0L), Some(1439L)))
        .toDF("wh", "enabled", "freq_min", "excl_s", "excl_e")
      val nowDf = staging.agg((max(col("created_min")) + 1).as("now_min"))
      val probes = staging.crossJoin(broadcast(nowDf))
        .join(broadcast(wh.select(col("wh"), col("freq_min"))), Seq("wh"))
        .withColumn("tw", coalesce(col("freq_min"), lit(0L)) + 180L)
        .filter(col("created_min") > col("now_min") - col("tw") * 2 &&
          col("created_min") < col("now_min") - col("tw"))
        .groupBy(col("wh"))
        .agg(expr("max_by(created_min, id)").as("probe_created_min"))
      val exists = probes.join(uploads.filter(
            col("status").isin("exported_data", "aborted") ||
              col("status").endsWith("_failed")),
          Seq("wh"), "left")
        .withColumn("hit",
          when(col("updated_min") > col("probe_created_min"), 1L).otherwise(0L))
        .groupBy(col("wh"), col("probe_created_min"))
        .agg((sum(col("hit")) > 0L).as("upload_exists"))
      wh.crossJoin(broadcast(nowDf))
        .withColumn("cm", col("now_min") % 1440)
        .withColumn("in_excl", expr(
          """excl_s IS NOT NULL AND excl_e IS NOT NULL AND (
            (excl_s < cm AND cm < excl_e) OR
            (excl_s > excl_e AND ((excl_s > cm AND cm < excl_e) OR
                                  (excl_s < cm AND cm > excl_e))))"""))
        .withColumn("tracked", col("enabled") && !col("in_excl"))
        .join(exists, Seq("wh"), "left")
        .select(col("wh"), col("enabled"), col("tracked"),
          when(col("tracked"), col("probe_created_min")).as("probe_created_min"),
          when(col("tracked"), col("upload_exists")).as("upload_exists"),
          when(!col("tracked") || col("probe_created_min").isNull, lit(null))
            .when(coalesce(col("upload_exists"), lit(false)), 0L).otherwise(1L)
            .cast("long").as("missing"))
    })
  )

  /** trk1's per-warehouse streaming state: the newest staging file
    * seen (id-ordered, the getOldestStagingFile probe picks by max
    * id) and the newest QUALIFYING upload completion time.
    */
  case class SyncState(probeId: Long, probeCreatedMin: Long, lastUploadMin: Long)

  /** One tagged record per input event: a staging-file landing
    * (kind = 's') or an upload status transition (kind = 'u').
    */
  case class SyncEvent(wh: Long, kind: String, id: Long,
                       timeMin: Long, status: String)

  /** trk1's STREAMING sibling — the cron tracker as a continuous
    * query instead of a scheduled scan (tracker.go's RunCronTracker
    * loop): staging-file landings and upload transitions arrive as
    * one tagged stream, state per warehouse is TWO timestamps + an id
    * (O(1) forever, the property that lets this run as a resident
    * monitor at any staging volume), and each trigger emits the
    * warehouse's current verdict — missing = 1 when the tracked
    * staging file has no qualifying (exported_data / aborted /
    * *_failed) upload AFTER it once it ages past the probe delay.
    * The batch trk1 window ((now − 2·tw, now − tw)) needs "now";
    * here the caller passes nowMin per trigger the same way the
    * reference's cron tick reads the clock — determinism in tests
    * comes from driving it with event-time nows.
    */
  def syncStuckStream(events: org.apache.spark.sql.Dataset[SyncEvent],
                      twMin: Long)
    : org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_.wh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (wh: Long, it: Iterator[SyncEvent], state: GroupState[SyncState]) => {
          var st = state.getOption.getOrElse(SyncState(Long.MinValue, Long.MinValue, Long.MinValue))
          var nowMin = Long.MinValue
          it.foreach { e =>
            nowMin = math.max(nowMin, e.timeMin)
            e.kind match {
              case "s" =>
                // max-id staging file wins, like the probe's ORDER BY id DESC
                if (e.id > st.probeId)
                  st = st.copy(probeId = e.id, probeCreatedMin = e.timeMin)
              case _ =>
                val qualifies = e.status == "exported_data" ||
                  e.status == "aborted" || e.status.endsWith("_failed")
                if (qualifies && e.timeMin > st.lastUploadMin)
                  st = st.copy(lastUploadMin = e.timeMin)
            }
          }
          state.update(st)
          // verdict for this trigger: the tracked file must be old
          // enough to probe (past tw) and have no qualifying upload
          // after it
          if (st.probeId == Long.MinValue) Iterator.empty
          else {
            val aged = st.probeCreatedMin <= nowMin - twMin
            val missing =
              if (!aged) 0L
              else if (st.lastUploadMin > st.probeCreatedMin) 0L
              else 1L
            Iterator.single((wh, st.probeCreatedMin, st.lastUploadMin, missing))
          }
        })
  }

  val oracles: Map[String, String] = Map(
    "sch1_upload_scheduling" -> {
      val cte = schedExprs("//").map { case (n, e) => s"$e AS $n" }
      s"""WITH cfg(cfg_id, always_f, triggered_f, manual_f, ignore_f,
              freq_min, start_min, excl_s, excl_e) AS (
            VALUES $configsSqlValues),
          t AS (SELECT DISTINCT o_orderkey % 78 AS t_idx FROM orders),
          times AS (SELECT t_idx, 1000000 + t_idx * 37 AS now_min FROM t),
          times2 AS (SELECT t_idx, now_min,
              CASE WHEN t_idx % 3 = 0 THEN NULL
                ELSE now_min - (t_idx % 5) * 90 END AS last_upload_min,
              CASE WHEN t_idx % 4 = 0 THEN NULL
                ELSE now_min - (t_idx % 7) * 10 END AS marker_min
            FROM times),
          x AS (SELECT *, ${cte(0)} FROM times2 CROSS JOIN cfg),
          x2 AS (SELECT *, ${cte(1)} FROM x),
          x3 AS (SELECT *, ${cte(2)} FROM x2),
          x4 AS (SELECT *, ${cte(3)} FROM x3),
          x5 AS (SELECT *, ${cte(4)} FROM x4)
          SELECT CAST(cfg_id AS BIGINT) AS cfg_id,
            CAST(now_min AS BIGINT) AS now_min,
            CAST(prev_sched AS BIGINT) AS prev_sched, verdict
          FROM x5"""
    },
    "trk1_sync_stuck" ->
      """WITH staging AS (SELECT user_id % 6 AS wh, event_id AS id,
              epoch_us(ts) // 60000000 AS created_min FROM events),
          uploads AS (SELECT user_id % 6 AS wh,
              CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 'exported_data'
                WHEN 1 THEN 'aborted' WHEN 2 THEN 'exporting_data_failed'
                WHEN 3 THEN 'waiting' ELSE 'exporting_data' END AS status,
              epoch_us(ts) // 60000000 + (event_id % 7) * 30 AS updated_min
            FROM events WHERE event_id % 11 = 0 AND user_id % 6 <= 2),
          wh(wh, enabled, freq_min, excl_s, excl_e) AS (VALUES
            (0, TRUE, NULL, NULL, NULL), (1, TRUE, 120, NULL, NULL),
            (2, TRUE, 240, NULL, NULL), (3, FALSE, NULL, NULL, NULL),
            (4, TRUE, 120, NULL, NULL), (5, TRUE, 240, 0, 1439)),
          nowt AS (SELECT MAX(created_min) + 1 AS now_min FROM staging),
          probes AS (SELECT s.wh,
              arg_max(s.created_min, s.id) AS probe_created_min
            FROM staging s JOIN wh ON s.wh = wh.wh CROSS JOIN nowt
            WHERE s.created_min > now_min - (COALESCE(freq_min, 0) + 180) * 2
              AND s.created_min < now_min - (COALESCE(freq_min, 0) + 180)
            GROUP BY 1),
          ex AS (SELECT p.wh, p.probe_created_min,
              COALESCE(SUM(CASE WHEN u.updated_min > p.probe_created_min
                THEN 1 ELSE 0 END), 0) > 0 AS upload_exists
            FROM probes p LEFT JOIN uploads u ON p.wh = u.wh
              AND (u.status IN ('exported_data', 'aborted')
                   OR u.status LIKE '%\_failed' ESCAPE '\')
            GROUP BY 1, 2),
          base AS (SELECT wh.*, now_min % 1440 AS cm FROM wh CROSS JOIN nowt),
          flags AS (SELECT *,
              excl_s IS NOT NULL AND excl_e IS NOT NULL AND (
                (excl_s < cm AND cm < excl_e) OR
                (excl_s > excl_e AND ((excl_s > cm AND cm < excl_e) OR
                                      (excl_s < cm AND cm > excl_e))))
                AS in_excl
            FROM base)
          SELECT CAST(f.wh AS BIGINT) AS wh, f.enabled,
            f.enabled AND NOT f.in_excl AS tracked,
            CASE WHEN f.enabled AND NOT f.in_excl
              THEN ex.probe_created_min END AS probe_created_min,
            CASE WHEN f.enabled AND NOT f.in_excl
              THEN ex.upload_exists END AS upload_exists,
            CAST(CASE WHEN NOT (f.enabled AND NOT f.in_excl)
                OR ex.probe_created_min IS NULL THEN NULL
              WHEN COALESCE(ex.upload_exists, FALSE) THEN 0
              ELSE 1 END AS BIGINT) AS missing
          FROM flags f LEFT JOIN ex ON f.wh = ex.wh"""
  )
}
