package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** D3b: ADAPTIVE throttling — the reference's 429-reactive pickup
  * limiter (router/throttler/factory.go:94-100 wiring;
  * router/throttler/internal/pickup/adaptive/algorithm/): a per-
  * destination limit factor in [0,1] driven by two counters over a
  * base window W —
  *
  *  - decrease (decrease_limit_counter.go): each window, if the 429
  *    rate exceeds the 10% tolerance, subtract rate*30% from the
  *    factor, then WAIT one window with the decrease counters
  *    discarded (so one burst triggers one cut, not a cascade);
  *  - increase (increase_limit_counter.go): every 2 windows, if the
  *    span saw zero 429s, add 10%. Its counter is independent of the
  *    decrease wait — a 429 during a discarded window still blocks
  *    the next increase.
  *
  * Determinism choices mirrored by the oracle: the factor is held in
  * integer PERCENT (0..100, start 100); the decrease amount is
  * (n_429 * 30) DIV n_total (exact integer floor); each Add clamps
  * immediately (limitFactor.Add in algorithm.go) with decrease
  * applied before increase at a shared boundary; both can never fire
  * in the same window (decrease needs 429s, increase needs none).
  *
  * Scale shape: the fold is a per-destination sequential state
  * machine over per-window AGGREGATES (two longs per window) — the
  * corpus-sized work is the upstream window aggregation (one
  * hash shuffle); the fold itself touches destinations x windows
  * rows. Batch replay here; the streaming twin is a
  * flatMapGroupsWithState keyed by destination beside d2's barrier.
  */
object Adaptive {

  private val tolerancePct = 10L // adaptiveThrottleTolerancePercentage
  private val decreasePct = 30L // adaptiveDecreasePercentage
  private val increasePct = 10L // adaptiveIncreasePercentage
  private val increaseEvery = 2 // adaptiveIncreaseWindowMultiplier
  private val baseLimit = 200L // static limit the factor multiplies

  /** (destination_id, window_idx, n_total, n_429) — per-destination
    * per-window delivery outcome aggregates. d1 stays clean (clamp at
    * 100), d2 shrinks twice then recovers, d3 proves the exact
    * tolerance boundary (10% is NOT a breach), the wait-window
    * discard (w3's 80 429s never trigger a cut), and that those
    * discarded 429s still block the increase at w4.
    */
  private val outcomes: Seq[(String, Long, Long, Long)] = Seq(
    ("d1", 1L, 100L, 0L), ("d1", 2L, 100L, 0L), ("d1", 3L, 100L, 0L), ("d1", 4L, 100L, 0L),
    ("d1", 5L, 100L, 0L), ("d1", 6L, 100L, 0L), ("d1", 7L, 100L, 0L), ("d1", 8L, 100L, 0L),
    ("d2", 1L, 100L, 40L), ("d2", 2L, 100L, 50L), ("d2", 3L, 100L, 30L), ("d2", 4L, 100L, 5L),
    ("d2", 5L, 50L, 0L), ("d2", 6L, 50L, 0L), ("d2", 7L, 40L, 0L), ("d2", 8L, 40L, 0L),
    ("d3", 1L, 100L, 10L), ("d3", 2L, 100L, 11L), ("d3", 3L, 100L, 80L), ("d3", 4L, 100L, 0L),
    ("d3", 5L, 100L, 0L), ("d3", 6L, 100L, 0L), ("d3", 7L, 0L, 0L), ("d3", 8L, 0L, 0L))

  private val outcomesSql: String = outcomes
    .map { case (d, w, t, f) => s"('$d', $w, $t, $f)" }
    .mkString("(VALUES ", ", ", ")")

  private def clamp(v: Long): Long = math.min(100L, math.max(0L, v))

  /** One window step of the adaptive fold. Returns
    * (lfPct', skip', this window's n429 for the next increase span).
    * `idx` is the DENSE 1-based position of the window in the
    * destination's sequence (ROW_NUMBER, not the raw window index):
    * the increase cadence is "every 2nd observed window", so a gap in
    * a destination's window indices must not silently shift the
    * cadence — or, on the oracle side, truncate the recursive replay
    * that advances via idx + 1.
    */
  private[operators] def step(lfPct: Long, skip: Boolean, prev429: Long,
                              idx: Long, nTotal: Long, n429: Long): (Long, Boolean) = {
    val decCond = !skip && nTotal > 0 && n429 * 100 > tolerancePct * nTotal
    val afterDec =
      if (decCond) clamp(lfPct - (n429 * decreasePct) / nTotal) else lfPct
    val incCond = idx % increaseEvery == 0 && prev429 + n429 == 0
    val afterInc = if (incCond) clamp(afterDec + increasePct) else afterDec
    (afterInc, if (skip) false else decCond)
  }

  /** Replay the adaptive fold over per-window outcome aggregates.
    * Input columns: destination_id, widx, n_total, n_429.
    */
  def adaptiveThrottle(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.select("destination_id", "widx", "n_total", "n_429")
      .as[(String, Long, Long, Long)]
      .repartition(col("destination_id"))
      .sortWithinPartitions("destination_id", "widx")
    sorted.mapPartitions { it =>
      var key: String = null
      var lf = 100L
      var skip = false
      var prev429 = 0L
      var idx = 0L // dense per-destination position (widx may have gaps)
      it.map { case (dst, widx, nTotal, n429) =>
        if (dst != key) { key = dst; lf = 100L; skip = false; prev429 = 0L; idx = 0L }
        idx += 1
        val (lf2, skip2) = step(lf, skip, prev429, idx, nTotal, n429)
        lf = lf2; skip = skip2; prev429 = n429
        (dst, widx, lf, baseLimit * lf / 100L)
      }
    }.toDF("destination_id", "widx", "lf_pct", "effective_limit")
  }

  /** Per-destination per-window outcome aggregates (streaming input). */
  case class WindowOutcome(destination_id: String, widx: Long,
                           n_total: Long, n_429: Long)

  /** Carried fold state: current limit factor, wait-window flag, the
    * previous window's 429 count (blocks the next increase), and the
    * count of windows seen so far (the dense position feeding the
    * increase cadence across micro-batches).
    */
  case class ThrottleState(lf: Long, skip: Boolean, prev429: Long, seen: Long = 0L)

  /** Streaming twin of [[adaptiveThrottle]]: the same integer fold as
    * a flatMapGroupsWithState keyed by destination (beside d2's
    * barrier), with the (lf, skip, prev429) triple in the state store
    * so the limit trajectory continues EXACTLY across micro-batches —
    * StreamingSpec asserts batch/stream equivalence on a split feed.
    * In production this consumes d1's per-window delivery-outcome
    * aggregation (a watermarked groupBy upstream), destinations x
    * windows rows — never the raw attempts.
    */
  def adaptiveThrottleStream(outcomes: org.apache.spark.sql.Dataset[WindowOutcome])
    : org.apache.spark.sql.Dataset[(String, Long, Long, Long)] = {
    import outcomes.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    outcomes
      .groupByKey(_.destination_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (dst: String, it: Iterator[WindowOutcome], state: GroupState[ThrottleState]) => {
          var st = state.getOption.getOrElse(ThrottleState(100L, skip = false, 0L))
          val out = it.toSeq.sortBy(_.widx).map { w =>
            val idx = st.seen + 1
            val (lf2, skip2) = step(st.lf, st.skip, st.prev429, idx, w.n_total, w.n_429)
            st = ThrottleState(lf2, skip2, w.n_429, idx)
            (dst, w.widx, lf2, baseLimit * lf2 / 100L)
          }
          state.update(st)
          out.iterator
        })
  }

  /** GW1's quota: events per workspace per week-window. */
  private[operators] val ingestQuota = 800L

  /** GW1 token-bucket fold (gateway/handle.go:459-469
    * CheckLimitReached): a request BATCH is accepted iff the
    * workspace window's already-ACCEPTED events plus the batch fit
    * the quota — a dropped batch consumes nothing (the limiter only
    * commits tokens on allow), and the whole batch drops at once
    * (errRequestDropped → 429), never per-event. Sequential state, so
    * the fold runs per (workspace, window) partition over BATCH
    * aggregates — batch-count-bounded groups, adaptiveThrottle's
    * mapPartitions shape, never the raw events.
    * Input columns: workspace_id, week, arrival_us, batch_id,
    * n_events.
    */
  def ingestRateLimit(df: DataFrame, quota: Long = ingestQuota): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("workspace_id", "week", "arrival_us", "batch_id", "n_events")
      .as[(String, Long, Long, Long, Long)]
      .repartition(col("workspace_id"), col("week"))
      .sortWithinPartitions("workspace_id", "week", "arrival_us", "batch_id")
      .mapPartitions { it =>
        var key: (String, Long) = null
        var used = 0L
        it.map { case (ws, week, _, bid, n) =>
          if ((ws, week) != key) { key = (ws, week); used = 0L }
          val accept = used + n <= quota
          if (accept) used += n
          (ws, week, bid, n, accept)
        }
      }.toDF("workspace_id", "week", "batch_id", "n_events", "accepted")
  }

  /** Streaming-twin row type for GW1. */
  case class IngestBatch(workspace_id: String, week: Long, arrival_us: Long,
                         batch_id: Long, n_events: Long)

  /** GW1 streaming state: committed tokens + the high-water mark of
    * the (arrival_us, batch_id) fold order already folded.
    */
  case class IngestQuotaState(used: Long, maxArr: Long, maxBid: Long)

  /** Streaming twin of [[ingestRateLimit]]: the per-(workspace, week)
    * accepted-token count lives in the state store, so the quota
    * keeps being enforced EXACTLY across micro-batches — O(1) state
    * per live workspace-window, the d3b twin's contract.
    * StreamingSpec asserts batch/stream equivalence on a split feed.
    *
    * Cross-batch disorder guard (the Sessions.attributionStream
    * contract, which this twin was missing per the r11 advisor): the
    * batch fold is a GLOBAL (arrival_us, batch_id) sort, but
    * micro-batches only sort within themselves — a batch arriving in
    * a LATER micro-batch yet EARLIER in fold order would fold against
    * already-committed quota state and silently diverge from
    * [[ingestRateLimit]]. The state tracks the fold-order high-water
    * mark; an out-of-order batch is DENIED explicitly and commits
    * nothing — a real-time limiter cannot rewind tokens it already
    * granted, so "late into the past" is a drop, never a retroactive
    * accept. Equivalence with the batch fold therefore holds exactly
    * on in-fold-order feeds and degrades to documented denial
    * otherwise (StreamingSpec pins both behaviors).
    */
  def ingestRateLimitStream(batches: org.apache.spark.sql.Dataset[IngestBatch],
                            quota: Long = ingestQuota)
    : org.apache.spark.sql.Dataset[(String, Long, Long, Long, Boolean)] = {
    import batches.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    batches
      .groupByKey(b => (b.workspace_id, b.week))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, Long), it: Iterator[IngestBatch],
         state: GroupState[IngestQuotaState]) => {
          var st = state.getOption.getOrElse(IngestQuotaState(0L, Long.MinValue, Long.MinValue))
          val out = it.toSeq.sortBy(b => (b.arrival_us, b.batch_id)).map { b =>
            val inOrder = b.arrival_us > st.maxArr ||
              (b.arrival_us == st.maxArr && b.batch_id > st.maxBid)
            val accept = inOrder && st.used + b.n_events <= quota
            if (inOrder)
              st = IngestQuotaState(st.used + (if (accept) b.n_events else 0L),
                b.arrival_us, b.batch_id)
            (b.workspace_id, b.week, b.batch_id, b.n_events, accept)
          }
          state.update(st)
          out.iterator
        })
  }

  val defs: Map[String, Q] = Map(
    "d3b_adaptive_throttle" -> ((s, dir) => {
      val sess = s
      import sess.implicits._
      adaptiveThrottle(outcomes.toDF("destination_id", "widx", "n_total", "n_429"))
    }),

    // GW1: gateway ingest rate limiting — the ingest-side
    // per-workspace quota (d3/d3b are ROUTER-side delivery
    // throttles): request batches of the event stream, each batch one
    // workspace, folded through the token bucket in arrival order;
    // beyond-quota batches 429 whole. The corpus-scale work is one
    // batch-keyed aggregate; the fold sees only batch rows.
    "gw1_ingest_rate_limit" -> ((s, dir) => {
      val batches = Tables.events(s, dir)
        .select(expr("event_id DIV 100").as("batch_id"),
          unix_micros(col("ts")).as("ts_us"))
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("arrival_us"))
        .withColumn("workspace_id", concat(lit("ws_"), col("batch_id") % 2))
        .withColumn("week", expr("arrival_us DIV 604800000000"))
      ingestRateLimit(batches)
        .withColumn("decision",
          when(col("accepted"), "accepted").otherwise("dropped_429"))
        .groupBy(col("workspace_id"), col("decision"))
        .agg(count(lit(1)).as("n_batches"), sum(col("n_events")).as("n_events"))
    }))

  val oracles: Map[String, String] = Map(
    "d3b_adaptive_throttle" ->
      s"""WITH RECURSIVE
         w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY destination_id ORDER BY widx) AS rn
               FROM $outcomesSql AS t(destination_id, widx, n_total, n_429)),
         st AS (
           SELECT destination_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS widx,
                  CAST(100 AS BIGINT) AS lf, FALSE AS skip, CAST(0 AS BIGINT) AS prev429
           FROM (SELECT DISTINCT destination_id FROM w)
           UNION ALL
           SELECT s.destination_id, s.rn + 1, x.widx,
             CAST(CASE WHEN (s.rn + 1) % $increaseEvery = 0 AND s.prev429 + x.n_429 = 0
               THEN LEAST(100, GREATEST(0,
                 (CASE WHEN NOT s.skip AND x.n_total > 0 AND x.n_429 * 100 > $tolerancePct * x.n_total
                       THEN LEAST(100, GREATEST(0, s.lf - (x.n_429 * $decreasePct) // x.n_total))
                       ELSE s.lf END) + $increasePct))
               ELSE
                 (CASE WHEN NOT s.skip AND x.n_total > 0 AND x.n_429 * 100 > $tolerancePct * x.n_total
                       THEN LEAST(100, GREATEST(0, s.lf - (x.n_429 * $decreasePct) // x.n_total))
                       ELSE s.lf END) END AS BIGINT),
             CASE WHEN s.skip THEN FALSE
                  ELSE (NOT s.skip AND x.n_total > 0 AND x.n_429 * 100 > $tolerancePct * x.n_total) END,
             CAST(x.n_429 AS BIGINT)
           FROM st s JOIN w x ON x.destination_id = s.destination_id AND x.rn = s.rn + 1)
         SELECT destination_id, widx, lf AS lf_pct,
                CAST(($baseLimit * lf) // 100 AS BIGINT) AS effective_limit
         FROM st WHERE rn >= 1""",

    // the token-bucket fold replayed as a recursive CTE per
    // (workspace, week): used advances only on accepted batches
    "gw1_ingest_rate_limit" ->
      s"""WITH RECURSIVE
         b0 AS (SELECT event_id // 100 AS batch_id, COUNT(*) AS n_events,
                       MIN(epoch_us(ts)) AS arrival_us
                FROM events GROUP BY 1),
         b AS (SELECT 'ws_' || CAST(batch_id % 2 AS VARCHAR) AS workspace_id,
                      arrival_us // 604800000000 AS week,
                      batch_id, n_events, arrival_us,
                      ROW_NUMBER() OVER (
                        PARTITION BY batch_id % 2, arrival_us // 604800000000
                        ORDER BY arrival_us, batch_id) AS rn
               FROM b0),
         st AS (
           SELECT workspace_id, week, CAST(0 AS BIGINT) AS rn,
                  CAST(0 AS BIGINT) AS used, CAST(0 AS BIGINT) AS n_events,
                  FALSE AS accepted
           FROM (SELECT DISTINCT workspace_id, week FROM b)
           UNION ALL
           SELECT s.workspace_id, s.week, s.rn + 1,
                  CASE WHEN s.used + x.n_events <= $ingestQuota
                       THEN s.used + x.n_events ELSE s.used END,
                  x.n_events,
                  s.used + x.n_events <= $ingestQuota
           FROM st s JOIN b x
             ON x.workspace_id = s.workspace_id AND x.week = s.week
            AND x.rn = s.rn + 1)
         SELECT workspace_id,
                CASE WHEN accepted THEN 'accepted' ELSE 'dropped_429' END AS decision,
                COUNT(*) AS n_batches,
                CAST(SUM(n_events) AS BIGINT) AS n_events
         FROM st WHERE rn >= 1 GROUP BY 1, 2""")
}
