package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The notifier claim/orphan-requeue queue (reference:
  * services/notifier/notifier.go:390-664 + repo.go:95-558) — the
  * work-distribution service between the warehouse router and its
  * upload workers, re-expressed as the same append-only parquet state
  * ledger as [[Sinks.sourceJobsRun]]:
  *
  *   - Publish inserts a batch of jobs (status waiting, attempt 0)
  *     under one batch_id (repo.insert).
  *   - Workers claim ONE job each in (priority ASC, id ASC) order
  *     over status ∈ (waiting, failed) — the repo.claim UPDATE …
  *     SKIP LOCKED — marking it executing with worker_id and
  *     last_exec_time (here a logical ROUND; wall clock would break
  *     resume determinism).
  *   - onClaimFailed: `status = CASE WHEN attempt > maxAttempt THEN
  *     aborted ELSE failed END, attempt = attempt + 1` — the same
  *     PRE-increment algebra as the source repo, so a job gets
  *     maxAttempt + 2 tries; onClaimSuccess leaves attempt as the
  *     failure count.
  *   - RunMaintenance requeues ORPHANS: executing rows whose
  *     last_exec_time is older than the orphan timeout go back to
  *     waiting with attempt PRESERVED (a dead worker is not a job
  *     failure).
  *   - RefreshClaim is the heartbeat that keeps a slow-but-alive
  *     worker's claim out of the orphan sweep: a new executing row
  *     with a bumped last_exec_time.
  *   - trackBatch: a batch completes when pendingByBatchID (status ∉
  *     succeeded/aborted) reaches 0 — its jobs are returned to the
  *     publisher and deleted (tombstone rows here, so the ledger
  *     keeps its append-only shape).
  *
  * Scale contract: the queue is CONTROL-PLANE metadata (one row per
  * staging-batch job transition, never event-grain), so the drain
  * loop evolves a driver map seeded by ONE distributed read — the
  * sourceJobsRun pattern — while every transition lands in the
  * parquet log for crash recovery. The data the jobs point at moves
  * through the distributed load paths (L1–L12); only coordination
  * state lives here. Round count is bounded by
  * (maxAttempt + 2) · jobs / aliveWorkers + orphanTimeout.
  */
object Notifier {

  /** One drained run over the queue.
    *
    * @param payloads  (job_id LONG, batch_id STRING, priority LONG)
    *                  — inserted only if the ledger doesn't exist yet
    *                  (Publish); a resume re-attaches to the stored
    *                  ledger and its monotonic round clock.
    * @param outcome   deterministic try oracle (batchId, jobId, tryNo)
    *                  — determinism is what makes a crashed run
    *                  converge to the uninterrupted run's terminals.
    * @param deadAfterFirstClaim worker indexes that claim once and
    *                  vanish mid-claim — the orphan path's fixture.
    * @param slowHold  (workerIdx, rounds): this worker holds its claim
    *                  for `rounds` rounds, REFRESHING the heartbeat
    *                  each round, then resolves — must never be
    *                  requeued by maintenance.
    * @param crashAfterRounds stop after N rounds with claims appended
    *                  but outcomes unreported — the crash window.
    * @return (outcomes executed, orphan requeues, heartbeat refreshes,
    *         batches completed+deleted)
    */
  def run(spark: SparkSession, ledgerDir: String, payloads: DataFrame,
          maxAttempt: Int, nWorkers: Int, orphanTimeoutRounds: Int,
          outcome: (String, Long, Long) => Boolean,
          deadAfterFirstClaim: Set[Int] = Set.empty,
          slowHold: Option[(Int, Int)] = None,
          crashAfterRounds: Int = Int.MaxValue): (Long, Long, Long, Long) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(ledgerDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(ledgerDir))) // Publish → repo.insert
      payloads.select(col("job_id"), col("batch_id"), col("priority"),
          lit(0L).as("seq"), lit("waiting").as("status"), lit(0L).as("attempt"),
          lit("").as("worker_id"), lit(0L).as("last_exec"))
        .write.parquet(ledgerDir)
    val wLatest = Window.partitionBy(col("job_id")).orderBy(col("seq").desc)
    val init = spark.read.parquet(ledgerDir)
      .withColumn("rn", row_number().over(wLatest)).filter(col("rn") === 1)
      .select("job_id", "batch_id", "priority", "seq", "status", "attempt",
        "worker_id", "last_exec")
      .collect()
    // job_id -> (batch, priority, status, attempt, lastExec)
    val state = scala.collection.mutable.Map(init.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getString(4),
        r.getLong(5), r.getLong(7)))): _*)
    var seq = init.map(_.getLong(3)).foldLeft(0L)(math.max)
    // the round clock continues monotonically across a resume, so a
    // crashed run's executing rows age into the orphan sweep
    var round = init.map(_.getLong(7)).foldLeft(0L)(math.max) + 1
    // Transitions buffer within a round and flush as ONE parquet
    // append per round (the r14 verdict's nt1 item: orphans /
    // heartbeats / claims / results each cost a Spark write-job when
    // appended separately — 4x the per-round constant for no
    // durability gain, since the reference too commits a round's SQL
    // inside one transaction scope). Ordering inside the batch is
    // preserved by seq: each transition group still takes its own
    // seq increment, so claims-before-results (the crash-window
    // contract SinksSpec pins) is intact — and the crash round
    // flushes claims WITHOUT results because results are never
    // buffered on that round.
    val pendingRows = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, String, Long, String, Long)]
    def append(rows: Seq[(Long, String, Long, Long, String, Long, String, Long)]): Unit = {
      rows.foreach { case (id, b, p, _, st, att, _, le) =>
        state(id) = (b, p, st, att, le)
      }
      pendingRows ++= rows
    }
    def flush(): Unit = if (pendingRows.nonEmpty) {
      val sess = spark
      import sess.implicits._
      pendingRows.toSeq.toDF("job_id", "batch_id", "priority", "seq", "status",
          "attempt", "worker_id", "last_exec")
        .coalesce(1).write.mode("append").parquet(ledgerDir)
      pendingRows.clear()
    }
    var executed = 0L
    var orphaned = 0L
    var refreshed = 0L
    val deadGone = scala.collection.mutable.Set.empty[Int]
    // worker -> (jobId, claimRound) for a slow worker mid-hold
    var holding = Map.empty[Int, (Long, Long)]
    var rounds = 0
    var drained = false
    while (!drained && rounds < crashAfterRounds) {
      // 1. RunMaintenance: orphan sweep BEFORE claims, so a crashed
      // run's stale executing rows requeue the moment they age out
      val orphans = state.toSeq.collect {
        case (id, (b, p, "executing", att, le))
          if le <= round - orphanTimeoutRounds &&
            !holding.values.exists(_._1 == id) =>
          (id, b, p, att)
      }
      if (orphans.nonEmpty) {
        seq += 1; orphaned += orphans.size
        append(orphans.map { case (id, b, p, att) =>
          (id, b, p, seq, "waiting", att, "", round)
        })
      }
      // 2. RefreshClaim: the slow worker's heartbeat
      val heartbeats = holding.toSeq.map { case (w, (id, _)) =>
        val (b, p, _, att, _) = state(id)
        refreshed += 1
        (id, b, p, 0L, "executing", att, s"w$w", round)
      }
      if (heartbeats.nonEmpty) {
        seq += 1
        append(heartbeats.map(h => h.copy(_4 = seq)))
      }
      // 3. Claims: each free, alive worker takes one (priority, id)-
      // ordered waiting|failed job — repo.claim's SKIP LOCKED scan
      val freeWorkers = (0 until nWorkers)
        .filterNot(deadGone).filterNot(holding.contains)
      val claimable = state.toSeq.collect {
        case (id, (b, p, st, att, _)) if st == "waiting" || st == "failed" =>
          (p, id, b, att)
      }.sorted.take(freeWorkers.size)
      // drained only when nothing is claimable, held, OR executing —
      // a job stranded with a dead worker is still in flight until
      // the orphan sweep requeues it. If every worker is gone and
      // nothing can resolve, STOP instead of spinning: the queue
      // (like the reference with zero subscribers) simply has no
      // progress to make; the remaining jobs stay waiting for the
      // next run's workers.
      val inFlight = state.values.exists(_._3 == "executing")
      if (claimable.isEmpty && holding.isEmpty && !inFlight) drained = true
      else if (freeWorkers.isEmpty && holding.isEmpty &&
        deadGone.size == nWorkers) drained = true
      else {
        val claims = freeWorkers.zip(claimable)
        if (claims.nonEmpty) {
          seq += 1
          append(claims.map { case (w, (p, id, b, att)) =>
            (id, b, p, seq, "executing", att, s"w$w", round)
          })
        }
        rounds += 1
        if (rounds != crashAfterRounds) { // crash: claims out, nothing back
          // 4. resolutions — fast alive workers report this round;
          // dead ones vanish holding the claim; the slow one holds
          val results = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long, String, Long, String, Long)]
          claims.foreach { case (w, (p, id, b, att)) =>
            if (deadAfterFirstClaim.contains(w)) deadGone += w
            else if (slowHold.exists(_._1 == w))
              holding += w -> ((id, round))
            else {
              executed += 1
              results += resolve(id, b, p, att, s"w$w", round, maxAttempt, outcome)
            }
          }
          // slow workers whose hold expires resolve now
          holding.foreach { case (w, (id, claimRound)) =>
            if (slowHold.exists { case (sw, hold) =>
              sw == w && round >= claimRound + hold }) {
              val (b, p, _, att, _) = state(id)
              executed += 1
              results += resolve(id, b, p, att, s"w$w", round, maxAttempt, outcome)
              holding -= w
            }
          }
          if (results.nonEmpty) {
            seq += 1
            append(results.toSeq.map(r => r.copy(_4 = seq)))
          }
        }
      }
      flush() // ONE append per round — the crash round has no results buffered
      round += 1
    }
    // 5. trackBatch: batches with zero pending jobs complete — their
    // jobs are returned to the publisher and deleted (tombstones)
    var batchesDone = 0L
    if (rounds < crashAfterRounds) {
      val byBatch = state.toSeq.groupBy(_._2._1)
      val complete = byBatch.filter(_._2.forall { case (_, (_, _, st, _, _)) =>
        st == "succeeded" || st == "aborted"
      })
      batchesDone = complete.size.toLong
      if (complete.nonEmpty) {
        seq += 1
        append(complete.values.flatten.toSeq.map { case (id, (b, p, _, att, le)) =>
          (id, b, p, seq, "deleted", att, "", le)
        })
        flush()
      }
    }
    (executed, orphaned, refreshed, batchesDone)
  }

  private def resolve(id: Long, b: String, p: Long, att: Long, worker: String,
                      round: Long, maxAttempt: Int,
                      outcome: (String, Long, Long) => Boolean)
  : (Long, String, Long, Long, String, Long, String, Long) =
    if (outcome(b, id, att + 1)) (id, b, p, 0L, "succeeded", att, worker, round)
    else if (att > maxAttempt) (id, b, p, 0L, "aborted", att + 1, worker, round)
    else (id, b, p, 0L, "failed", att + 1, worker, round)

  /** Latest PRE-DELETE state per job — the getByBatchID read the
    * publisher receives: deletion tombstones are excluded, so the row
    * returned is each job's terminal (or in-flight) state.
    */
  def returnedJobs(spark: SparkSession, ledgerDir: String): DataFrame = {
    val wLatest = Window.partitionBy(col("job_id")).orderBy(col("seq").desc)
    spark.read.parquet(ledgerDir)
      .filter(col("status") =!= "deleted")
      .withColumn("rn", row_number().over(wLatest)).filter(col("rn") === 1)
      .select(col("job_id"), col("batch_id"), col("priority"),
        col("status"), col("attempt"))
  }
}
