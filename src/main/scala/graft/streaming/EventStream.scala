package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

/** The reference's event pipeline as Structured Streaming — SURVEY
  * §2.10/§7.1 step 2: stream → T3 non-identifiable filter → T7
  * timestamp normalization → T6 exactly-once dedup (state-store-backed
  * dropDuplicatesWithinWatermark, the streaming form of
  * services/dedup/dedup.go) → W4 tracks projection → idempotent
  * MERGE-style sink via foreachBatch, plus the A1 watermarked
  * minute-bucket aggregation (enterprise/reporting/reporting.go:
  * 264-335; its "don't flush until past the bucket" rule IS a
  * watermark).
  *
  * Exactly-once contract = checkpointed source offsets + idempotent
  * MERGE in foreachBatch — the same at-least-once-plus-idempotent-load
  * contract the reference implements with jobsdb retries + delete+
  * insert loads (SURVEY §2.10).
  *
  * Input schema: message_id, ts, received_at, user_id, anonymous_id,
  * event_type, value.
  */
object EventStream {

  private val dec = DecimalType(18, 2)

  /** T3 + T7 + T6 over a streaming DataFrame. The watermark bounds the
    * dedup state store — at 100 TB/day the state holds only the last
    * 10 minutes of message ids per partition (RocksDB-backed on a real
    * cluster), not an unbounded set.
    */
  def preprocess(events: DataFrame): DataFrame =
    events
      // T3: reject non-identifiable (gateway/handle.go:555-573)
      .filter(coalesce(col("user_id"), col("anonymous_id")).isNotNull)
      // T7: normalized event time = client ts, defaulted to server
      // receive time (processor.go:1026-1054)
      .withColumn("ts", coalesce(col("ts"), col("received_at")))
      .withWatermark("ts", "10 minutes")
      // T6: exactly-once on messageId within the watermark
      .dropDuplicatesWithinWatermark("message_id")

  /** W4 tracks projection (rules.go defaults). */
  def toTracks(events: DataFrame): DataFrame =
    events.select(
      col("message_id").as("id"),
      col("user_id"),
      col("anonymous_id"),
      col("event_type").as("event"),
      col("ts").as("timestamp"),
      col("received_at"),
      col("value"))

  /** A1: watermarked tumbling minute window per event_type. */
  def minuteAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(col("window.start").as("minute"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming sessionization — the q16 gaps-and-islands operator in
    * its native Structured Streaming form: `session_window` merges
    * events within a 30-minute inactivity gap and the watermark closes
    * a session once no on-time event can extend it, so the state store
    * holds OPEN sessions only (bounded by active users x gap, never by
    * history). Batch q16 numbers islands over the full log; here the
    * same islands emit incrementally with `session_end` = last event
    * ts + gap.
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream interval join: correlate each event with the same
    * user's delivery confirmations arriving within the hour after it
    * (the D1 delivery-receipt correlation, as two live streams).
    * Watermarks on BOTH sides plus the time-interval condition let
    * Spark evict join state: each side buffers only rows younger than
    * watermark + interval, so state is bounded by stream rate, not
    * retention. The equality key routes both streams through one hash
    * shuffle; the range predicate filters within each key partition.
    */
  def confirmationJoin(events: DataFrame, confirms: DataFrame): DataFrame = {
    val e = events.withWatermark("ts", "10 minutes")
      .select(col("message_id"), col("user_id"), col("ts"))
    val c = confirms.withWatermark("confirm_ts", "10 minutes")
      .select(col("confirm_user_id"), col("confirm_id"), col("confirm_ts"))
    e.join(c,
      col("user_id") === col("confirm_user_id") &&
        col("confirm_ts") >= col("ts") &&
        col("confirm_ts") <= col("ts") + expr("INTERVAL 1 HOUR"))
      .select(col("message_id"), col("user_id"), col("ts"),
        col("confirm_id"), col("confirm_ts"))
  }

  /** q25's streaming twin — the interval join against a STATIC
    * order-window table as a stream-static join. The same day-bucket
    * decomposition turns the point-in-interval match into an
    * equi-join on (user_id, bucket) with the exact range predicate as
    * residual, so each micro-batch joins hash-to-hash against the
    * (possibly broadcast) static side and NO state store is involved:
    * stream-static inner joins are stateless by construction. Emits
    * the raw match set in Append mode; the per-event aggregate is the
    * batch surface's closing groupBy. Input schemas:
    * events(event_id, user_id, ts_us), windows(user_id, o_orderkey,
    * start_us, end_us).
    */
  def intervalJoinStream(events: DataFrame, orderWindows: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val buck = orderWindows.withColumn("bucket",
      explode(expr(s"sequence(start_us DIV ${dayUs}L, (end_us - 1) DIV ${dayUs}L)")))
    events.withColumn("bucket", expr(s"ts_us DIV ${dayUs}L"))
      .join(buck, Seq("user_id", "bucket"))
      .filter(col("ts_us") >= col("start_us") && col("ts_us") < col("end_us"))
      .select(col("event_id"), col("user_id"), col("ts_us"), col("o_orderkey"))
  }

  /** Bucket count for the tracks-table layout. Each micro-batch merge
    * rewrites only the buckets its ids hash into, so per-batch IO is
    * bounded by touched partitions, not table size. 32 here (tests +
    * local bench); at 100 TB this is a config of order 10k so a
    * partition stays executor-memory-sized.
    */
  val trackBuckets = 32

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("id_bucket", pmod(xxhash64(col("id")), lit(trackBuckets.toLong)))

  /** Idempotent MERGE of a (possibly replayed) batch into a parquet
    * table laid out as `id_bucket=k/` hash partitions: latest
    * received_at per id wins (the reference's L6 window-dedup load,
    * postgres load.go:300-322, which deletes+inserts only the staging
    * slice — here: only the batch-touched buckets are read, merged and
    * swapped). Crash-atomic: the merged buckets are staged to a side
    * directory and renamed in per-partition; a failure during the
    * staged write leaves the live table byte-identical, and a failure
    * mid-swap leaves whole-bucket versions (each rename is atomic), so
    * the streaming replay of the same batch converges — the
    * at-least-once-plus-idempotent-load contract
    * (warehouse/router/upload.go:285-493). Swap the sink for
    * Delta/Iceberg MERGE INTO in production — same semantics.
    */
  /** Self-heal a previous crash in a bucket swap's non-atomic window
    * (stage-out rename done, swap-in rename not): the committed
    * bucket survives at its dot-prefixed .old path — restore it
    * before reading, so the streaming replay really does converge.
    * Completed swaps' leftover .old dirs are just deleted.
    */
  private[streaming] def healCrashedSwaps(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path)).map(_.getPath)
        .filter(p => p.getName.startsWith(".id_bucket=") && p.getName.endsWith(".old"))
        .foreach { oldP =>
          val live = new Path(path, oldP.getName.stripPrefix(".").stripSuffix(".old"))
          if (!fs.exists(live)) {
            if (!fs.rename(oldP, live))
              throw new java.io.IOException(s"cannot restore $oldP to $live")
          } else fs.delete(oldP, true)
        }
  }

  /** Swap each staged touched bucket into the live table with atomic
    * renames (stage-out to a dot-prefixed .old, swap-in, cleanup) —
    * the crash-atomic tail shared by every bucketed merge sink.
    */
  private[streaming] def swapBuckets(fs: org.apache.hadoop.fs.FileSystem,
      path: String, staging: String, touched: Seq[Long]): Unit = {
    import org.apache.hadoop.fs.Path
    fs.mkdirs(new Path(path))
    touched.foreach { k =>
      val src = new Path(s"$staging/id_bucket=$k")
      val dst = new Path(s"$path/id_bucket=$k")
      val old = new Path(s"$path/.id_bucket=$k.old") // dot-prefixed: invisible to readers
      if (fs.exists(src)) {
        fs.delete(old, true)
        if (fs.exists(dst) && !fs.rename(dst, old))
          throw new java.io.IOException(s"cannot stage out $dst")
        if (!fs.rename(src, dst)) {
          fs.rename(old, dst)
          throw new java.io.IOException(s"cannot swap $src into $dst")
        }
        fs.delete(old, true)
      }
    }
    fs.delete(new Path(staging), true)
  }

  /** Partition-pruned read of only the batch-touched bucket dirs (or
    * None when no committed bucket exists yet). Partition discovery
    * types id_bucket as int, so the prune filter uses int literals (a
    * cast on the partition column would defeat pruning) and widens to
    * long after.
    */
  private[streaming] def readTouchedBuckets(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String,
      touched: Seq[Long]): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val tableExists = fs.exists(new Path(path)) &&
      fs.listStatus(new Path(path)).exists(_.getPath.getName.startsWith("id_bucket="))
    if (!tableExists) None
    else Some(spark.read.option("basePath", path).parquet(path)
      .filter(col("id_bucket").isin(touched.map(_.toInt): _*))
      .withColumn("id_bucket", col("id_bucket").cast("long")))
  }

  def mergeIntoTracks(spark: SparkSession, path: String, batch: DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    healCrashedSwaps(fs, path)
    val b = withBucket(batch)
    // touched-bucket list is bounded by trackBuckets (config-sized,
    // not data-sized) — this collect is a partition-pruning plan
    // input, not a data collect
    val touched = b.select("id_bucket").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val all = readTouchedBuckets(spark, fs, path, touched) match {
      case Some(existing) => existing.unionByName(b.select(existing.columns.map(col): _*))
      case None => b
    }
    val w = Window.partitionBy(col("id"))
      .orderBy(col("received_at").desc, col("timestamp").desc)
    val merged = all
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val staging = new Path(path + "__staging")
    fs.delete(staging, true) // leftover of a previous failed attempt
    merged.write.partitionBy("id_bucket").parquet(staging.toString)
    // crash before this point: live table untouched. Every touched
    // bucket has >=1 row (its batch ids survive the window dedup), so
    // no live bucket is ever left dangling by the swap.
    swapBuckets(fs, path, staging.toString, touched)
  }

  /** Per-(user, destination) delivery attempt. */
  case class JobAttempt(user_id: String, destination: String, job_id: Long, ok: Boolean)

  /** D2: the event-order barrier as a custom stateful streaming op
    * (router/internal/eventorder/eventorder.go) — the one reference
    * operator with no Catalyst analog (SURVEY §4). Per
    * (userId, destinationId) key: jobs deliver in job_id order until
    * one fails; the failure "retries" and every successor is blocked —
    * across micro-batches — until a later attempt for the SAME job id
    * succeeds, which lifts the barrier. State = the blocking job id,
    * held in the state store (RocksDB-backed on a cluster).
    */
  def orderBarrier(attempts: org.apache.spark.sql.Dataset[JobAttempt])
    : org.apache.spark.sql.Dataset[(String, String, Long, String)] = {
    import attempts.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    attempts
      .groupByKey(a => (a.user_id, a.destination))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[JobAttempt], state: GroupState[Long]) => {
          var blocked: Option[Long] = state.getOption
          val out = it.toSeq.sortBy(_.job_id).map { a =>
            val status = blocked match {
              case Some(b) if a.job_id == b && a.ok => blocked = None; "delivered" // retry succeeded, barrier lifts
              case Some(b) if a.job_id == b => "retrying"
              case Some(_) => "blocked"
              case None if a.ok => "delivered"
              case None => blocked = Some(a.job_id); "retrying"
            }
            (a.user_id, a.destination, a.job_id, status)
          }
          blocked match {
            case Some(b) => state.update(b)
            case None if state.exists => state.remove()
            case None =>
          }
          out.iterator
        })
  }

  /** D2 on the transformWithState API (Spark 4's arbitrary-state
    * replacement for flatMapGroupsWithState): same barrier semantics,
    * state held in a typed ValueState — the forward-looking form for
    * state-schema evolution and RocksDB-backed stores.
    */
  class OrderBarrierProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      (String, String), JobAttempt, (String, String, Long, String)] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var blockedJob: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      blockedJob = getHandle.getValueState[Long]("blockedJob", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: (String, String), rows: Iterator[JobAttempt],
                                 timers: TimerValues): Iterator[(String, String, Long, String)] = {
      var blocked: Option[Long] = if (blockedJob.exists()) Some(blockedJob.get()) else None
      val out = rows.toSeq.sortBy(_.job_id).map { a =>
        val status = blocked match {
          case Some(b) if a.job_id == b && a.ok => blocked = None; "delivered"
          case Some(b) if a.job_id == b => "retrying"
          case Some(_) => "blocked"
          case None if a.ok => "delivered"
          case None => blocked = Some(a.job_id); "retrying"
        }
        (a.user_id, a.destination, a.job_id, status)
      }
      blocked match {
        case Some(b) => blockedJob.update(b)
        case None => blockedJob.clear()
      }
      out.iterator
    }
  }

  /** Streaming sibling of jd2 (jobsdb read-excluded partitions): every
    * micro-batch RE-RESOLVES the current exclusion set from the ledger
    * — the reference's in-memory blocklist is mutated by add/remove
    * calls BETWEEN read queries, so each read sees the set as of its
    * own start (jobsdb_get.go:436-445), which in streaming terms is
    * per-micro-batch resolution. An exclusion added mid-stream takes
    * effect on the next batch; a removal re-opens the partition with
    * no restart. The set is metadata-grain, so the filter is a
    * broadcast anti-join per batch — the stream never shuffles for it.
    */
  def readExcludedStream(events: DataFrame, ledgerDir: String,
                         outDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val ex = graft.sinks.Sinks.readExcludedPartitionIDs(s, ledgerDir)
        val kept =
          if (ex.isEmpty) batch
          else {
            import s.implicits._
            batch.join(broadcast(ex.toDF("partition_id")),
              Seq("partition_id"), "left_anti")
          }
        kept.write.mode("append").parquet(outDir)
      }
      .start()

  /** End-to-end slice: stream → preprocess → tracks → MERGE sink. */
  def startTracksPipeline(events: DataFrame, tablePath: String,
                          checkpointDir: String): StreamingQuery =
    toTracks(preprocess(events))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoTracks(batch.sparkSession, tablePath, batch)
      }
      .start()
}
