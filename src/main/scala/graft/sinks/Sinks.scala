package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write paths — SURVEY §2.5/§2.6.
  *
  * All sinks are partitioned writes: splitting a multi-table batch by
  * `partitionBy` is a single pass with no shuffle (each task writes
  * the partitions it holds), which is how one stream fans out to
  * dozens of warehouse tables at 100 TB without N jobs.
  */
object Sinks {

  /** L5: load-file encoder — per-table split, load-time columns
    * uuid_ts/loaded_at stamped like the reference's encoders
    * (warehouse/encoding/encoding.go:39-85). `loadTs` is injected so
    * loads are reproducible/idempotent across retries (the reference
    * stamps slave-side per upload attempt).
    */
  def writeLoadFiles(df: DataFrame, dir: String, format: String,
                     loadTs: java.sql.Timestamp): Unit = {
    val stamped = df
      .withColumn("uuid_ts", lit(loadTs))
      .withColumn("loaded_at", lit(loadTs))
    val w = stamped.write.mode("overwrite").partitionBy("table_name")
    format match {
      case "csv" => w.option("header", "true").option("compression", "gzip").csv(dir)
      case "json" => w.option("compression", "gzip").json(dir)
      case "parquet" => w.parquet(dir)
      case "orc" => w.orc(dir)
      case other => throw new IllegalArgumentException(s"unknown load-file format: $other")
    }
  }

  /** D4: batch object-storage sink — gzip JSON-lines partitioned by
    * (source, destination), the `<ts>.<src>.<uuid>.json.gz` layout of
    * router/batchrouter/handle.go:240-452 expressed as directory
    * partitions.
    */
  // r21 measurement note (guide §1): the write's cost here is NOT the
  // gzip encode — isolating d8's archive slice (47k rows, 100 dirs,
  // local[32]) read 1.48 s as-is, 0.18 s with partitionBy removed, and
  // stayed 1.5-1.8 s under every variant tried (hash-repartition on the
  // pair keys, commit algorithm v2, concurrent output writers, plain
  // json, parquet). The constant is Spark's dynamic-partition write
  // machinery at this directory count; a pre-write repartition only
  // adds a payload shuffle (and at 100 TB would concentrate each pair
  // into one unsplittable gz file), so the input partitioning is left
  // to the caller's scan. Round-robin repartition is the one true
  // anti-pattern (32 tasks x 100 dirs = 3200 files, 10.5 s measured).
  def batchObjectSink(df: DataFrame, dir: String): Unit =
    df.write.mode("append")
      .partitionBy("source_id", "destination_id")
      .option("compression", "gzip")
      .json(dir)

  /** Provider-specific load-file value shaping
    * (warehouse/slave/worker.go:366-402): ClickHouse takes booleans
    * as 0/1; int columns that arrived as float-repr strings ("5.0")
    * are normalized to integer form. Pure projection — composes in
    * front of writeLoadFiles.
    */
  def shapeForProvider(df: DataFrame, provider: String): DataFrame = {
    import org.apache.spark.sql.types.BooleanType
    provider match {
      case "CLICKHOUSE" =>
        df.schema.fields.filter(_.dataType == BooleanType).foldLeft(df) { (d, f) =>
          d.withColumn(f.name, when(col(f.name), 1).otherwise(0).cast("int"))
        }
      case _ => df
    }
  }

  /** Per-provider load-file encoders — the value-format table of
    * warehouse/encoding/encoding.go:14-19 + jsonloader/csvloader: BQ
    * load files are gzip JSON with BOTH load-time columns stamped as
    * formatted strings (uuid_ts at second precision 'yyyy-MM-dd
    * HH:mm:ss Z', loaded_at at micro precision); every other provider
    * gets gzip CSV with ONLY uuid_ts, in RFC3339-milli — plus its
    * value shaping (ClickHouse booleans → 0/1) applied first. The Go
    * loader trims trailing fractional zeros ('.999999'); callers pass
    * a loadTs whose micros carry no trailing zero, which the spec
    * pins.
    */
  def writeProviderLoadFiles(df: DataFrame, dir: String, provider: String,
                             loadTs: java.sql.Timestamp): Unit = {
    val ts = lit(loadTs)
    provider match {
      case "BQ" =>
        df.withColumn("uuid_ts",
            concat(date_format(ts, "yyyy-MM-dd HH:mm:ss"), lit(" Z")))
          .withColumn("loaded_at",
            concat(date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit(" Z")))
          .write.mode("overwrite").option("compression", "gzip").json(dir)
      case p =>
        shapeForProvider(df, p)
          .withColumn("uuid_ts", date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
          .write.mode("overwrite").option("header", "true")
          .option("compression", "gzip").csv(dir)
    }
  }

  /** Read-back side of writeProviderLoadFiles (the reference pairs a
    * JSON reader with BQ and a CSV reader with everything else —
    * encoding.go NewEventReader). All columns surface as strings: the
    * differential gate checks the ENCODED values.
    */
  def readProviderLoadFiles(spark: SparkSession, dir: String, provider: String,
                            ddl: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    provider match {
      case "BQ" => spark.read.schema(schema).json(dir)
      case _ => spark.read.schema(schema).option("header", "true").csv(dir)
    }
  }

  /** D6: streaming destination — a streaming DataFrame delivered
    * continuously to the (source, destination)-partitioned object
    * sink via foreachBatch. Swapping the body for
    * `batch.write.format("kafka")...` (or Kinesis/EventHub) is a
    * config-level change; the checkpointing, batching and partition
    * layout stay identical (services/streammanager shape).
    */
  def startStreamingObjectSink(stream: DataFrame, dir: String,
                               checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) => batchObjectSink(batch, dir) }
      .start()

  /** D7: error stash — dead-letter table sorted by failed_at inside
    * each file for range-skippable parquet
    * (enterprise/reporting/error_index/worker.go:242-295).
    */
  def errorStash(df: DataFrame, dir: String): Unit =
    df.sortWithinPartitions(col("failed_at"))
      .write.mode("append")
      .partitionBy("failed_date")
      .parquet(dir)

  /** Crash-atomic table rewrite: write the new version to a staging
    * directory, then swap it in with filesystem renames — the
    * stage-to-temp-table-and-swap contract of the reference's loads
    * (warehouse/integrations/postgres/load.go:231-322 stages to a
    * temp table; warehouse/router/upload.go:285-493 makes every state
    * resumable). A failure anywhere during `write` leaves the live
    * table byte-identical; a failure between the two renames leaves
    * the previous version recoverable at `<path>__old`. Rename is
    * atomic on HDFS and local filesystems (on S3 a real deployment
    * swaps a table-format pointer instead — same shape).
    */
  private[graft] def atomicSwap(spark: SparkSession, path: String)
                               (write: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + "__staging")
    val old = new Path(path + "__old")
    recoverSwap(spark, path) // a prior crash mid-swap leaves only __old
    fs.delete(staging, true) // leftover of a previous failed attempt
    write(staging.toString) // crash here: live table untouched
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"cannot stage out $target")
    if (!fs.rename(staging, target)) {
      fs.rename(old, target) // roll the previous version back in
      throw new java.io.IOException(s"cannot swap $staging into $target")
    }
    fs.delete(old, true)
  }

  /** Recovery for the swap's only non-atomic window: a crash between
    * the stage-out and swap-in renames leaves the committed version at
    * `<path>__old` and nothing live. EVERY reader/writer of a swapped
    * table calls this first, so the table self-heals on next touch
    * instead of requiring manual intervention (upload.go's resumable
    * in_progress recovery applied to files).
    */
  private[graft] def recoverSwap(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + "__old")
    if (!fs.exists(target) && fs.exists(old) && !fs.rename(old, target))
      throw new java.io.IOException(s"cannot restore $old to $target")
  }

  /** L9: retention delete — `DELETE FROM t WHERE <predicate>` as a
    * filtered rewrite (postgres.go:278 / snowflake.go:304; on a Delta
    * sink this is a metadata-only `replaceWhere`). Crash-atomic via
    * staging-dir + rename swap; the kept-row count is read back from
    * staged parquet footers, not a cached plan.
    */
  def retentionDelete(spark: SparkSession, path: String, deleteWhere: String): Long = {
    recoverSwap(spark, path) // self-heal a previously crashed swap
    val keep = spark.read.parquet(path).filter(s"NOT ($deleteWhere)")
    var kept = -1L
    atomicSwap(spark, path) { staging =>
      keep.write.parquet(staging)
      kept = spark.read.parquet(staging).count()
    }
    kept
  }

  /** L9 fast path: when the retention predicate is on the partition
    * column, DELETE == dropping whole partition directories — pure
    * metadata, zero data rewritten (Delta/Iceberg drop-partition; the
    * reference's date-ranged DELETEs on a partitioned jobsdb dataset
    * drop the dataset, jobsdb.go dsList rotation). Each drop is a
    * rename to a dot-prefixed trash dir (atomic: readers see the
    * partition vanish in one step) followed by a delete; leftover
    * trash from a crashed run is swept first. Returns the number of
    * partitions dropped.
    */
  def retentionDropPartitions(spark: SparkSession, path: String, partitionCol: String)
                             (shouldDrop: String => Boolean): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
    entries.filter(_.getName.startsWith(".trash_")).foreach(fs.delete(_, true))
    val parts = entries.filter(_.getName.startsWith(partitionCol + "="))
    var dropped = 0L
    parts.foreach { p =>
      val value = java.net.URLDecoder
        .decode(p.getName.stripPrefix(partitionCol + "="), "UTF-8")
      if (shouldDrop(value)) {
        val trash = new Path(root, s".trash_${p.getName}")
        if (!fs.rename(p, trash))
          throw new java.io.IOException(s"cannot drop partition $p")
        fs.delete(trash, true)
        dropped += 1
      }
    }
    dropped
  }

  /** Compaction — the jobsdb dataset-compaction analog
    * (jobsdb/jobsdb_compaction.go:26-70; Delta OPTIMIZE at a real
    * datalake): rewrite a small-files table into `targetFiles`
    * well-sized files, crash-atomically (staging dir + rename swap).
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int): Long = {
    recoverSwap(spark, path) // self-heal a previously crashed swap
    val df = spark.read.parquet(path).repartition(targetFiles)
    var n = -1L
    atomicSwap(spark, path) { staging =>
      df.write.parquet(staging)
      n = spark.read.parquet(staging).count()
    }
    n
  }

  /** rg1: regulation-worker batch delete — GDPR forget-user over an
    * object-store corpus (regulation-worker/internal/delete/batch/
    * batch.go:327-360 lists objects, skips already-cleaned ones via a
    * status-tracker ledger, rewrites the rest without the suppressed
    * users' rows; removeCleanedFiles batch.go:67-124; the ledger's
    * first line is the job id and a DIFFERENT id restarts the ledger,
    * batch.go:255-286 — a half-done older job must not mask rows the
    * new job is obliged to delete). Objects here are the corpus's
    * partition directories; each object's rewrite is an internally
    * distributed broadcast anti-join against the regulation job's
    * attribute list, crash-atomic via the staged-swap protocol. The
    * ledger commits only AFTER an object's swap lands, so a crash
    * anywhere resumes by re-cleaning at most the in-flight object —
    * and the rewrite is idempotent, so double-cleaning is safe. The
    * driver-side loop is over OBJECT COUNT (the reference's
    * file-manager page loop), never row count.
    *
    * @return (objectsTotal, objectsCleaned) — cleaned counts objects
    *         rewritten this call; a resumed/re-run job reports 0.
    */
  def regulationDelete(spark: SparkSession, path: String, forget: DataFrame,
                       matchCol: String, jobId: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Discover objects from BASE names including swap leftovers: a
    // crash between atomicSwap's two renames leaves only `obj=K__old`
    // on disk, and a listing of live dirs alone would silently skip
    // that object forever (under-deletion). Healing runs on the BASE
    // path, so recoverSwap restores any stranded __old before the
    // clean loop sees the inventory.
    val baseNames = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .map(_.stripSuffix("__old").stripSuffix("__staging"))
      .filter(_.contains("=")).distinct.sorted
    baseNames.foreach(n => recoverSwap(spark, new Path(root, n).toString))
    val objects = baseNames.map(new Path(root, _)).filter(fs.exists(_))
    val tracker = new Path(root, "_regulation_tracker.txt")
    def readLedger(): Seq[String] =
      if (!fs.exists(tracker)) Seq.empty
      else {
        val in = fs.open(tracker)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        finally in.close()
      }
    // Ledger rewrite is create-tmp + delete + rename (local FS has no
    // atomic replace); a crash in that window loses the ledger, which
    // only costs idempotent re-cleaning — never under-deletion.
    def writeLedger(lines: Seq[String]): Unit = {
      val tmp = new Path(root, "_regulation_tracker.txt.tmp")
      val out = fs.create(tmp, true)
      try out.write((lines.mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      fs.delete(tracker, false)
      if (!fs.rename(tmp, tracker))
        throw new java.io.IOException(s"cannot commit ledger $tracker")
    }
    val prior = readLedger()
    var ledger: Seq[String] =
      if (prior.headOption.contains(jobId)) prior
      else { writeLedger(Seq(jobId)); Seq(jobId) } // new/stale job: restart ledger
    val cleaned = ledger.drop(1).toSet
    val bForget = broadcast(forget.select(col(matchCol)))
    // objects clean CONCURRENTLY (the reference runs 5 goroutines over
    // the file list, batch.go maxRoutines; Spark schedules the swap
    // jobs side by side) with the ledger append mutex-guarded exactly
    // like the reference's updateStatusTrackerFile (batch.go upload's
    // b.mu.Lock) — each entry still lands only AFTER its object's swap
    val ledgerLock = new Object
    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    val nCleaned = new java.util.concurrent.atomic.AtomicLong(0L)
    try {
      val futures = objects.filterNot(o => cleaned(o.getName)).map { obj =>
        pool.submit(new Runnable {
          def run(): Unit = {
            atomicSwap(spark, obj.toString) { staging =>
              spark.read.parquet(obj.toString)
                .join(bForget, Seq(matchCol), "left_anti")
                .write.parquet(staging)
            }
            ledgerLock.synchronized {
              ledger = ledger :+ obj.getName
              writeLedger(ledger)
            }
            nCleaned.incrementAndGet()
          }
        })
      }
      // await EVERY future before returning/throwing: leaking in-flight
      // rewrites past this call would race a retry's swaps and ledger
      val failures = futures.flatMap(f =>
        try { f.get(); None }
        catch { case e: java.util.concurrent.ExecutionException => Some(e.getCause) })
      failures.headOption.foreach(throw _)
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
    }
    (objects.length.toLong, nCleaned.get())
  }

  /** Warehouse-side ledger archival
    * (warehouse/archive/archiver.go:105-259 backupRecords +
    * archiveUploads, :539-556 Delete): eligible uploads get their
    * staging-file ledger rows BACKED UP to the archive as json.gz and
    * then DELETED from the live ledger, with the "archived" flag
    * (here: a watermark in the tracker file, the reference's
    * metadata->archivedStagingAndLoadFiles) committing only AFTER
    * backup + delete.
    *
    * Scale contract (the reference pages maxLimit uploads per Do()
    * iteration — archiver.go:539-556): the eligible set is a
    * DataFrame, NEVER collected whole. Each page is a bounded
    * `TakeOrdered(maxLimit)` in ascending upload order, and the whole
    * page backs up in ONE distributed job (dynamic-partitioned json
    * write + per-upload metadata renames), so driver memory is
    * O(maxLimit) and the job count is O(eligible/maxLimit) — not one
    * Spark job per upload, which at ~2e8 uploads (event_count/500 at
    * 100 TB) would be a driver-sized loop. Ascending-order processing
    * makes the committed flag a single watermark: done ≡
    * upload ≤ watermark, O(1) tracker state at any corpus size.
    *
    * Crash anywhere resumes at most the in-flight PAGE: backups are
    * overwrite-idempotent (a crash between backup and delete
    * re-backs-up the same rows), and a live dir already gone means
    * its backup had committed (backup strictly precedes delete), so
    * resume only heals the flag by advancing the watermark.
    *
    * Live layout contract: `livePath/upload=K` parquet dirs (the
    * ledger partitioned by its archival unit); backups land at
    * `archivePath/part_K` with `upload` carried as a data column.
    *
    * @param eligible one LONG column `upload`; must be re-evaluable
    *                 (it is scanned once per page plus one count).
    * @return (eligibleTotal, archivedThisCall) — a resumed/re-run job
    *         reports 0 archived, rg1's resume-accounting contract.
    */
  def warehouseArchivePaged(spark: SparkSession, livePath: String,
                            archivePath: String, eligible: DataFrame,
                            jobId: String, maxLimit: Int = 500): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(livePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val arch = new Path(archivePath)
    fs.mkdirs(arch)
    val tracker = new Path(arch, "_archive_tracker.txt")
    // tracker format: line0 = jobId, line1 = watermark (highest upload
    // id whose archival has committed; absent = none yet)
    def readWatermark(): Option[Long] =
      if (!fs.exists(tracker)) None
      else {
        val in = fs.open(tracker)
        val lines =
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
          finally in.close()
        if (lines.headOption.contains(jobId)) lines.drop(1).headOption.map(_.toLong)
        else { writeTracker(None); None } // new/stale job: restart tracker
      }
    def writeTracker(wm: Option[Long]): Unit = {
      val tmp = new Path(arch, "_archive_tracker.txt.tmp")
      val out = fs.create(tmp, true)
      try out.write((jobId +: wm.map(_.toString).toSeq)
        .mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
      fs.delete(tracker, false)
      if (!fs.rename(tmp, tracker))
        throw new java.io.IOException(s"cannot commit tracker $tracker")
    }
    var watermark = readWatermark()
    if (watermark.isEmpty) writeTracker(None) // claim the job id first
    val nEligible = eligible.count()
    var archivedNow = 0L
    var more = true
    while (more) {
      val page = eligible
        .filter(watermark.map(w => col("upload") > w).getOrElse(lit(true)))
        .orderBy(col("upload")).limit(maxLimit)
        .collect().map(_.getLong(0)) // bounded: ≤ maxLimit ids
      if (page.isEmpty) more = false
      else {
        val present = page.filter(k => fs.exists(new Path(root, s"upload=$k")))
        if (present.nonEmpty) {
          // ONE distributed backup job for the whole page: read the
          // page's live dirs together, re-emit `upload` as a payload
          // column (partitionBy strips its key from the json), write
          // dynamic-partitioned, then commit each upload's backup with
          // a metadata rename into its `part_K` home.
          val staging = new Path(arch, "_page_staging")
          fs.delete(staging, true)
          spark.read.option("basePath", livePath)
            .parquet(present.map(k => s"$livePath/upload=$k"): _*)
            .withColumn("upload", col("upload").cast("long"))
            .withColumn("__part", col("upload"))
            .repartition(col("__part"))
            .write.partitionBy("__part").mode("overwrite")
            .option("compression", "gzip").json(staging.toString)
          present.foreach { k =>
            val backupDir = new Path(arch, s"part_$k")
            fs.delete(backupDir, true) // stale half-written attempt
            if (!fs.rename(new Path(staging, s"__part=$k"), backupDir))
              throw new java.io.IOException(s"cannot commit backup $backupDir")
          }
          fs.delete(staging, true)
          present.foreach(k => fs.delete(new Path(root, s"upload=$k"), true))
          archivedNow += present.length
        }
        // page members with no live dir: a prior crash fell between
        // delete and flag — the backup committed before the delete,
        // so advancing the watermark is the flag-only heal
        watermark = Some(page.max)
        writeTracker(watermark)
      }
    }
    (nEligible, archivedNow)
  }

  /** Seq-of-ids convenience wrapper over [[warehouseArchivePaged]]
    * (tests and small callers); production callers pass the eligible
    * DataFrame so nothing corpus-sized ever reaches the driver.
    */
  def warehouseArchive(spark: SparkSession, livePath: String, archivePath: String,
                       uploads: Seq[Long], jobId: String): (Long, Long) = {
    import spark.implicits._
    warehouseArchivePaged(spark, livePath, archivePath,
      uploads.toDF("upload"), jobId)
  }

  /** Storage GC for swap-managed directories — the VACUUM step of a
    * maintenance window. The swap protocol cleans its own leftovers on
    * the NEXT swap of the same table, but a table that is never
    * rewritten again would keep a stranded `__staging` (a crash during
    * write) or `__old` (a crash after swap-in, before cleanup)
    * forever — at 100 TB that is real storage. Scans one parent
    * directory and, per table: deletes orphaned staging dirs, deletes
    * superseded `__old` versions whose live table exists, and heals
    * the one dangerous state (an `__old` with NO live table — a crash
    * inside the swap window) by restoring it, same as recoverSwap.
    *
    * The no-swap-in-flight caller contract is backstopped by a grace
    * window: a candidate dir whose own (or immediate children's)
    * modification time is within `graceMs` of now is skipped — a
    * concurrent writer's live staging dir shows fresh mtimes, while a
    * genuinely stranded leftover has been cold for hours. Pass
    * graceMs = 0 only when the caller can actually guarantee quiesce.
    *
    * @return (action, path) ledger of what was done.
    */
  def vacuum(spark: SparkSession, parent: String,
             graceMs: Long = 15 * 60 * 1000L): Seq[(String, String)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(parent)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val now = System.currentTimeMillis()
    def recentlyTouched(d: Path): Boolean = {
      if (graceMs <= 0L) return false
      val self = fs.getFileStatus(d).getModificationTime
      val kids = fs.listStatus(d).map(_.getModificationTime)
      now - (self +: kids).max < graceMs
    }
    fs.listStatus(p).toSeq.map(_.getPath).flatMap { child =>
      val name = child.getName
      if (!name.endsWith("__staging") && !name.endsWith("__old")) None
      else if (recentlyTouched(child))
        Some("skipped_recent" -> child.toString)
      else if (name.endsWith("__staging")) {
        fs.delete(child, true)
        Some("removed_staging" -> child.toString)
      } else {
        val target = new Path(p, name.stripSuffix("__old"))
        if (fs.exists(target)) {
          fs.delete(child, true)
          Some("removed_old" -> child.toString)
        } else if (fs.rename(child, target))
          Some("restored" -> target.toString)
        else throw new java.io.IOException(s"cannot restore $child to $target")
      }
    }
  }

  /** L10: datalake sink — date-partitioned columnar layout
    * (warehouse/integrations/datalake/): partition pruning on
    * event_date is what makes downstream time-range scans cheap.
    * Repartition on the partition column first so each date gets one
    * well-sized file instead of one per task — the same small-files
    * guard as the archiver (at 1000 tasks x 365 dates, the naive
    * write is 365k tiny files).
    */
  def datalakeWrite(df: DataFrame, dir: String): Unit =
    df.withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("append")
      .partitionBy("event_date")
      .parquet(dir)

  /** SNAPSHOT VERSIONING (poor-man's time travel, the Delta/Iceberg
    * contract on plain parquet): each commit writes a complete
    * snapshot under a staged dot-directory, then one atomic rename
    * publishes it as `v=N` — a crash mid-write leaves only the
    * invisible staging dir, so the previous version stays the
    * readable latest and a reader never sees a partial snapshot.
    * Returns the committed version number.
    */
  def versionedWrite(df: DataFrame, dir: String): Long = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = latestVersion(spark, dir).map(_ + 1L).getOrElse(0L)
    val staging = new Path(s"$dir/.staging_v$next")
    fs.delete(staging, true)
    df.write.parquet(staging.toString)
    val live = new Path(s"$dir/v=$next")
    if (!fs.rename(staging, live))
      throw new java.io.IOException(s"cannot publish version $next at $live")
    next
  }

  /** Highest committed version, None for an empty/absent table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) None
    else fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .reduceOption(_ max _)
  }

  /** Read a specific snapshot (time travel) or the latest. */
  def readVersion(spark: SparkSession, dir: String,
                  version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir))
      .getOrElse(throw new java.util.NoSuchElementException(s"no versions at $dir"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Retention for the versioned table: drop all but the newest
    * `keep` snapshots (plus any crashed-commit staging leftovers).
    * Deleting a whole `v=N` dir is atomic-enough for readers pinned
    * to newer versions; the latest is never deleted (keep >= 1).
    * Returns the removed version numbers.
    */
  def vacuumVersions(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least the latest version")
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(dir))) return Seq.empty
    fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(_.getName.startsWith(".staging_v"))
      .foreach(fs.delete(_, true))
    val versions = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).sorted
    val drop = versions.dropRight(keep)
    drop.foreach(v => fs.delete(new Path(s"$dir/v=$v"), true))
    drop.toSeq
  }

  /** Warehouse SOURCE-JOB execution lifecycle (reference:
    * warehouse/source/source.go:63-276 + internal/repo/source.go):
    * pending reverse-ETL source jobs walk waiting → executing →
    * succeeded / failed / aborted with the repo's exact attempt
    * algebra — on failure `status = CASE WHEN attempt > maxAttempt
    * THEN aborted ELSE failed END, attempt = attempt + 1` (the
    * PRE-increment attempt is compared, so a job gets maxAttempt + 2
    * tries before aborting), on success attempt is left as the
    * number of failures that preceded it. Run() first Resets
    * executing|failed jobs back to waiting (crash recovery — a claim
    * published but never resolved must requeue WITHOUT counting as a
    * failure), then drains GetToProcess pages of `batchSize`
    * (waiting|failed, job-id order) until none remain.
    *
    * The ledger is an l2-style append-only state log (latest seq per
    * job wins) so every transition is a new parquet row — the
    * executing append IS the crash window Reset covers, which the
    * `crashAfterBatches` hook exposes to SinksSpec. The job table is
    * control-plane metadata (one row per (jobRun, table), never
    * event-grain), so the per-page collect is batchSize-bounded and
    * the round count is bounded by (maxAttempt + 2) · ceil(jobs /
    * batchSize) — at 100 TB the data this lifecycle gates moves
    * through l12/rg1's distributed paths; only the STATE lives here.
    *
    * Try outcomes are delegated (the reference's notifier round-trip);
    * `outcome(jobRunId, tableName, tryNo)` must be deterministic so a
    * resumed run converges to the uninterrupted run's terminal states.
    * Returns (jobs executed, terminal states appended) — a resume on
    * a drained ledger does (0, 0).
    */
  def sourceJobsRun(spark: SparkSession, ledgerDir: String, jobs: DataFrame,
                    maxAttempt: Int, batchSize: Int,
                    outcome: (String, String, Long) => Boolean,
                    crashAfterBatches: Int = Int.MaxValue): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    val fs = new Path(ledgerDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(ledgerDir))) // InsertJobs: seed waiting rows
      jobs.select(col("job_id"), col("job_run_id"), col("table_name"),
          lit(0L).as("seq"), lit("waiting").as("status"), lit(0L).as("attempt"))
        .write.parquet(ledgerDir)
    // ONE distributed read establishes the latest state per job; the
    // drain loop then evolves a DRIVER map — the ledger is metadata-
    // grain (one row per (jobRun, table) transition), so this collect
    // is the same jobs-bound as any GetToProcess page, and it removes
    // the per-page full-ledger window re-read that made a 15-row
    // board cost ~10 Spark jobs. Appends stay distributed and
    // BYTE-IDENTICAL to the paged form: durability and the
    // crash-window semantics live in the parquet log, not the map.
    val wLatest = Window.partitionBy(col("job_id")).orderBy(col("seq").desc)
    val init = spark.read.parquet(ledgerDir)
      .withColumn("rn", row_number().over(wLatest)).filter(col("rn") === 1)
      .select("job_id", "job_run_id", "table_name", "seq", "status", "attempt")
      .collect()
    // job_id -> (run, table, status, attempt)
    val state = scala.collection.mutable.Map(init.map(r =>
      r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(4), r.getLong(5)))): _*)
    var seq = init.map(_.getLong(3)).foldLeft(0L)(math.max)
    def append(rows: Seq[(Long, String, String, Long, String, Long)]): Unit = {
      val sess = spark
      import sess.implicits._
      rows.foreach { case (id, run, tbl, _, st, att) => state(id) = (run, tbl, st, att) }
      rows.toDF("job_id", "job_run_id", "table_name", "seq", "status", "attempt")
        .coalesce(1).write.mode("append").parquet(ledgerDir)
    }
    // Reset (repo/source.go Reset): executing|failed -> waiting,
    // attempt PRESERVED (a crash is not a failure)
    val stuck = state.toSeq.collect {
      case (id, (run, tbl, st, att)) if st == "executing" || st == "failed" =>
        (id, run, tbl, att)
    }
    if (stuck.nonEmpty) {
      seq += 1
      append(stuck.map { case (id, run, tbl, att) => (id, run, tbl, seq, "waiting", att) })
    }
    var executed = 0L
    var terminal = 0L
    var batches = 0
    var drained = false
    while (!drained && batches < crashAfterBatches) {
      val page = state.toSeq.collect { // GetToProcess page, job-id order
        case (id, (run, tbl, st, att)) if st == "waiting" || st == "failed" =>
          (id, run, tbl, att)
      }.sortBy(_._1).take(batchSize)
      if (page.isEmpty) drained = true
      else {
        batches += 1
        seq += 1 // MarkExecuting's seq still precedes the outcomes' seq
        val claims = page.map { case (id, run, tbl, att) =>
          (id, run, tbl, seq, "executing", att) }
        if (batches != crashAfterBatches) {
          // ONE append per batch: the claim rows and the outcome rows
          // land in a single file with their distinct seqs, so the log
          // content (and latest-seq read) is byte-identical to the
          // two-append form at half the write jobs. The separate
          // claim-first commit protected the reference's EXTERNAL
          // notifier round-trip; here the outcome is a pure local
          // function, and convergence under a mid-batch crash is
          // unchanged either way (lost claims re-drain as waiting,
          // durable claims Reset to waiting — deterministic outcomes
          // make both converge to the same terminal ledger).
          seq += 1
          append(claims ++ page.map { case (id, run, tbl, att) =>
            executed += 1
            if (outcome(run, tbl, att + 1)) { terminal += 1; (id, run, tbl, seq, "succeeded", att) }
            else if (att > maxAttempt) { terminal += 1; (id, run, tbl, seq, "aborted", att + 1) }
            else (id, run, tbl, seq, "failed", att + 1)
          })
        } else append(claims) // crash point: claims out, no outcomes back
      }
    }
    (executed, terminal)
  }

  /** JobsDB read-excluded partitions — the persisted partition
    * blocklist that read queries must skip (reference:
    * jobsdb/jobsdb_read_excluded_partitions.go:15-116). The reference
    * keeps a `{prefix}_read_excluded_partitions` table (add =
    * `ON CONFLICT DO NOTHING`, remove = DELETE) mirrored into an
    * in-memory set that jobsdb_get.go:436-445 anti-filters reads on
    * (`NOT EXISTS` against the exclusions table), UNLESS the caller
    * passes explicit partitionFilters — exclusions and filters are
    * mutually exclusive (jobsdb_get.go:431-433).
    *
    * Spark mapping: an append-only parquet op log `(seq, op,
    * partition_id)` with latest-op-wins reconstruction — the same
    * crash-safe ledger shape as sourceJobsRun. Idempotence comes out
    * structurally: adding an already-excluded id or removing an
    * absent one appends NOTHING (the reference's no-op INSERT/DELETE),
    * so replayed batches cannot grow the log. The set is
    * metadata-grain (≤ workspaces × numPartitions ids), so the
    * driver-side collect is the same bound as the reference's
    * in-memory map, and readers consume it as a broadcast anti-join —
    * the 100 TB scan never shuffles.
    */
  def readExcludedPartitionIDs(spark: SparkSession, ledgerDir: String): Seq[String] = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.expressions.Window
    val fs = new Path(ledgerDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(ledgerDir))) Seq.empty
    else {
      // seq ties (possible only if two writers raced the read-modify-
      // write in appendExclusionOps) break on op: "add" < "remove", so
      // a tied add/remove pair reconstructs as EXCLUDED — deterministic
      // and conservative (a skipped partition is re-openable; a read of
      // a meant-to-be-excluded one is not)
      val wLatest = Window.partitionBy(col("partition_id"))
        .orderBy(col("seq").desc, col("op").asc)
      spark.read.parquet(ledgerDir)
        .withColumn("rn", row_number().over(wLatest)).filter(col("rn") === 1)
        .filter(col("op") === "add")
        .select("partition_id")
        .collect().map(_.getString(0)).toSeq.sorted
    }
  }

  /** Single-writer by contract, like the reference: jobsdb serializes
    * exclusion mutations through one owner process (the table writes
    * ride its connection), and this ledger likewise assumes one
    * mutator at a time — seq0 = max(seq)+1 is a read-modify-write, so
    * two RACING writers could append ops with equal seq. Readers stay
    * deterministic anyway: reconstruction breaks seq ties on op (add
    * wins — see readExcludedPartitionIDs), so a race degrades to a
    * conservative extra exclusion, never to nondeterminism.
    */
  private def appendExclusionOps(spark: SparkSession, ledgerDir: String,
                                 op: String, ids: Seq[String]): Long = {
    if (ids.isEmpty) 0L
    else {
      val sess = spark
      import sess.implicits._
      val current = readExcludedPartitionIDs(spark, ledgerDir).toSet
      // the reference dedups (lo.Uniq) and sorts (deadlock avoidance —
      // here: deterministic ledger bytes) before writing
      val effective = ids.distinct.sorted.filter(id =>
        if (op == "add") !current.contains(id) else current.contains(id))
      if (effective.isEmpty) 0L
      else {
        import org.apache.hadoop.fs.Path
        val fs = new Path(ledgerDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
        val seq0 =
          if (!fs.exists(new Path(ledgerDir))) 0L
          else spark.read.parquet(ledgerDir).agg(max(col("seq"))).collect()(0).getLong(0)
        effective.map(id => (seq0 + 1L, op, id)).toDF("seq", "op", "partition_id")
          .coalesce(1).write.mode("append").parquet(ledgerDir)
        effective.size.toLong
      }
    }
  }

  /** Add partition IDs to the read-exclusion list; returns how many
    * were newly excluded (duplicates within the batch and already-
    * excluded ids are no-ops, the `ON CONFLICT DO NOTHING` contract).
    */
  def addReadExcludedPartitionIDs(spark: SparkSession, ledgerDir: String,
                                  ids: Seq[String]): Long =
    appendExclusionOps(spark, ledgerDir, "add", ids)

  /** Remove partition IDs from the read-exclusion list; absent ids
    * are no-ops (the reference's unconditional DELETE). Returns how
    * many were actually un-excluded.
    */
  def removeReadExcludedPartitionIDs(spark: SparkSession, ledgerDir: String,
                                     ids: Seq[String]): Long =
    appendExclusionOps(spark, ledgerDir, "remove", ids)
}
