package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Suppression-store backup lifecycle — the T1 family's operational
  * contract (reference: `suppression-backup-service/` +
  * `enterprise/suppress-user/`).
  *
  * The reference syncs suppression regulations from the regulation
  * service in TOKEN-PAGED batches (syncer.go:126-153: loop pages of
  * `pageSize`, store each page with its next-token, converge when a
  * page comes back short), keeps them in a local KV, and a separate
  * backup service periodically exports two artifacts: `full-export`
  * (the whole store) and `latest-export` (only the last 30 days —
  * exporter.go:215-218 starts a fresh sync from `now - 30d`). A new
  * instance boots by restoring LATEST first (small, fast to serve),
  * then building the full store from `full-export` and RESUMING the
  * sync from the backup's stored token before atomically switching
  * (factory.go:69-120's RepoSwitcher) — restore-and-resume, never
  * re-sync-from-zero.
  *
  * Spark mapping: the store is an append-only parquet log of
  * regulation entries `(seq, workspace_id, user_id, canceled,
  * created_at_us, source_ids)` plus a `_token.txt` high-water mark
  * (max synced seq — the reference's opaque page token is an ordered
  * cursor over the regulation stream). The EFFECTIVE suppression set
  * is latest-entry-wins per user with `canceled` entries
  * un-suppressing (the KV's overwrite/delete semantics, stated
  * declaratively), and readers consume it as a broadcast anti-join —
  * same as t1/t1b. Sync state is metadata-grain (a scalar token);
  * the entries themselves stay distributed parquet.
  */
object Suppression {

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's sync token: max regulation seq synced so far (0 for
    * a fresh store). Persisted beside the data so a backup carries it
    * and a restore can resume where the backup stopped.
    */
  def token(spark: SparkSession, storeDir: String): Long = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, storeDir)
    val t = new Path(storeDir, "_token.txt")
    if (!fs.exists(t)) 0L
    else {
      val in = fs.open(t)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeToken(spark: SparkSession, storeDir: String, tok: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = fsOf(spark, storeDir)
    val out = fs.create(new Path(storeDir, "_token.txt"), true)
    try out.write(s"$tok\n".getBytes("UTF-8")) finally out.close()
  }

  /** Token sync (syncer.go Sync): append every regulation with seq
    * above the stored token, then advance the token to the delta's
    * max seq. The reference loops `pageSize`d pulls because its feed
    * is a remote HTTP pager; here the feed is already a DataFrame, so
    * the whole delta is ONE distributed pass — a sync of P reference-
    * pages used to cost P TakeOrdered scans over the remaining feed
    * (O(P × feed)); now it costs one filtered append plus one
    * delta-grain aggregate, at any P. `pageSize` survives only as the
    * reference's API shape (its value no longer changes the plan —
    * the distributed write's tasks are the "pages").
    *
    * Crash contract, unchanged in kind: the token commits AFTER the
    * data, so a crash between them re-pulls the un-tokened delta on
    * resume — re-pulled rows are byte-identical (seq is the key) and
    * the effective set reads latest-per-seq, so the re-append is
    * idempotent at the entry grain. The window widened from one page
    * to one sync's delta; the reference accepts the same idempotent
    * re-pull on its own page boundary. Returns rows synced.
    */
  def sync(spark: SparkSession, storeDir: String, feed: DataFrame,
           pageSize: Int): Long = {
    require(pageSize > 0, s"pageSize $pageSize must be positive")
    val tok = token(spark, storeDir)
    // localCheckpoint pins the delta's ROWS before anything reads them:
    // the token-advance agg and the store append below consume the same
    // materialized snapshot, so a non-deterministic or shrinking feed
    // can never advance the token past a row that wasn't persisted
    // (the reference's page loop had the same single-collection
    // property — each page was pulled once and both stored and
    // tokened from that pull). Delta is control-plane grain, so the
    // eager materialization is cheap.
    // NOTE: the checkpoint's blocks live at the RDD layer, below the
    // cache manager, so Dataset.unpersist cannot free them; they are
    // reclaimed by the ContextCleaner once `delta` becomes
    // unreachable — every entry point enables referenceTracking, and
    // the blocks are control-plane-sized.
    val delta = feed.filter(col("seq") > tok).localCheckpoint(true)
    val agg = delta.agg(count(lit(1)).as("n"), max(col("seq")).as("hi")).first()
    val synced = agg.getLong(0)
    if (synced > 0) {
      // one file per sync: a regulation delta is control-plane grain
      // at any corpus size, and an un-coalesced write scatters it
      // over every shuffle partition — the store then pays a
      // small-file tax on every effective-set read
      delta.coalesce(1).write.mode("append").parquet(storeDir)
      writeToken(spark, storeDir, agg.getLong(1))
    }
    synced
  }

  /** Full export: the whole store plus its token — what
    * `/full-export` serves. One distributed write; no driver
    * materialization of the entries.
    */
  def backupFull(spark: SparkSession, storeDir: String, backupDir: String): Unit = {
    spark.read.parquet(storeDir).write.mode("overwrite").parquet(backupDir)
    writeToken(spark, backupDir, token(spark, storeDir))
  }

  /** Latest export: only entries from the trailing `windowUs` of the
    * store's regulation time — `/latest-export`'s smaller,
    * faster-to-boot artifact (exporter.go:215-218's now-30d sync
    * start). Carries the SAME token as the full store: the window is
    * a retention policy, not a sync position.
    */
  def backupLatest(spark: SparkSession, storeDir: String, backupDir: String,
                   windowUs: Long): Unit = {
    val store = spark.read.parquet(storeDir)
    val cutoff = store.agg(max(col("created_at_us"))).collect()(0).getLong(0) - windowUs
    store.filter(col("created_at_us") >= cutoff)
      .write.mode("overwrite").parquet(backupDir)
    writeToken(spark, backupDir, token(spark, storeDir))
  }

  /** Restore a backup into a fresh store dir; the restored store
    * resumes syncing from the backup's token (the badger Restore +
    * GetToken path a booting instance runs). Returns that token.
    */
  def restore(spark: SparkSession, backupDir: String, storeDir: String): Long = {
    spark.read.parquet(backupDir).write.mode("overwrite").parquet(storeDir)
    val tok = token(spark, backupDir)
    writeToken(spark, storeDir, tok)
    tok
  }

  /** The EFFECTIVE suppression set of a store: latest entry per
    * (workspace, user) wins, `canceled` un-suppresses. Output one row
    * per currently-suppressed user with its source scope (empty
    * source_ids = wildcard).
    */
  def effectiveSet(spark: SparkSession, storeDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("workspace_id"), col("user_id"))
      .orderBy(col("seq").desc)
    spark.read.parquet(storeDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(!col("canceled"))
      .select(col("workspace_id"), col("user_id"), col("source_ids"))
  }
}
