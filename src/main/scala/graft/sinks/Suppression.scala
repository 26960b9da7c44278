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

  /** Token-paged sync (syncer.go Sync): pull pages of `pageSize`
    * regulations with seq above the stored token, append each page
    * with its token update (the crash window is one page — a resumed
    * sync re-pulls at most the un-tokened page, and appends are
    * idempotent at the entry grain because seq is the key), converge
    * when a page comes back short. Returns rows synced.
    */
  def sync(spark: SparkSession, storeDir: String, feed: DataFrame,
           pageSize: Int): Long = {
    require(pageSize > 0, s"pageSize $pageSize must be positive")
    var tok = token(spark, storeDir)
    var synced = 0L
    var done = false
    while (!done) {
      val page = feed.filter(col("seq") > tok)
        .orderBy(col("seq")).limit(pageSize)
        .collect() // ≤ pageSize regulation entries — the reference holds a page in memory too
      if (page.nonEmpty) {
        val sess = spark
        import sess.implicits._
        spark.createDataFrame(
            spark.sparkContext.parallelize(page.toIndexedSeq, 1),
            feed.schema)
          .write.mode("append").parquet(storeDir)
        tok = page.map(_.getAs[Long]("seq")).max
        writeToken(spark, storeDir, tok)
        synced += page.length
      }
      done = page.length < pageSize
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
