package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared per-batch state-store compaction (r16 verdict item #2) for
  * the foreachBatch streams (ReleaseStream, SubstrStream,
  * CorpusStream): every micro-batch appends one `batch_id=N`
  * partition per store, so a long stream pays a small-file tax plus
  * an O(batches) listing per boundary. Compaction folds a store's
  * committed partitions into a single `batch_id=-1` partition — a
  * sentinel no real foreachBatch id takes, so the streams' replay
  * exclusion (`batch_id =!= batchId`) still works, and a replayed
  * pre-compaction batch finds its rows already in the compacted
  * state and anti-joins to a no-op. Crash-atomic per store via the
  * staged-swap protocol (the write lands in a staging dir; the live
  * dir is swapped in two renames with self-healing recovery).
  */
private[streaming] object StateCompaction {

  /** True iff a parquet DATA file exists anywhere under `path`. Two
    * callers need it: a store that exists but holds no data files is
    * unreadable (schema inference fails), and a store can legally get
    * into that state — a dynamic-partition (`partitionBy`) write of
    * ZERO rows creates only `_SUCCESS` (ReleaseStream's frontier on an
    * all-gated batch; any store's compaction when nothing has accrued
    * yet), unlike a plain write whose empty file still carries schema.
    */
  private[streaming] def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    }
  }

  /** The ONE per-batch state-read idiom every foreachBatch stream
    * uses: self-heal a crashed swap first (the Sinks contract — every
    * reader/writer of a swapped table calls recoverSwap, else a crash
    * between compaction's two renames strands the committed state at
    * `<path>__old` and the stream silently restarts from empty), then
    * read the store excluding the batch's own previously-committed
    * partition (at-least-once replay). None when the store has no
    * data yet — including the fileless-directory states above.
    */
  def readState(spark: SparkSession, dir: String,
                excludeBatchId: Long): Option[DataFrame] = {
    graft.sinks.Sinks.recoverSwap(spark, dir)
    if (!hasDataFiles(spark, dir)) None
    else Some(spark.read.parquet(dir)
      .filter(col("batch_id") =!= excludeBatchId)
      .drop("batch_id"))
  }

  /** Heal a crashed swap on every listed store — processBatch calls
    * this up front so stores it only WRITES this batch (pairs,
    * release, cuts) recover too before their dirs are recreated,
    * which would otherwise break recoverSwap's `!exists(target)`
    * precondition forever.
    */
  def heal(spark: SparkSession, paths: Seq[String]): Unit =
    paths.foreach(graft.sinks.Sinks.recoverSwap(spark, _))

  /** Fold `path`'s COMMITTED batch partitions into `batch_id=-1`.
    * `keep` filters the surviving rows (identity for append-only
    * stores; latest-per-key for versioned ones); `bucketCol` preserves
    * an extra partition column for stores read with partition pruning.
    * `targetFiles` bounds the compacted file count (per bucket, when
    * bucketed). A missing or still-empty store is a no-op.
    *
    * `excludeBatchId` is the IN-FLIGHT batch: compaction runs inside
    * the foreachBatch callback, BEFORE the checkpoint commits the
    * batch, and the swap is atomic per store but not across a
    * stream's store set. Folding the in-flight batch's partition into
    * the sentinel would let a crash between two stores' swaps corrupt
    * the replay: already-compacted stores expose the batch's own rows
    * as "prior" state (the `batch_id =!= batchId` replay exclusion no
    * longer filters them — a replayed doc gates as a dup of itself,
    * window hashes double-count), while a not-yet-compacted OUTPUT
    * store gets its partition overwritten by the now-no-op replay and
    * loses the rows forever. So the in-flight partition is carried
    * through the swap VERBATIM under its own batch_id: every store
    * then reads identically pre- and post-compaction under the
    * replay exclusion, whichever subset of stores the crash left
    * compacted. The partition folds on the NEXT cycle, when its batch
    * is checkpoint-committed and can never replay again.
    */
  def compactStore(spark: SparkSession, path: String, targetFiles: Int,
                   keep: DataFrame => DataFrame = identity,
                   bucketCol: Option[String] = None,
                   excludeBatchId: Long = Long.MinValue): Unit = {
    graft.sinks.Sinks.recoverSwap(spark, path)
    if (hasDataFiles(spark, path)) {
      val all = spark.read.parquet(path)
      // the in-flight batch's rows pass through untouched — same
      // partition id, exempt from the keep rule (a versioned store's
      // replayed batch must re-find the exact pre-crash layout)
      val inFlight = all.filter(col("batch_id").cast("long") === excludeBatchId)
        .withColumn("batch_id", col("batch_id").cast("long"))
      val base = keep(all.filter(col("batch_id").cast("long") =!= excludeBatchId))
        .drop("batch_id").withColumn("batch_id", lit(-1L))
      val compacted = bucketCol match {
        // co-partition by the pruning key so each bucket directory
        // lands as ~one file, not targetFiles shards
        case Some(c) => base.repartition(targetFiles, col(c))
        case None => base.repartition(targetFiles)
      }
      graft.sinks.Sinks.atomicSwap(spark, path) { staging =>
        compacted.unionByName(inFlight).write.mode("overwrite")
          .partitionBy("batch_id" +: bucketCol.toSeq: _*).parquet(staging)
      }
    }
  }

  /** keep-rule: only each doc's LATEST batch version survives (the
    * versioned-store semantics — a later re-cut supersedes). */
  def latestPerDoc(all: DataFrame): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    all.withColumn("mx", max(col("batch_id").cast("long")).over(byDoc))
      .filter(col("batch_id").cast("long") === col("mx")).drop("mx")
  }

  /** keep-rule: only the LATEST batch boundary survives (stores whose
    * earlier partitions are superseded wholesale). Empty input (every
    * row belongs to the excluded in-flight batch) stays empty. */
  def latestBoundary(all: DataFrame): DataFrame = {
    val latest = all.agg(max(col("batch_id").cast("long"))).head.get(0)
    if (latest == null) all.limit(0)
    else all.filter(col("batch_id").cast("long") === latest.asInstanceOf[Long])
  }
}
