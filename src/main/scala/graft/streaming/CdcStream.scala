package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC-CHUNK-INDEX maintenance — the chunk-occurrence
  * table's incremental fold, completing the maintained-index fleet's
  * streaming symmetry (cdctable gained the batch splice in
  * refreshIncrementally; this is its crawl-stream sibling, as
  * SearchStream is the postings table's).
  *
  * Chunking is a pure per-doc derivation through the SAME
  * [[Dedup.cdcChunks]] transform the batch build and the splice use,
  * so the fold is trivially exact: first-seen docs chunk once and
  * append. The corpus-wide duplication signal ll18 aggregates —
  * per-chunk-hash occurrence counts — is maintained ADDITIVELY like
  * SearchStream's df: each batch writes its own (h, cntd, nwd)
  * deltas, reads sum, and compaction re-sums, so the dedup-report
  * read never recounts the accumulated occurrence store.
  *
  * State stores (per-batch `batch_id=N` partitions, overwrite mode —
  * the shared at-least-once replay contract):
  *   chunks (doc_id, h, nw)   chunk occurrences per doc
  *   cnt    (h, cntd)         per-batch occurrence-count deltas
  *   docs   (doc_id)          the first-write-wins ledger
  * [[compactState]] folds committed partitions into LSM range
  * sentinels (count deltas re-sum to one row per hash), with the
  * in-flight batch left out (the cross-store crash contract).
  */
object CdcStream {

  private[graft] val stores: Seq[String] = Seq("chunks", "cnt", "docs")

  /** One micro-batch of (doc_id, text): chunk first-seen docs, append
    * occurrences + count deltas. Idempotent under replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   batchId: Long): Unit = {
    val chunksDir = s"$stateDir/chunks"
    val cntDir = s"$stateDir/cnt"
    val docsDir = s"$stateDir/docs"
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val docsIdx = StateCompaction.readState(spark, docsDir, batchId)
    // first-write-wins: a re-crawled doc is an index merge, not a fold
    val fresh = docsIdx.fold(batch.toDF("doc_id", "text"))(d =>
        batch.toDF("doc_id", "text").join(d, Seq("doc_id"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val occ = Dedup.cdcChunks(fresh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        occ.write.mode("overwrite").parquet(s"$chunksDir/batch_id=$batchId")
        occ.groupBy(col("h")).agg(count(lit(1)).as("cntd"))
          .write.mode("overwrite").parquet(s"$cntDir/batch_id=$batchId")
        fresh.select(col("doc_id"))
          .write.mode("overwrite").parquet(s"$docsDir/batch_id=$batchId")
      } finally occ.unpersist()
    } finally fresh.unpersist()
  }

  private def readAll(spark: SparkSession, dir: String): Option[DataFrame] =
    StateCompaction.readVisible(spark, dir).map(_.drop("batch_id"))

  /** The accumulated (doc_id, h, nw) occurrence store. */
  def readChunks(spark: SparkSession, stateDir: String): DataFrame =
    readAll(spark, s"$stateDir/chunks").getOrElse {
      val sess = spark
      import sess.implicits._
      Seq.empty[(Long, String, Long)].toDF("doc_id", "h", "nw")
    }

  /** (h, cnt) — the additive delta store summed at chunk-hash grain. */
  def readCounts(spark: SparkSession, stateDir: String): DataFrame =
    readAll(spark, s"$stateDir/cnt")
      .map(_.groupBy(col("h")).agg(sum(col("cntd")).as("cnt")))
      .getOrElse {
        val sess = spark
        import sess.implicits._
        Seq.empty[(String, Long)].toDF("h", "cnt")
      }

  /** ll18's dedup report off the maintained stores — one occurrence
    * scan joined to the summed counts, no re-chunking, no recount of
    * the accumulated store inside the fold.
    */
  def dedupReport(spark: SparkSession, stateDir: String): DataFrame =
    readChunks(spark, stateDir)
      .join(readCounts(spark, stateDir), "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("cnt") >= 2, col("nw")).otherwise(0L)).as("n_dup_words"))

  /** Fold committed partitions into LSM range sentinels; count deltas
    * re-sum to one row per hash. The in-flight batch is left out (the
    * cross-store crash contract).
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        keep = if (name == "cnt")
          df => df.groupBy(col("h")).agg(sum(col("cntd")).as("cntd"))
        else identity,
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: a (doc_id, text) crawl stream → maintained
    * chunk occurrences + count deltas + doc ledger, compacted every
    * `compactEvery` batches (0 disables).
    */
  def start(docs: DataFrame, stateDir: String, checkpointDir: String,
            compactEvery: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          compactState(batch.sparkSession, stateDir, excludeBatchId = batchId)
        ()
      }
      .start()
}
