package graft.streaming

import graft.operators.Search
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming POSTINGS-INDEX maintenance — the search family's
  * incremental fold (the batch side already has
  * `Dedup.refreshIncrementally`'s splice; this is the crawl-stream
  * sibling): as document batches arrive, each batch's (doc_id, w, tf)
  * postings — derived through the SAME `Search.postingsOf` transform
  * the full build and the splice use — append to a maintained store,
  * together with the batch's per-term document-frequency deltas, so
  * the ts1/ts3/ts8 read shapes (matched postings + df + corpus size)
  * stay current without re-tokenizing the corpus per boundary.
  *
  * Per-batch cost is the batch's own tokenization plus three
  * batch-sized writes — the accumulated index is never rewritten
  * (compaction aside) and never re-scanned by the fold itself.
  * df is maintained ADDITIVELY: each batch writes (w, dfd) rows for
  * its own fresh docs, and [[readDf]] sums — so the read is
  * vocabulary-grain, not postings-grain. Corpus size rides the docs
  * ledger, which doubles as the first-write-wins guard (a re-crawled
  * doc in a later batch is an index MERGE — a different op, same rule
  * as CorpusStream).
  *
  * State stores (per-batch `batch_id=N` partitions, overwrite mode —
  * the shared at-least-once replay contract):
  *   postings (doc_id, w, tf)   the inverted index
  *   dfd      (w, dfd)          per-batch document-frequency deltas
  *   docs     (doc_id)          the first-write-wins ledger
  * [[compactState]] folds committed partitions into LSM range
  * sentinels (df deltas re-sum to one row per term — the
  * read-equivalence is what StreamingSpec pins), with the in-flight
  * batch left out so it keeps its own partition until committed.
  */
object SearchStream {

  private[graft] val stores: Seq[String] = Seq("postings", "dfd", "docs")

  /** One micro-batch of (doc_id, text): append postings + df deltas
    * for first-seen docs. Idempotent under replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   batchId: Long): Unit = {
    val postingsDir = s"$stateDir/postings"
    val dfdDir = s"$stateDir/dfd"
    val docsDir = s"$stateDir/docs"
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val docsIdx = StateCompaction.readState(spark, docsDir, batchId)
    // first-write-wins: a doc re-delivered in a later batch is skipped
    val fresh = docsIdx.fold(batch)(d =>
        batch.join(d, Seq("doc_id"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val p = Search.postingsOf(fresh.select(col("doc_id"), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        p.write.mode("overwrite").parquet(s"$postingsDir/batch_id=$batchId")
        // df delta: each (doc, w) posting row is one document holding w
        p.groupBy(col("w")).agg(count(lit(1)).as("dfd"))
          .write.mode("overwrite").parquet(s"$dfdDir/batch_id=$batchId")
        fresh.select(col("doc_id"))
          .write.mode("overwrite").parquet(s"$docsDir/batch_id=$batchId")
      } finally p.unpersist()
    } finally fresh.unpersist()
  }

  private def readAll(spark: SparkSession, dir: String): Option[DataFrame] =
    StateCompaction.readVisible(spark, dir).map(_.drop("batch_id"))

  /** The accumulated (doc_id, w, tf) index — ts1/ts3's scan shape. */
  def readPostings(spark: SparkSession, stateDir: String): DataFrame =
    readAll(spark, s"$stateDir/postings").getOrElse {
      val sess = spark
      import sess.implicits._
      Seq.empty[(Long, String, Long)].toDF("doc_id", "w", "tf")
    }

  /** (w, df) — the additive delta store summed at vocabulary grain. */
  def readDf(spark: SparkSession, stateDir: String): DataFrame =
    readAll(spark, s"$stateDir/dfd")
      .map(_.groupBy(col("w")).agg(sum(col("dfd")).as("df")))
      .getOrElse {
        val sess = spark
        import sess.implicits._
        Seq.empty[(String, Long)].toDF("w", "df")
      }

  /** Indexed-corpus size (the ledger count — ts1's N scalar). */
  def readDocCount(spark: SparkSession, stateDir: String): Long =
    readAll(spark, s"$stateDir/docs").fold(0L)(_.count())

  /** Fold committed partitions into LSM range sentinels; df deltas
    * re-sum to one row per term. The in-flight batch is left out (the
    * cross-store crash contract).
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        keep = if (name == "dfd")
          df => df.groupBy(col("w")).agg(sum(col("dfd")).as("dfd"))
        else identity,
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: a (doc_id, text) crawl stream → maintained
    * postings index + df deltas + doc ledger, compacted every
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
