package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus maintenance — the ll14 incremental near-dup shape
  * lifted into Structured Streaming: each micro-batch of new documents
  * is probed against the signature index accumulated from every prior
  * batch (plus itself, for batch-internal duplicates), emits verified
  * near-dup pairs, and then joins the index. The streaming twin of a
  * crawl frontier feeding a 100 TB deduplicated corpus.
  *
  * State is the MinHash signature index (16 hex strings per document —
  * thousands of times smaller than the text it summarizes), persisted
  * as parquet under per-batch `batch_id=N` directories written with
  * overwrite mode, so at-least-once foreachBatch replay is idempotent
  * for BOTH outputs (pairs and index) — the same crash contract as
  * SchemaEvolution. On replay the probe excludes the batch's own
  * previously-committed index partition, so a re-delivered batch
  * cannot pair against its own first attempt.
  *
  * At scale the index would be bucketed by band key so the probe join
  * co-locates without a corpus-side shuffle; here the layout choice is
  * isolated behind the two read/write sites.
  */
object CorpusStream {

  /** One micro-batch of (doc_id, text): emit near-dup pairs vs the
    * index so far (and within the batch), then add the batch to the
    * index. Both writes are idempotent under replay of `batchId`.
    * Documents whose doc_id is already indexed are skipped entirely
    * (first-write-wins — a source-level re-delivery in a LATER batch
    * must not double-index a document or re-emit its pairs; updating
    * a recrawled document would be an index merge, a different op).
    */
  def processBatch(spark: SparkSession, docs: DataFrame, indexDir: String,
                   pairsDir: String, batchId: Long): Unit = {
    val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // shared swap-healing, replay-excluding, fileless-tolerant read;
    // heal the write-only pairs store too before its dir is recreated
    StateCompaction.heal(spark, Seq(indexDir, pairsDir))
    val indexSigs = StateCompaction.readState(spark, indexDir, batchId)
      // feeds the band probe AND both verify joins — one index scan
      .map(_.persist(store))
    val batchSigs = {
      val sigs = Dedup.minhashSignatures(Dedup.shingles(docs))
      // first-write-wins: drop batch docs whose id is already indexed
      indexSigs.fold(sigs)(idx =>
        sigs.join(idx.select(col("doc_id")), Seq("doc_id"), "left_anti"))
    }.persist(store)
    try {
      val batchBands = Dedup.bandRowsOf(batchSigs)
      // batch-internal candidates: ordered self-join (smaller, larger)
      val internal = batchBands.as("x").join(batchBands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      // cross candidates: batch bands probe the index bands; the two
      // id sets are disjoint (anti-join above), and orientation is
      // normalized explicitly — doc_ids carry NO arrival-order
      // meaning, so a new doc with a smaller id than its indexed
      // match must still pair
      val cross = indexSigs.map { idx =>
        Dedup.bandRowsOf(idx).as("y").join(batchBands.as("x"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
          .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      }
      val cand = cross.fold(internal)(internal.unionByName(_)).distinct()
      val allSigs = indexSigs.fold(batchSigs)(_.unionByName(batchSigs))
      Dedup.verifyPairs(cand, allSigs)
        .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
      batchSigs.write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    } finally {
      batchSigs.unpersist()
      indexSigs.foreach(_.unpersist())
    }
  }

  /** Fold the index's (and the pairs output's) per-batch partitions
    * into LSM range sentinels (StateCompaction): the index is
    * re-listed and re-read EVERY batch, so thousands of batches pay
    * a small-file tax plus an O(batches) listing per probe. The pairs
    * output compacts too — not for read cost (it is a sink, never
    * probed) but because a replayed pre-compaction batch overwrites
    * its own pairs partition with the empty no-op result, and the
    * original rows must already live in a sentinel by then.
    * Compaction trades per-batch provenance on compacted history for
    * bounded files; every row is preserved.
    */
  def compactState(spark: SparkSession, indexDir: String, pairsDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    Seq(indexDir, pairsDir).foreach(
      StateCompaction.compactStore(spark, _, targetFiles,
        excludeBatchId = excludeBatchId))

  /** The streaming entry: (doc_id, text) stream → growing signature
    * index + per-batch near-dup pair output, compacted every
    * `compactEvery` batches (0 disables).
    */
  def start(docs: DataFrame, indexDir: String, pairsDir: String,
            checkpointDir: String, compactEvery: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, indexDir, pairsDir, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          // the boundary batch is still in flight (not checkpoint-
          // committed): carry its partitions through uncompacted so a
          // crash between store swaps leaves every store replay-consistent
          compactState(batch.sparkSession, indexDir, pairsDir,
            excludeBatchId = batchId)
        ()
      }
      .start()

  /** All pairs emitted so far (batch_id retained for provenance on
    * uncompacted history). A pair-free compacted store is a fileless
    * dir (zero rows through a dynamic-partition write) — surfaced as
    * the typed empty pair set, not an AnalysisException.
    */
  def readPairs(spark: SparkSession, pairsDir: String): DataFrame =
    StateCompaction.readVisible(spark, pairsDir)
      // partition discovery infers batch_id as INT; pin it to the
      // typed-empty branch's LONG so the two states union/compare
      .map(_.withColumn("batch_id", col("batch_id").cast("long")))
      .getOrElse {
        val sess = spark
        import sess.implicits._
        Seq.empty[(Long, Long, Long, Double, Long)]
          .toDF("doc_a", "doc_b", "n_match", "est_sim", "batch_id")
      }
}
