package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus INTAKE — cp1's composed pipeline lifted into
  * Structured Streaming and fused with CorpusStream's incremental
  * near-dup index: each micro-batch of raw documents is language-ID'd
  * and quality-gated (the ta1/ta2 stages), only `keep` documents flow
  * into the near-dup probe + signature index, and a per-batch intake
  * ledger records what arrived and what survived, per (predicted
  * language, verdict).
  *
  * Crash contract: all three outputs (ledger, pairs, index) land in
  * per-batch `batch_id=N` directories written with overwrite mode, so
  * at-least-once foreachBatch replay is idempotent — the same
  * contract as SchemaEvolution and CorpusStream, here covering a
  * THREE-output batch.
  *
  * At 100 TB the gates are the narrow codegen'd maps they are in
  * cp1; only kept documents pay for shingling, and the index state
  * stays signature-sized.
  */
object IntakeStream {

  /** One micro-batch: gate → ledger → near-dup index/pairs. */
  def processBatch(spark: SparkSession, docs: DataFrame, indexDir: String,
                   pairsDir: String, ledgerDir: String, batchId: Long): Unit = {
    val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val staged = TextAnalysis.withQualityVerdict(
      TextAnalysis.withLangPrediction(
        docs.withColumn("ws", split(col("text"), " "))))
      .persist(store) // feeds the ledger aggregate AND the kept filter
    try {
      staged.groupBy(col("predicted"), col("verdict"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
        .write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
      val kept = staged.filter(col("verdict") === "keep")
        .select(col("doc_id"), col("text"))
      CorpusStream.processBatch(spark, kept, indexDir, pairsDir, batchId)
    } finally staged.unpersist()
  }

  /** The streaming entry: raw (doc_id, text) stream → intake ledger +
    * gated near-dup index + pair output.
    */
  def start(docs: DataFrame, indexDir: String, pairsDir: String,
            ledgerDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, indexDir, pairsDir, ledgerDir, batchId)
        ()
      }
      .start()

  def readLedger(spark: SparkSession, ledgerDir: String): DataFrame =
    spark.read.parquet(ledgerDir)
}
