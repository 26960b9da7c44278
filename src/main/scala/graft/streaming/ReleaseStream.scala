package graft.streaming

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming PRETRAINING RELEASE — cp5's capstone pipeline lifted into
  * Structured Streaming: that is exactly how a 100 TB crawl actually
  * arrives. Each micro-batch of (doc_id, text, embedding) flows through
  * the SAME gate chain as the batch release — exact dedup vs the
  * accumulated content-hash index, MinHash near-dup vs the accumulated
  * signature index (CorpusStream's incremental-index shape), semantic
  * near-dup vs the accumulated bucketed-vector index, ll31 13-gram
  * decontamination against the static benchmark holdout, the ta2
  * quality gate, and the ta26 perplexity gate against the maintained
  * KN LM (a trained artifact — static under streaming, like the
  * holdout). Per-doc verdicts append to the attrition ledger, and the
  * RELEASE DESIGN (PPS sampling → splits → shard packing → per-gate
  * attrition + the conservation input row) is recomputed per batch
  * boundary from the ACCUMULATED attribution — the design is att-sized
  * (ids + token counts), never corpus-text-sized, so the per-batch
  * cost is the batch's own text work plus an index-grain aggregate.
  *
  * EQUIVALENCE CONTRACT (StreamingSpec pins it at every batch
  * boundary): when doc_ids arrive MONOTONICALLY (each batch's ids
  * exceed all earlier ids — the crawl-frontier contract; cp5's own
  * second crawl satisfies it, its twins live at +1e8), the fold equals
  * the batch pipeline run on the union of everything arrived:
  * duplicate attribution in the batch plan is id-ordered
  * (row_number / doc_b-drops by id), so "arrived earlier" and
  * "smaller id" pick the same survivor.
  *
  * Crash contract: all five outputs (hashes, sigs, vecs, att, release)
  * land in per-batch `batch_id=N` directories written with overwrite
  * mode, so at-least-once foreachBatch replay is idempotent — the
  * IntakeStream/CorpusStream contract, here covering a FIVE-output
  * batch. On replay each index read excludes the batch's own
  * previously-committed partition, and a doc re-delivered in a LATER
  * batch is skipped entirely (first-write-wins, keyed on the attrition
  * ledger).
  */
object ReleaseStream {

  private val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def readState(spark: SparkSession, dir: String,
                        batchId: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(dir)
      .filter(col("batch_id") =!= batchId) // replay: skip own first attempt
      .drop("batch_id"))
  }

  /** One micro-batch of (doc_id, text, embedding): gate vs the
    * accumulated indexes, append the attrition rows, re-emit the
    * cumulative release design. Every write is idempotent under
    * replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, dir: String,
                   stateDir: String, batchId: Long): Unit = {
    val hashesDir = s"$stateDir/hashes"
    val sigsDir = s"$stateDir/sigs"
    val vecsDir = s"$stateDir/vecs"
    val attDir = s"$stateDir/att"
    val releaseDir = s"$stateDir/release"
    // every frame persisted for this batch is released in finally — a
    // foreachBatch that leaks persists accumulates dead cache across
    // the life of the stream
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hot(df: DataFrame): DataFrame = { persisted += df.persist(store); df }
    val hashIdx = readState(spark, hashesDir, batchId).map(hot)
    val sigIdx = readState(spark, sigsDir, batchId).map(hot)
    val vecIdx = readState(spark, vecsDir, batchId).map(hot)
    val attIdx = readState(spark, attDir, batchId)
    // first-write-wins: a doc re-delivered in a LATER batch is skipped
    val fresh = hot(attIdx.fold(batch)(idx =>
      batch.join(idx.select(col("doc_id")), Seq("doc_id"), "left_anti")))
    try {
      val cor = fresh.select(col("doc_id"), col("text"))
      // gates 1 + 5: content hash vs index + within-batch window, ta2 flags
      val wEx = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      val flagged0 = graft.operators.TextAnalysis.withQualityVerdict(
          cor.withColumn("h", md5(col("text")))
            .withColumn("ws", split(col("text"), " ")))
        .withColumn("batch_dup", row_number().over(wEx) > 1)
      val flagged = hashIdx.fold(flagged0.withColumn("seen", lit(false)))(hi =>
          flagged0.join(
            hi.select(col("h")).distinct().withColumn("seen", lit(true)),
            Seq("h"), "left"))
        .withColumn("exact_dup",
          col("batch_dup") || coalesce(col("seen"), lit(false)))
        .select(col("doc_id"), col("h"), col("n_words").as("nt"),
          col("verdict"), col("exact_dup"))
      hot(flagged) // feeds surv1, the attribution join, and the hash commit
      // gate 2: MinHash near-dup among exact survivors — batch-internal
      // candidates plus the probe against the accumulated signature
      // index (CorpusStream's shape); only batch docs can be gated
      // (the surv1 join below), so an out-of-order id can never
      // retro-gate an already-released document
      val surv1 = flagged.filter(!col("exact_dup")).select(col("doc_id"))
      val batchSigs = hot(Dedup.minhashSignatures(
        Dedup.shingles(cor.join(surv1, "doc_id"))))
      val batchBands = Dedup.bandRowsOf(batchSigs)
      val internal = batchBands.as("x").join(batchBands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      val cross = sigIdx.map { idx =>
        Dedup.bandRowsOf(idx).as("y").join(batchBands.as("x"),
            col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
          .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
            greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      }
      val cand = cross.fold(internal)(internal.unionByName(_)).distinct()
      val allSigs = sigIdx.fold(batchSigs)(_.unionByName(batchSigs))
      val nearDrop = Dedup.verifyPairs(cand, allSigs)
        .select(col("doc_b").as("doc_id")).distinct()
        .join(surv1, "doc_id")
        .withColumn("near_dup", lit(true))
      // gate 3: semantic near-dup — batch-internal bucket pairs plus
      // the probe against the accumulated bucketed-vector index
      val bb = hot(Pipeline.cp5BucketedVecs(
        fresh.select(col("doc_id").as("vec_id"), col("embedding"))))
      val semInternal = bb.as("x").join(bb.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .withColumn("sim", Pipeline.cp5CosSim)
        .filter(col("sim") >= 0.8)
        .select(col("y.vec_id").as("doc_id"))
      val semCross = vecIdx.map { iv =>
        iv.as("x").join(bb.as("y"), col("x.bucket") === col("y.bucket"))
          .withColumn("sim", Pipeline.cp5CosSim)
          .filter(col("sim") >= 0.8)
          .select(col("y.vec_id").as("doc_id"))
      }
      val semDrop = semCross.fold(semInternal)(semInternal.unionByName(_))
        .distinct().withColumn("sem_dup", lit(true))
      // gates 4 + 6: static artifacts (benchmark holdout, KN LM)
      val deconDrop = Pipeline.cp5DeconDrop(spark, dir, cor)
      val pplDrop = Pipeline.cp5PplDrop(spark, dir, cor)
      val att = flagged
        .join(nearDrop, Seq("doc_id"), "left")
        .join(semDrop, Seq("doc_id"), "left")
        .join(broadcast(deconDrop), Seq("doc_id"), "left")
        .join(pplDrop, Seq("doc_id"), "left")
        .withColumn("gate", Pipeline.cp5GateCol)
        .select(col("doc_id"), col("nt"), col("gate"))
      // commit the index + ledger partitions (idempotent overwrite)
      flagged.select(col("doc_id"), col("h"))
        .write.mode("overwrite").parquet(s"$hashesDir/batch_id=$batchId")
      batchSigs.write.mode("overwrite").parquet(s"$sigsDir/batch_id=$batchId")
      bb.write.mode("overwrite").parquet(s"$vecsDir/batch_id=$batchId")
      att.write.mode("overwrite").parquet(s"$attDir/batch_id=$batchId")
      // the cumulative release design at this boundary: gates 7+8 over
      // EVERYTHING attributed so far — att-sized, no text
      Pipeline.cp5ReleaseOf(spark, dir,
          spark.read.parquet(attDir).drop("batch_id"))
        .write.mode("overwrite").parquet(s"$releaseDir/batch_id=$batchId")
    } finally persisted.foreach(_.unpersist())
  }

  /** The streaming entry: (doc_id, text, embedding) crawl stream →
    * accumulated gate indexes + attrition ledger + per-boundary
    * cumulative release design.
    */
  def start(docs: DataFrame, dir: String, stateDir: String,
            checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, dir, stateDir, batchId)
        ()
      }
      .start()

  /** The release design as of the LATEST completed batch boundary. */
  def readRelease(spark: SparkSession, stateDir: String): DataFrame = {
    val all = spark.read.parquet(s"$stateDir/release")
    // the inferred partition-column type is INT; cast before unboxing
    val latest = all.agg(max(col("batch_id").cast("long"))).head.getLong(0)
    all.filter(col("batch_id").cast("long") === latest).drop("batch_id")
  }

  /** The accumulated attrition ledger (batch_id kept for provenance). */
  def readAttrition(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/att")
}
