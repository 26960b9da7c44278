package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN-INDEX maintenance — the coded-vector index's
  * incremental fold, closing the last maintained-index family without
  * a streaming sibling (the shingle/signature, window, and postings
  * indexes all have one): as (vec_id, embedding) batches arrive, each
  * vector is IVF-PQ-encoded against a FROZEN trained model and
  * appended to a CELL-partitioned coded store, so cell-pruned ADC
  * reads stay current as a corpus is embedded.
  *
  * The model (coarse centroids + residual codebooks, ~10 KB) rides
  * the trained-artifact contract the KN LM and the benchmark holdout
  * already ride: it trains ONCE (Similarity.trainIvfPq over the base
  * corpus) and is static for the stream's lifetime — faiss's own
  * deployment shape, where the quantizer trains offline and the index
  * only ever ADDs. Re-training is a rebuild decision, not a fold —
  * ev16 (Similarity.ivfPqRebuildCheckOf) COMPOSES that decision:
  * cd2's drift monitor ∨ a recall floor against exact brute truth on
  * the re-embedded corpus emits the verdict.
  *
  * Per-batch cost is the batch's own encode (one codegen'd pass
  * against ~10 KB of literals) plus three batch-sized writes — the
  * accumulated index is never rescanned by the fold. At 100 TB the
  * coded store is the ~64x-compressed searchable form (cell + 8
  * nibble codes per vector); the raw store exists for the exact
  * rerank and would be laid out id-bucketed.
  *
  * State stores (per-batch `batch_id=N` partitions, overwrite mode —
  * the shared at-least-once replay contract):
  *   coded (vec_id, cell, code0..7)  partitioned by cell inside each
  *         batch partition — the ANN read's pruning key
  *   vecs  (vec_id, embedding)       raw vectors for the exact rerank
  *   docs  (vec_id)                  the first-write-wins ledger
  * [[compactState]] folds committed partitions into LSM range
  * sentinels (coded keeps its cell partitioning); the in-flight batch
  * is left out (the cross-store crash contract).
  */
object VectorStream {

  private[graft] val stores: Seq[String] = Seq("coded", "vecs", "docs")

  private def quantized(df: DataFrame): DataFrame =
    df.withColumn("q",
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .select(col("vec_id"), col("q"))

  /** One micro-batch of (vec_id, embedding): encode first-seen vectors
    * against the frozen model and append. Idempotent under replay.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   model: Similarity.IvfPqModel, batchId: Long): Unit = {
    val codedDir = s"$stateDir/coded"
    val vecsDir = s"$stateDir/vecs"
    val docsDir = s"$stateDir/docs"
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val docsIdx = StateCompaction.readState(spark, docsDir, batchId)
    // first-write-wins: a vector re-delivered in a later batch is
    // skipped (re-embedding a doc is an index rebuild decision)
    val fresh = docsIdx.fold(batch)(d =>
        batch.join(d, Seq("vec_id"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Similarity.ivfPqEncode(quantized(fresh), model).drop("q")
        .write.partitionBy("cell")
        .mode("overwrite").parquet(s"$codedDir/batch_id=$batchId")
      fresh.select(col("vec_id"), col("embedding"))
        .write.mode("overwrite").parquet(s"$vecsDir/batch_id=$batchId")
      fresh.select(col("vec_id"))
        .write.mode("overwrite").parquet(s"$docsDir/batch_id=$batchId")
    } finally fresh.unpersist()
  }

  /** The accumulated coded index (vec_id, cell, code0..7). */
  def readCoded(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StateCompaction.readVisible(spark, s"$stateDir/coded")
      .map(_.drop("batch_id").withColumn("cell", col("cell").cast("long")))

  /** The accumulated raw vectors (the rerank side). */
  def readVecs(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StateCompaction.readVisible(spark, s"$stateDir/vecs").map(_.drop("batch_id"))

  /** Indexed count (the ledger — first-write-wins grain). */
  def readCount(spark: SparkSession, stateDir: String): Long =
    StateCompaction.readVisible(spark, s"$stateDir/docs").fold(0L)(_.count())

  /** ll34's cell-pruned two-stage search over ARBITRARY index frames —
    * shared by [[search]] (store-backed) and the batch reference the
    * equivalence spec builds from the union of everything arrived.
    * `queries` is (query_id, embedding); returns (query_id, rank,
    * neighbor_id) with ll34's exact tie orders.
    */
  private[graft] def searchFrames(coded: DataFrame, vecs: DataFrame,
                                  model: Similarity.IvfPqModel,
                                  queries: DataFrame, k: Int): DataFrame = {
    val qEnc = Similarity.assignCells(
        quantized(queries.select(col("query_id").as("vec_id"), col("embedding"))),
        model.cents)
      .withColumn("qn",
        expr("aggregate(transform(q, x -> x * x), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("qn"),
        col("cell").as("q_cell"))
    // the probed cells are a bounded driver-side list — the coded
    // store's partition layout turns the scan into a pruned read
    val qCells = qEnc.select(col("q_cell")).distinct()
      .collect().map(_.getLong(0))
    val dqed = Similarity.ivfPqReconstruct(
      coded.filter(col("cell").isin(qCells: _*)), model)
    val cand = dqed.join(broadcast(qEnc),
        col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("approx",
        expr("aggregate(zip_with(qq, dq, (a, b) -> a * b), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)") /
          sqrt(col("qn").cast("double") * col("dqn").cast("double")))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val top50 = cand.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= 50)
      .select(col("query_id"), col("vec_id"))
    val e = Similarity.withNorm(vecs)
    val scored = top50
      .join(e, "vec_id")
      .join(Similarity.withNorm(queries.select(col("query_id"), col("embedding")))
        .select(col("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm")),
        "query_id")
      .withColumn("dot", expr("dot_native(q_emb, embedding)"))
      .withColumn("sim", col("dot") / sqrt(col("q_nrm") * col("nrm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** ANN top-k over the maintained index for external query vectors. */
  def search(spark: SparkSession, stateDir: String,
             model: Similarity.IvfPqModel, queries: DataFrame,
             k: Int = 5): DataFrame = {
    val sess = spark
    import sess.implicits._
    def empty = Seq.empty[(Long, Long, Long)].toDF("query_id", "rank", "neighbor_id")
    // both stores must be readable: a crash between processBatch's
    // coded write and vecs write (first batch) leaves coded present
    // with vecs absent — the typed empty result, not an exception
    (readCoded(spark, stateDir), readVecs(spark, stateDir)) match {
      case (Some(coded), Some(vecs)) => searchFrames(coded, vecs, model, queries, k)
      case _ => empty
    }
  }

  /** Fold committed partitions into LSM range sentinels; coded keeps
    * its cell partitioning (the pruned read's key).
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        bucketCol = if (name == "coded") Some("cell") else None,
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: a (vec_id, embedding) stream → maintained
    * coded + raw + ledger stores under the given frozen model,
    * compacted every `compactEvery` batches (0 disables).
    */
  def start(vecs: DataFrame, stateDir: String, checkpointDir: String,
            model: Similarity.IvfPqModel, compactEvery: Int = 64): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, model, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          compactState(batch.sparkSession, stateDir, excludeBatchId = batchId)
        ()
      }
      .start()
}
