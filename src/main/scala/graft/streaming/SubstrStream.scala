package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming EXACT-SUBSTRING DEDUP — ll33's incremental sibling (r16
  * verdict item #8), closing the one dedup family member without a
  * streaming twin: as crawl batches arrive, each document's 50-token
  * windows are hashed against a MAINTAINED window index, and every
  * document's maximal duplicated-substring CUT LIST (Lee et al. ACL
  * 2022's removal contract, ll33's exact semantics) is kept current.
  *
  * Unlike the keep-min dedup folds, substring dedup is RETROACTIVE by
  * definition: when a later crawl repeats a passage first seen in an
  * earlier document, BOTH occurrences become cuts — so a batch can
  * re-cut documents that arrived long before it. The fold bounds that
  * work by the delta: only hashes CROSSING the duplication threshold
  * this batch (a subset of the batch's own hash set) can affect prior
  * documents, and only the prior holders of those hashes re-merge.
  * Because the duplicated-position set of a document is
  * arrival-order-independent (occurrence counting is symmetric — no
  * id-ordered survivor rule anywhere), the fold equals the batch
  * operator on the union of everything arrived WITHOUT a monotone-id
  * contract; re-delivered documents are dropped by first-write-wins
  * on the doc ledger.
  *
  * Per-batch cost: the batch's own windowing, ONE hash-probe of the
  * accumulated window index (CorpusStream's probe shape — the index
  * side is (doc_id, pos, 60-bit long hash): one ~24-byte row per
  * corpus TOKEN, never corpus TEXT — the hex-string keys this store
  * carried before were larger than the text they indexed), and a
  * gaps-and-islands re-merge over batch docs plus the retro-affected
  * holders only — through the SAME Dedup.spansOfDupPositions path the
  * batch detector uses.
  *
  * State stores (per-batch `batch_id=N` partitions, overwrite mode —
  * the at-least-once replay contract of the other streams):
  *   wins (doc_id, pos, whash)  the maintained window index
  *   docs (doc_id)              the first-write-wins ledger
  *   dups (whash)               hashes known duplicated (cnt >= 2)
  *   cuts (doc_id, span_start, span_end, n_windows) — VERSIONED: a
  *        later batch's rows for a doc supersede earlier ones;
  *        [[readCuts]] resolves latest-per-doc.
  * [[compactState]] folds committed partitions into LSM range
  * sentinels (cuts keep only each doc's latest version); `start`
  * triggers it every `compactEvery` batches.
  */
object SubstrStream {

  private val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** The window width — ll33's 50-token Lee et al. threshold. */
  val W = 50

  private[graft] val stores: Seq[String] = Seq("wins", "docs", "dups", "cuts")

  // the shared swap-healing, replay-excluding, fileless-tolerant read
  private def readState(spark: SparkSession, dir: String,
                        batchId: Long): Option[DataFrame] =
    StateCompaction.readState(spark, dir, batchId)

  /** One micro-batch of (doc_id, text): probe the window index, mark
    * newly-crossed duplicate hashes, re-merge the cut lists of batch
    * docs and retro-affected prior docs. Idempotent under replay.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   batchId: Long, w: Int = W): Unit = {
    val winsDir = s"$stateDir/wins"
    val docsDir = s"$stateDir/docs"
    val dupsDir = s"$stateDir/dups"
    val cutsDir = s"$stateDir/cuts"
    // self-heal crashed swaps on every store before reads or writes
    // (cuts is write-only in a batch; see StateCompaction.heal)
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hot(df: DataFrame): DataFrame = { persisted += df.persist(store); df }
    val winsIdx = readState(spark, winsDir, batchId).map(hot)
    val docsIdx = readState(spark, docsDir, batchId)
    val dupsIdx = readState(spark, dupsDir, batchId).map(hot)
    // first-write-wins: a doc re-delivered in a later batch is skipped
    val fresh = hot(docsIdx.fold(batch)(d =>
      batch.join(d, Seq("doc_id"), "left_anti")))
    try {
      val wB = hot(Dedup.windowHashes(fresh.select(col("doc_id"), col("text")), w))
      val batchCnt = wB.groupBy(col("whash")).agg(count(lit(1)).as("bcnt"))
      // ONE probe of the accumulated index: prior occurrences of the
      // batch's hashes — feeds both the crossing counts and the
      // retro-affected doc set
      val priorHits = winsIdx.map(idx =>
        hot(idx.join(batchCnt.select(col("whash")), "whash")))
      val totals = priorHits.fold(batchCnt.withColumn("pcnt", lit(0L))) { ph =>
        batchCnt.join(ph.groupBy(col("whash")).agg(count(lit(1)).as("pcnt")),
            Seq("whash"), "left")
          .na.fill(0L, Seq("pcnt"))
      }
      // hashes crossing the >=2 occurrence threshold THIS batch —
      // bounded by the batch's own hash set, the retro-work budget
      val crossed = hot(totals.filter(col("bcnt") + col("pcnt") >= 2L)
        .select(col("whash"))
        .join(dupsIdx.getOrElse(wB.limit(0).select(col("whash"))),
          Seq("whash"), "left_anti"))
      val dupsAll = dupsIdx.fold(crossed)(_.unionByName(crossed))
      // duplicated positions: batch docs against the full dup set…
      val dupPosBatch = wB.join(dupsAll, "whash")
        .select(col("doc_id"), col("pos"), (col("pos") + (w - 1)).as("fin"))
      // …plus the retro-affected prior holders of newly-crossed
      // hashes, re-merged from their FULL window set
      val dupPosPrior = (priorHits, winsIdx) match {
        case (Some(ph), Some(idx)) =>
          val affected = ph.join(crossed, "whash").select(col("doc_id")).distinct()
          idx.join(affected, "doc_id").join(dupsAll, "whash")
            .select(col("doc_id"), col("pos"), (col("pos") + (w - 1)).as("fin"))
        case _ => dupPosBatch.limit(0)
      }
      val cutsNew = Dedup.spansOfDupPositions(dupPosBatch.unionByName(dupPosPrior))
      // commit (idempotent overwrite per batch partition)
      wB.write.mode("overwrite").parquet(s"$winsDir/batch_id=$batchId")
      fresh.select(col("doc_id"))
        .write.mode("overwrite").parquet(s"$docsDir/batch_id=$batchId")
      crossed.write.mode("overwrite").parquet(s"$dupsDir/batch_id=$batchId")
      cutsNew.write.mode("overwrite").parquet(s"$cutsDir/batch_id=$batchId")
    } finally persisted.foreach(_.unpersist())
  }

  /** The current cut list: each doc's rows from its LATEST version
    * (a retro re-cut supersedes the doc's earlier rows). Matches
    * ll33's duplicatedSpans(union, w) output columns.
    */
  def readCuts(spark: SparkSession, stateDir: String): DataFrame =
    StateCompaction.readVisible(spark, s"$stateDir/cuts")
      .map(all => StateCompaction.latestPerDoc(all).drop("batch_id"))
      .getOrElse {
        // a compacted duplicate-free store is a legitimately EMPTY
        // state — surface it as the typed empty cut list, not an
        // AnalysisException
        val sess = spark
        import sess.implicits._
        Seq.empty[(Long, Long, Long, Long)]
          .toDF("doc_id", "span_start", "span_end", "n_windows")
      }

  /** Fold the committed partitions of every store into LSM range
    * sentinels (cuts keep only each doc's latest version first — the
    * versioning semantics survive compaction via coverage-end order).
    * The in-flight batch's partitions are left out (see
    * StateCompaction.compactStore's cross-store crash contract).
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        // a later batch's cut rows supersede a doc's earlier ones
        keep = if (name == "cuts") StateCompaction.latestPerDoc else identity,
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: a (doc_id, text) crawl stream → maintained
    * window index + per-doc cut lists, compacted every `compactEvery`
    * batches (0 disables).
    */
  def start(docs: DataFrame, stateDir: String, checkpointDir: String,
            compactEvery: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          // the boundary batch is still in flight (not checkpoint-
          // committed): carry its partitions through uncompacted so a
          // crash between store swaps leaves every store replay-consistent
          compactState(batch.sparkSession, stateDir, excludeBatchId = batchId)
        ()
      }
      .start()
}
