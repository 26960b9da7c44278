package graft.streaming

import graft.operators.Identity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming IDENTITY RESOLUTION — the maintained mappings table's
  * incremental fold (reference: warehouse/identity/identity.go:79-262,
  * whose applyRule loop IS a stream of merge-rule batches folding into
  * rudder_identity_mappings; the batch side here is
  * [[Identity.addRules]]). This was the one maintained-index family
  * without a streaming sibling: shingle/signature tables have
  * CorpusStream, window hashes SubstrStream, postings SearchStream,
  * coded vectors VectorStream.
  *
  * Unlike those append-only/first-write-wins stores, mappings are
  * VERSIONED per node: a later merge rule can RE-LABEL existing nodes
  * (two components glued by a new edge — the retroactive case, same
  * shape as SubstrStream's retro re-cut). So the store holds per-batch
  * DELTA rows (node, comp) and every read takes the LATEST row per
  * node by the LSM coverage order ([[StateCompaction.latestPerKey]]).
  *
  * Per-batch cost scales with the batch's NEIGHBORHOOD, never the
  * graph: the fold prunes the store to members of TOUCHED components
  * before running CC —
  *   1. the batch's endpoint nodes (batch-sized, broadcast) semi-join
  *      the store; latest-per-node over that slice yields the touched
  *      component ids C (≤ batch nodes);
  *   2. rows with comp ∈ C (broadcast) are the affected members. This
  *      is sound under the merge-only invariant (labels only ever
  *      decrease, and a merge moves a component WHOLE): a stale row
  *      with comp ∈ C implies the node's current comp ∈ C too, so
  *      latest-per-node over the caught slice is exactly the current
  *      mapping of every affected member;
  *   3. CC runs over (batch edges ∪ star edges member→comp) — the
  *      [[Identity.addRules]] delta contract — and ONLY those rows are
  *      written as the batch's partition.
  * At 100 TB the two window scans run over affected members, not the
  * mappings table, and the full-store pass happens only inside LSM
  * compaction folds (O(log batches) rewrites per row).
  *
  * State store (per-batch `batch_id=N` partitions, overwrite mode —
  * the shared at-least-once replay contract):
  *   maps (node, comp)   versioned delta rows; read = latest per node
  * [[compactState]] folds committed partitions into LSM range
  * sentinels keeping each node's latest row (sound per fold because
  * coverage ranges nest); the in-flight batch is left out (the
  * cross-store crash contract — single store here, but replay still
  * requires its partition uncovered).
  */
object IdentityStream {

  private[graft] val stores: Seq[String] = Seq("maps")

  private def mapsDir(stateDir: String) = s"$stateDir/maps"

  /** Latest (node, comp) per node over the visible store, optionally
    * excluding one batch partition (the replay exclusion).
    */
  private def readLatest(spark: SparkSession, stateDir: String,
                         excludeBatchId: Long): Option[DataFrame] =
    StateCompaction.readVisible(spark, mapsDir(stateDir)).map { all =>
      val live = all.filter(col("batch_id").cast("long") =!= excludeBatchId)
      StateCompaction.latestPerKey(live, "node").drop("batch_id")
    }

  /** The maintained mappings table (node, comp) — what l8's consumers
    * scan; comp = min member of the node's component.
    */
  def readMappings(spark: SparkSession, stateDir: String): DataFrame =
    readLatest(spark, stateDir, Long.MinValue).getOrElse {
      val sess = spark
      import sess.implicits._
      Seq.empty[(Long, Long)].toDF("node", "comp")
    }

  /** One micro-batch of merge-rule edges (src, dst): resolve the
    * batch's neighborhood and append the re-labeled delta rows.
    * Idempotent under replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   batchId: Long): Unit = {
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val e = batch.toDF("src", "dst")
    val store = StateCompaction.readVisible(spark, mapsDir(stateDir))
      .map(_.filter(col("batch_id").cast("long") =!= batchId))
    val delta = store match {
      case None =>
        Identity.connectedComponents(e).toDF("node", "comp")
      case Some(all) =>
        val touched = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct()
        // latest rows of the touched nodes -> their CURRENT comps
        val touchedRows = all.join(broadcast(touched), "node")
        val comps = StateCompaction.latestPerKey(touchedRows, "node")
          .select(col("comp")).distinct()
        // affected members: every row labeled with a touched comp —
        // under merge-only labels the latest-per-node over this slice
        // is the current mapping of exactly the affected membership
        val caught = all.join(broadcast(comps), "comp")
        val members = StateCompaction.latestPerKey(caught, "node")
          .select(col("node"), col("comp"))
        val starEdges = members
          .select(col("node").as("src"), col("comp").as("dst"))
        Identity.connectedComponents(e.union(starEdges)).toDF("node", "comp")
    }
    delta.write.mode("overwrite")
      .parquet(s"${mapsDir(stateDir)}/batch_id=$batchId")
  }

  /** Fold committed partitions into LSM range sentinels, keeping each
    * node's latest mapping; the in-flight batch is left out.
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        keep = df => StateCompaction.latestPerKey(df, "node"),
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: a (src, dst) merge-rule stream → maintained
    * mappings store, compacted every `compactEvery` batches (0
    * disables).
    */
  def start(rules: DataFrame, stateDir: String, checkpointDir: String,
            compactEvery: Int = 64): StreamingQuery =
    rules.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          compactState(batch.sparkSession, stateDir, excludeBatchId = batchId)
        ()
      }
      .start()
}
