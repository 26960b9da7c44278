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
  * shape as SubstrStream's retro re-cut), and an ERASURE batch can
  * SPLIT a component or tombstone nodes outright (the l8d unmerge
  * contract at stream grain). So the store holds per-batch DELTA rows
  * (node, comp, dead) and every read takes the LATEST row per node by
  * the LSM coverage order ([[StateCompaction.latestPerKey]]), dropping
  * tombstones.
  *
  * Per-batch cost scales with the batch's NEIGHBORHOOD, never the
  * graph. The merge fold prunes the store to members of TOUCHED
  * components before running CC:
  *   1. the batch's endpoint nodes (batch-sized, broadcast) semi-join
  *      the store; TRUE latest-per-node over that slice (live rows)
  *      yields the touched component ids C (≤ batch nodes);
  *   2. rows with comp ∈ C (broadcast) nominate CANDIDATE nodes; a
  *      second bounded semi-join re-reads every candidate's full
  *      version history and keeps only nodes whose TRUE latest, live
  *      comp ∈ C. The two-step form matters once unmerge exists:
  *      labels no longer only decrease, so a node's STALE row can
  *      carry a comp it has since split away from — star-edging it
  *      back would silently re-glue the split. Candidates are bounded
  *      by the touched comps' historical membership, never the store;
  *   3. CC runs over (batch edges ∪ star edges member→comp) — the
  *      [[Identity.addRules]] delta contract — and ONLY those rows are
  *      written as the batch's partition.
  *
  * The UNMERGE fold ([[processUnmerge]]) is the reference's regulation
  * path (l8d's batch contract): the regulated nodes' components
  * recompute from their SURVIVING edges (the maintained edge ledger,
  * minus anything incident to an erased node); members absent from the
  * recomputation — the regulated nodes and anyone orphaned by the
  * erasure — get TOMBSTONE rows; every other component carries over
  * untouched. Erasure is durable: the erased ledger suppresses the
  * nodes from all future merge batches, edge reads filter
  * erased-incident rows, and compaction PHYSICALLY purges them from
  * the edge store (the L9 retention-rides-the-rewrite precedent).
  *
  * State stores (per-batch `batch_id=N` partitions, overwrite mode —
  * the shared at-least-once replay contract):
  *   maps   (node, comp, dead)  versioned deltas; read = latest live
  *   edges  (src, dst)          the merge-rule ledger (unmerge input)
  *   erased (node)              the regulation suppression list
  * [[compactState]] folds committed partitions into LSM range
  * sentinels (maps keeps each node's latest row — sound per fold
  * because coverage ranges nest; edges dedup + purge erased-incident
  * rows; erased dedups), with the in-flight batch left out (the
  * cross-store crash contract).
  */
object IdentityStream {

  private[graft] val stores: Seq[String] = Seq("maps", "edges", "erased")

  private def mapsDir(stateDir: String) = s"$stateDir/maps"
  private def edgesDir(stateDir: String) = s"$stateDir/edges"
  private def erasedDir(stateDir: String) = s"$stateDir/erased"

  private def visibleExcluding(spark: SparkSession, dir: String,
                               excludeBatchId: Long): Option[DataFrame] =
    StateCompaction.readVisible(spark, dir)
      .map(_.filter(col("batch_id").cast("long") =!= excludeBatchId))

  /** The erased-node suppression list (regulation grain — broadcast). */
  private def readErasedSet(spark: SparkSession, stateDir: String,
                            excludeBatchId: Long): Option[DataFrame] =
    visibleExcluding(spark, erasedDir(stateDir), excludeBatchId)
      .map(_.select(col("node")).distinct())

  /** The maintained mappings table (node, comp) — what l8's consumers
    * scan; comp = min live member of the node's component. Tombstoned
    * nodes (erased, or orphaned by an erasure) are absent.
    */
  def readMappings(spark: SparkSession, stateDir: String): DataFrame =
    visibleExcluding(spark, mapsDir(stateDir), Long.MinValue)
      .map(all => StateCompaction.latestPerKey(all, "node")
        .filter(!col("dead")).select(col("node"), col("comp")))
      .getOrElse {
        val sess = spark
        import sess.implicits._
        Seq.empty[(Long, Long)].toDF("node", "comp")
      }

  /** One micro-batch of merge-rule edges (src, dst): suppress erased
    * nodes, resolve the batch's neighborhood, append the re-labeled
    * delta rows, and ledger the surviving edges. Idempotent under
    * replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   batchId: Long): Unit = {
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val erased = readErasedSet(spark, stateDir, batchId)
    // durable erasure: a post-regulation rule naming an erased node is
    // dropped (the suppression-list contract, T1's shape). The batch
    // plan (typically an upstream scan + distinct) is persisted for
    // the fold's duration: it feeds the touched-neighborhood broadcast
    // chain, the CC input AND the ledger write — each a separate
    // action that would otherwise re-execute it from the source.
    val e = erased.foldLeft(batch.toDF("src", "dst"))((b, er) =>
      b.join(broadcast(er.withColumnRenamed("node", "src")), Seq("src"), "left_anti")
        .join(broadcast(er.withColumnRenamed("node", "dst")), Seq("dst"), "left_anti"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pinnedStore = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val store = visibleExcluding(spark, mapsDir(stateDir), batchId)
      val delta = store match {
        case None =>
          Identity.connectedComponents(e).toDF("node", "comp")
        case Some(all0) =>
          // the neighborhood chain below reads the store THREE times
          // (touched rows -> comps, historical candidates, true-latest
          // members) inside one executed plan — pin the store scan for
          // the fold's duration so each batch pays it once, not three
          // times (at 100 TB the store scan is the per-batch term this
          // fold exists to bound; the pin is dropped before the write)
          val all = all0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinnedStore += all
          val touched = e.select(col("src").as("node"))
            .union(e.select(col("dst").as("node"))).distinct()
          // TRUE latest rows of the touched nodes -> their current
          // comps (dead rows contribute nothing: a tombstoned node
          // re-linked by a new rule re-enters as a fresh node)
          val touchedRows = all.join(broadcast(touched), "node")
          val comps = StateCompaction.latestPerKey(touchedRows, "node")
            .filter(!col("dead"))
            .select(col("comp")).distinct()
          // candidate members by ANY historical label in C, then the
          // bounded second pass keeps only true-latest live members —
          // see the class note on why one pass is unsound under splits
          val candNodes = all.join(broadcast(comps), "comp")
            .select(col("node")).distinct()
          val members = StateCompaction.latestPerKey(
              all.join(broadcast(candNodes), "node"), "node")
            .filter(!col("dead"))
            .join(broadcast(comps), "comp")
            .select(col("node"), col("comp"))
          val starEdges = members
            .select(col("node").as("src"), col("comp").as("dst"))
          // CC materializes its input eagerly, so the pin is consumed
          // by the time it returns
          Identity.connectedComponents(e.union(starEdges)).toDF("node", "comp")
      }
      delta.withColumn("dead", lit(false)).write.mode("overwrite")
        .parquet(s"${mapsDir(stateDir)}/batch_id=$batchId")
      e.write.mode("overwrite")
        .parquet(s"${edgesDir(stateDir)}/batch_id=$batchId")
    } finally {
      pinnedStore.foreach(_.unpersist())
      e.unpersist()
    }
  }

  /** One REGULATION batch (node): erase the given nodes — their
    * components recompute from surviving ledger edges (splitting where
    * the regulated nodes were the glue), the regulated nodes and
    * anyone orphaned by the erasure tombstone out, and the erased
    * ledger suppresses them from all future rules. Untouched
    * components never enter the plan. Idempotent under replay.
    */
  def processUnmerge(spark: SparkSession, regulated: DataFrame,
                     stateDir: String, batchId: Long): Unit = {
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    val sess = spark
    import sess.implicits._
    val reg = regulated.toDF("node")
    val store = visibleExcluding(spark, mapsDir(stateDir), batchId)
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    try {
      val delta = store match {
        case None =>
          // an erasure before any merge batch: nothing mapped, nothing
          // to split — only the suppression-list write below matters
          Seq.empty[(Long, Option[Long], Boolean)].toDF("node", "comp", "dead")
        case Some(all0) =>
          // same three-pass store read as processBatch — pin it once
          // for the fold (released with the other pins in finally)
          val all = all0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinned += all
          val regRows = all.join(broadcast(reg), "node")
          val comps = StateCompaction.latestPerKey(regRows, "node")
            .filter(!col("dead"))
            .select(col("comp")).distinct()
          val candNodes = all.join(broadcast(comps), "comp")
            .select(col("node")).distinct()
          // bounded by the affected components; persisted because it
          // feeds both the surviving-edge broadcast (built during the
          // eager CC) and the tombstone anti-join (executed at write)
          val members = StateCompaction.latestPerKey(
              all.join(broadcast(candNodes), "node"), "node")
            .filter(!col("dead"))
            .join(broadcast(comps), "comp")
            .select(col("node"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          pinned += members
          // surviving edges of the affected components: the ledger
          // filtered to member sources (components are closed under
          // their own edges), minus anything incident to an erased or
          // newly-regulated node
          val erasedNow = readErasedSet(spark, stateDir, batchId)
            .fold(reg)(_.unionByName(reg)).distinct()
          val edges = visibleExcluding(spark, edgesDir(stateDir), batchId)
            .map(_.select(col("src"), col("dst")))
            .getOrElse(Seq.empty[(Long, Long)].toDF("src", "dst"))
          val surviving = edges
            .join(broadcast(members.withColumnRenamed("node", "src")), "src")
            .join(broadcast(erasedNow.withColumnRenamed("node", "src")),
              Seq("src"), "left_anti")
            .join(broadcast(erasedNow.withColumnRenamed("node", "dst")),
              Seq("dst"), "left_anti")
          val recomputed = Identity.connectedComponents(surviving)
            .toDF("node", "comp")
          // tombstones: affected members that no surviving edge reaches —
          // the regulated nodes and the erasure's orphans
          val tomb = members
            .join(recomputed.select(col("node")), Seq("node"), "left_anti")
            .select(col("node"), lit(null).cast("long").as("comp"))
          recomputed.withColumn("dead", lit(false))
            .unionByName(tomb.withColumn("dead", lit(true)))
      }
      delta.write.mode("overwrite")
        .parquet(s"${mapsDir(stateDir)}/batch_id=$batchId")
      reg.write.mode("overwrite")
        .parquet(s"${erasedDir(stateDir)}/batch_id=$batchId")
    } finally pinned.foreach(_.unpersist())
  }

  /** Fold committed partitions into LSM range sentinels: maps keeps
    * each node's latest row, the edge ledger dedups and PHYSICALLY
    * purges erased-incident rows (retention riding the rewrite), the
    * erased list dedups. The in-flight batch is left out.
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit = {
    val erased = readErasedSet(spark, stateDir, excludeBatchId)
    def purge(df: DataFrame): DataFrame = erased.fold(df)(er =>
      df.join(broadcast(er.withColumnRenamed("node", "src")), Seq("src"), "left_anti")
        .join(broadcast(er.withColumnRenamed("node", "dst")), Seq("dst"), "left_anti"))
    StateCompaction.compactStore(spark, mapsDir(stateDir), targetFiles,
      keep = df => StateCompaction.latestPerKey(df, "node"),
      excludeBatchId = excludeBatchId)
    StateCompaction.compactStore(spark, edgesDir(stateDir), targetFiles,
      keep = df => purge(df.dropDuplicates("src", "dst")),
      excludeBatchId = excludeBatchId)
    StateCompaction.compactStore(spark, erasedDir(stateDir), targetFiles,
      keep = _.dropDuplicates("node"),
      excludeBatchId = excludeBatchId)
  }

  /** The streaming entry: a (src, dst) merge-rule stream → maintained
    * mappings store, compacted every `compactEvery` batches (0
    * disables). Regulation batches arrive through [[processUnmerge]]
    * (a control-plane side input, not this stream).
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
