package graft.streaming

import graft.operators.{Dedup, Pipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming PRETRAINING RELEASE — cp6's capstone pipeline lifted into
  * Structured Streaming: that is exactly how a 100 TB crawl actually
  * arrives. Each micro-batch of (doc_id, text, embedding) flows through
  * the SAME gate chain as the batch release — exact dedup vs the
  * accumulated content-hash index, MinHash near-dup vs the accumulated
  * signature index (CorpusStream's incremental-index shape), semantic
  * near-dup vs the accumulated bucketed-vector index, ll31 13-gram
  * decontamination against the static benchmark holdout, the ta2
  * quality gate, and the ta26 perplexity gate against the maintained
  * KN LM (a trained artifact — static under streaming, like the
  * holdout) — then the SUBSTRING-DEDUP REWRITE (cp6's stage, via
  * SubstrStream's maintained-window-index shape): batch survivors'
  * windows probe the accumulated survivor-window index, newly-crossed
  * duplicate hashes cut the batch's docs AND retro-re-cut earlier
  * survivors that hold them. Per-doc verdicts append to the attrition
  * ledger, and the RELEASE DESIGN (PPS sampling → splits → shard
  * packing → per-gate attrition + the cut:substr row + the
  * conservation input row) is FOLDED per batch boundary, never
  * recomputed from the whole corpus:
  *
  *   - per-gate and input totals ride an additive ROLLUP store
  *     (gate-grain rows per batch, summed at read);
  *   - the PPS cumulative-token order rides a FRONTIER store: each
  *     survivor's (doc_id, nt, cum, bucket) where cum is the global
  *     prefix sum — exact under the monotone-id contract because every
  *     new survivor extends the frontier's tail, so a committed cum
  *     never changes — plus bucket-grain totals (BSTATS) that carry
  *     ta6's two-level-prefix bucket rollups across batches;
  *   - at a boundary the design touches only the ~(tot DIV step) ≤ 199
  *     unit-boundary positions: each maps into exactly one bucket
  *     (bucket cum-ranges tile the frontier), the bucket table is
  *     O(√corpus) rows, and the frontier scan PRUNES to the candidate
  *     buckets' partitions — per-boundary cost is O(batch + √corpus +
  *     boundaries·bucketload), not O(total corpus docs) (the r16
  *     verdict's one remaining scale cliff). Shard packing and splits
  *     then run on the ≤ ~200 sampled docs through the SAME
  *     Pipeline.cp5ShardsOf code path the batch release uses;
  *   - RETRO RE-CUTS ride an ADJUSTMENT store instead of rewriting
  *     committed frontier rows: a later batch that re-cuts an earlier
  *     survivor appends (doc_id, delta, bucket), and the boundary fold
  *     corrects bucket totals, each pruned row's nt, and its cum (by a
  *     two-level prefix of deltas — bucket-partitioned window plus a
  *     broadcast bucket prefix, delta-set-sized). The committed cum
  *     therefore stays immutable AND the adjusted design equals the
  *     batch pipeline's final token counts — the "frozen past" rule
  *     considered instead (ignore retro cuts once a doc is past a
  *     release boundary) was rejected because it silently diverges
  *     from batch-on-union. A doc's GATE verdict is still frozen at
  *     arrival: cuts change a shipped doc's token count, never
  *     retro-gate it.
  *
  * EQUIVALENCE CONTRACT (StreamingSpec pins it at every batch
  * boundary): when doc_ids arrive MONOTONICALLY (each batch's ids
  * exceed all earlier ids — the crawl-frontier contract; cp5's own
  * second crawl satisfies it, its twins live at +1e8), the fold equals
  * the batch pipeline run on the union of everything arrived:
  * duplicate attribution in the batch plan is id-ordered
  * (row_number / doc_b-drops by id), so "arrived earlier" and
  * "smaller id" pick the same survivor — and the frontier's carried
  * cum equals the batch plan's global cumsum for the same reason.
  * The contract is now ASSERTED per batch (r16 ADVICE): a fresh
  * (not-previously-attributed) doc below the ledger's max id fails
  * the batch loudly instead of silently diverging from the batch
  * pipeline. Re-delivered old docs are exempt — the first-write-wins
  * anti-join drops them before the check.
  *
  * The corpus tables behind `dir` (the bucket-size statistic, holdout,
  * KN LM) are static for the stream's lifetime — the same
  * trained-artifact contract the perplexity gate already rides.
  *
  * Crash contract: all outputs (hashes, sigs, vecs, att, release,
  * frontier, bstats, rollup, wins, dups, cuts, adj) land in per-batch
  * `batch_id=N` directories written with overwrite mode, so
  * at-least-once foreachBatch replay is idempotent — the
  * IntakeStream/CorpusStream contract, here covering a TWELVE-output
  * batch. On replay each index read excludes the batch's own
  * previously-committed partition, and a doc re-delivered in a LATER
  * batch is skipped entirely (first-write-wins, keyed on the
  * attrition ledger).
  *
  * COMPACTION: every store appends one `batch_id=N` partition per
  * micro-batch, so a long stream pays a small-file tax plus an
  * O(batches) listing per boundary. [[compactState]] folds each
  * store's committed partitions into LSM range sentinels (see
  * StateCompaction — folds never rewrite earlier sentinels; tiers
  * merge geometrically; replay exclusion still works because no
  * sentinel ever covers the in-flight batch, and a replayed
  * pre-compaction batch simply anti-joins to a no-op); `start`
  * triggers it every `compactEvery` batches. The release store keeps
  * only its LATEST boundary — earlier designs are superseded by
  * definition.
  */
object ReleaseStream {

  private val store = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  /** All per-batch state stores under a stateDir, in one place so
    * compaction and specs cannot drift from the writer. `frontier` is
    * additionally partitioned by `bucket` inside each batch partition
    * — the release fold's pruning key. The cp6 substring stage adds:
    * `wins` (survivor window index), `dups` (hashes known duplicated),
    * `cuts` (per-doc cut totals, VERSIONED latest-per-doc — a retro
    * re-cut supersedes), `adj` (retro deltas against committed
    * frontier rows).
    */
  private[graft] val stores: Seq[String] =
    Seq("hashes", "sigs", "vecs", "att", "release", "frontier", "bstats",
      "rollup", "wins", "dups", "cuts", "adj")

  // the shared swap-healing, replay-excluding, fileless-tolerant read
  private def readState(spark: SparkSession, dir: String,
                        batchId: Long): Option[DataFrame] =
    StateCompaction.readState(spark, dir, batchId)

  /** One micro-batch of (doc_id, text, embedding): gate vs the
    * accumulated indexes, append the attrition rows, fold the
    * cumulative release design forward. Every write is idempotent
    * under replay of `batchId`.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, dir: String,
                   stateDir: String, batchId: Long): Unit = {
    val hashesDir = s"$stateDir/hashes"
    val sigsDir = s"$stateDir/sigs"
    val vecsDir = s"$stateDir/vecs"
    val attDir = s"$stateDir/att"
    val releaseDir = s"$stateDir/release"
    val frontierDir = s"$stateDir/frontier"
    val bstatsDir = s"$stateDir/bstats"
    val rollupDir = s"$stateDir/rollup"
    val winsDir = s"$stateDir/wins"
    val dupsDir = s"$stateDir/dups"
    val cutsDir = s"$stateDir/cuts"
    val adjDir = s"$stateDir/adj"
    // self-heal crashed swaps on EVERY store before anything reads or
    // writes — write-only stores (release) would otherwise recreate
    // their dir and strand the committed state at __old forever
    StateCompaction.heal(spark, stores.map(n => s"$stateDir/$n"))
    // every frame persisted for this batch is released in finally — a
    // foreachBatch that leaks persists accumulates dead cache across
    // the life of the stream
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def hot(df: DataFrame): DataFrame = { persisted += df.persist(store); df }
    val hashIdx = readState(spark, hashesDir, batchId).map(hot)
    val sigIdx = readState(spark, sigsDir, batchId).map(hot)
    val vecIdx = readState(spark, vecsDir, batchId).map(hot)
    val attIdx = readState(spark, attDir, batchId)
    val bstatsIdx = readState(spark, bstatsDir, batchId)
    val rollupIdx = readState(spark, rollupDir, batchId)
    // first-write-wins: a doc re-delivered in a LATER batch is skipped
    val fresh = hot(attIdx.fold(batch)(idx =>
      batch.join(idx.select(col("doc_id")), Seq("doc_id"), "left_anti")))
    try {
      // monotone-arrival contract check (r16 ADVICE): the fold's cum
      // carry and the batch plan's id-ordered dedup agree ONLY when
      // fresh ids extend the frontier — assert it per batch instead of
      // silently diverging. Both sides are cheap: fresh is persisted
      // and batch-sized, the ledger max rides the rollup store.
      val priorMax = rollupIdx.flatMap(r =>
        Option(r.filter(col("stage") === "_max")
          .agg(max(col("n_docs"))).first().get(0)).map(_.asInstanceOf[Long]))
      val freshMin = Option(fresh.agg(min(col("doc_id"))).first().get(0))
        .map(_.asInstanceOf[Long])
      (priorMax, freshMin) match {
        case (Some(pm), Some(fm)) if fm <= pm =>
          throw new IllegalStateException(
            s"out-of-order crawl: batch $batchId delivers fresh doc_id $fm " +
              s"<= attributed max $pm — the stream fold would silently " +
              "diverge from the batch release (an already-released doc " +
              "can never be retro-gated); re-order the source or replay " +
              "from a checkpoint before the gap")
        case _ => ()
      }
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
      val att = hot(flagged
        .join(nearDrop, Seq("doc_id"), "left")
        .join(semDrop, Seq("doc_id"), "left")
        .join(broadcast(deconDrop), Seq("doc_id"), "left")
        .join(pplDrop, Seq("doc_id"), "left")
        .withColumn("gate", Pipeline.cp5GateCol)
        .select(col("doc_id"), col("nt"), col("gate")))
      val maxId = graft.Tables.maxIdStat(spark, dir, "documents", "doc_id")
      val bucketSize = math.max(1L, math.sqrt(maxId.toDouble).toLong)
      // ---- cp6's substring-dedup rewrite (SubstrStream's fold shape,
      // over SURVIVOR windows only — the batch stage's corpus) ----
      val survIds = att.filter(col("gate").isNull).select(col("doc_id"))
      val wB = hot(Dedup.windowHashes(
        cor.join(survIds, "doc_id"), Pipeline.cp6W))
      val winsIdx = readState(spark, winsDir, batchId).map(hot)
      val dupsIdx = readState(spark, dupsDir, batchId).map(hot)
      val batchCnt = wB.groupBy(col("whash")).agg(count(lit(1)).as("bcnt"))
      // ONE probe of the accumulated survivor-window index
      val priorHits = winsIdx.map(idx =>
        hot(idx.join(batchCnt.select(col("whash")), "whash")))
      val totals = priorHits.fold(batchCnt.withColumn("pcnt", lit(0L))) { ph =>
        batchCnt.join(ph.groupBy(col("whash")).agg(count(lit(1)).as("pcnt")),
            Seq("whash"), "left")
          .na.fill(0L, Seq("pcnt"))
      }
      // hashes crossing the >= 2 threshold THIS batch — the retro-work
      // budget is bounded by the batch's own hash set
      val crossed = hot(totals.filter(col("bcnt") + col("pcnt") >= 2L)
        .select(col("whash"))
        .join(dupsIdx.getOrElse(wB.limit(0).select(col("whash"))),
          Seq("whash"), "left_anti"))
      val dupsAll = dupsIdx.fold(crossed)(_.unionByName(crossed))
      val w1 = Pipeline.cp6W - 1
      val dupPosBatch = wB.join(dupsAll, "whash")
        .select(col("doc_id"), col("pos"), (col("pos") + w1).as("fin"))
      val dupPosPrior = (priorHits, winsIdx) match {
        case (Some(ph), Some(idx)) =>
          val affected = ph.join(crossed, "whash").select(col("doc_id")).distinct()
          idx.join(affected, "doc_id").join(dupsAll, "whash")
            .select(col("doc_id"), col("pos"), (col("pos") + w1).as("fin"))
        case _ => dupPosBatch.limit(0)
      }
      // per-doc cut TOTALS, span-merged through the SAME path the
      // batch stage uses — batch survivors AND retro-affected holders.
      // localCheckpoint (not persist) BREAKS THE PLAN LINEAGE here:
      // every downstream consumer (cutBatch/cutPrior/adj/frontier/
      // design) would otherwise nest the whole window-probe chain —
      // itself a chain of cached frames each referenced 2-3x — and the
      // per-batch plan STRING expands that shared DAG exponentially
      // (the prof13 plan-nesting failure, resurfacing at streaming
      // grain: the fold OOMed generating explain strings before any
      // data moved). Cut totals are doc-grain rows — eager
      // materialization is cheap; blocks are reclaimed by the
      // ContextCleaner (every entry point enables referenceTracking).
      val cutTotals = Dedup.spansOfDupPositions(
          dupPosBatch.unionByName(dupPosPrior))
        .groupBy(col("doc_id"))
        .agg(sum(col("span_end") - col("span_start") + 1).as("cut"))
        .localCheckpoint(true)
      val cutBatch = hot(cutTotals.join(survIds, "doc_id"))
      // retro docs: new total vs the versioned cuts store -> delta
      val prevCuts = StateCompaction.readVisible(spark, cutsDir).map(all =>
        StateCompaction.latestPerDoc(
            all.filter(col("batch_id").cast("long") =!= batchId))
          .drop("batch_id").withColumnRenamed("cut", "prev_cut"))
      val cutPrior = hot(cutTotals.join(survIds, Seq("doc_id"), "left_anti")
        .join(prevCuts.getOrElse(
            cutTotals.select(col("doc_id"), col("cut").as("prev_cut")).limit(0)),
          Seq("doc_id"), "left")
        .withColumn("prev_cut", coalesce(col("prev_cut"), lit(0L)))
        .withColumn("delta", col("cut") - col("prev_cut")))
      val adjRows = cutPrior.filter(col("delta") =!= 0L)
        .withColumn("bucket", expr(s"CAST(doc_id DIV $bucketSize AS BIGINT)"))
        .select(col("doc_id"), col("delta"), col("bucket"))
      // ---- the incremental release-design fold ----
      // batch survivors extend the PPS frontier with POST-CUT counts:
      // cum = prior RAW total + the batch's two-level (bucket-local +
      // bucket-prefix) cumsum. Committed cums are never rewritten —
      // retro deltas land in adj and correct reads. Monotone ids make
      // the carried cum exactly the batch plan's global prefix sum;
      // bucketSize is the SAME static documents statistic the batch
      // release uses.
      val prevTot = bstatsIdx.fold(0L)(b =>
        Option(b.agg(sum(col("btot"))).first().get(0))
          .fold(0L)(_.asInstanceOf[Long]))
      val surv = att.filter(col("gate").isNull)
        .join(cutBatch, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("nt") - coalesce(col("cut"), lit(0L))).as("nt"))
        .withColumn("bucket", expr(s"CAST(doc_id DIV $bucketSize AS BIGINT)"))
      val bt = hot(surv.groupBy(col("bucket"))
        .agg(sum(col("nt")).as("btot"), count(lit(1)).as("bdocs")))
      val wLocal = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      val wPrefix = Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bprefix = bt
        .withColumn("bprefix", coalesce(sum(col("btot")).over(wPrefix), lit(0L)))
        .select(col("bucket"), col("bprefix"))
      val batchFrontier = hot(surv
        .withColumn("cum_local", sum(col("nt")).over(wLocal))
        .join(bprefix, "bucket")
        .withColumn("cum", lit(prevTot) + col("bprefix") + col("cum_local"))
        .select(col("doc_id"), col("nt"), col("cum"), col("bucket")))
      // additive rollups: per-gate totals, the input row, the
      // cut:substr row (tokens cut this batch = arrival cuts + retro
      // deltas; docs NEWLY acquiring a cut — each cut doc counts once,
      // at its first cut, so the sum equals the batch stage's final
      // count), and the ledger max id (the monotone check's carry)
      val batchRollup = hot(att.filter(col("gate").isNotNull)
        .groupBy(col("gate"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .select(concat(lit("gate:"), col("gate")).as("stage"),
          col("n_docs"), col("n_tokens"))
        .unionByName(att.agg(count(lit(1)).as("n_docs"),
            sum(col("nt")).as("n_tokens"))
          .select(lit("input").as("stage"), col("n_docs"), col("n_tokens")))
        .unionByName(
          cutBatch.select(col("cut").as("v"),
              when(col("cut") > 0L, 1L).otherwise(0L).as("nd"))
            .unionByName(cutPrior.select(col("delta").as("v"),
              when(col("prev_cut") === 0L && col("cut") > 0L, 1L)
                .otherwise(0L).as("nd")))
            .agg(coalesce(sum(col("nd")), lit(0L)).as("n_docs"),
              coalesce(sum(col("v")), lit(0L)).as("n_tokens"))
            .select(lit("cut:substr").as("stage"),
              col("n_docs"), col("n_tokens")))
        .unionByName(att.agg(coalesce(max(col("doc_id")), lit(-1L)).as("n_docs"))
          .select(lit("_max").as("stage"), col("n_docs"),
            lit(0L).as("n_tokens"))))
      // commit the index + ledger + fold partitions (idempotent overwrite)
      flagged.select(col("doc_id"), col("h"))
        .write.mode("overwrite").parquet(s"$hashesDir/batch_id=$batchId")
      batchSigs.write.mode("overwrite").parquet(s"$sigsDir/batch_id=$batchId")
      bb.write.mode("overwrite").parquet(s"$vecsDir/batch_id=$batchId")
      att.write.mode("overwrite").parquet(s"$attDir/batch_id=$batchId")
      wB.write.mode("overwrite").parquet(s"$winsDir/batch_id=$batchId")
      crossed.write.mode("overwrite").parquet(s"$dupsDir/batch_id=$batchId")
      cutBatch.unionByName(cutPrior.select(col("doc_id"), col("cut")))
        .write.mode("overwrite").parquet(s"$cutsDir/batch_id=$batchId")
      adjRows.write.mode("overwrite").parquet(s"$adjDir/batch_id=$batchId")
      batchFrontier.write.partitionBy("bucket")
        .mode("overwrite").parquet(s"$frontierDir/batch_id=$batchId")
      bt.write.mode("overwrite").parquet(s"$bstatsDir/batch_id=$batchId")
      batchRollup.write.mode("overwrite").parquet(s"$rollupDir/batch_id=$batchId")
      // the cumulative release design at this boundary, folded from
      // the carried state — O(batch + √corpus + retro deltas), never
      // O(corpus)
      val frontierAll = readState(spark, frontierDir, batchId)
        .map(f => f.withColumn("bucket", col("bucket").cast("long"))
          .select(col("doc_id"), col("nt"), col("cum"), col("bucket"))
          .unionByName(batchFrontier))
        .getOrElse(batchFrontier)
      val bstatsAll = bstatsIdx.map(_.unionByName(bt)).getOrElse(bt)
      val rollupAll = rollupIdx.map(_.unionByName(batchRollup)).getOrElse(batchRollup)
      val adjAll = readState(spark, adjDir, batchId)
        .map(_.select(col("doc_id"), col("delta"), col("bucket"))
          .unionByName(adjRows))
        .getOrElse(adjRows)
      releaseOf(spark, frontierAll, bstatsAll, rollupAll, adjAll)._1
        .write.mode("overwrite").parquet(s"$releaseDir/batch_id=$batchId")
    } finally persisted.foreach(_.unpersist())
  }

  /** The release design folded from carried state: additive rollups
    * give the gate/cut/input rows; the PPS sample is recovered by
    * mapping each of the ≤ ~199 unit boundaries into its bucket
    * (ADJUSTED bucket cum-ranges tile the frontier) and scanning ONLY
    * those buckets' frontier partitions; retro-cut deltas from `adjAll`
    * then correct each pruned row's nt (its own deltas) and cum (a
    * prefix sum of all deltas at ids ≤ its own — ta6's two-level
    * form: a bucket-partitioned window over pruned ∪ candidate-bucket
    * adj rows plus a broadcast theta-join bucket prefix, so no global
    * ordered window survives); splits + shard packing run on the sampled
    * ≤ ~200 docs through the same cp5ShardsOf path as the batch
    * release. Returns (design, prunedFrontier) — the second element is
    * the diagnostic the scale spec counts; production ignores it (it
    * shares the design's plan, nothing extra runs).
    */
  private[graft] def releaseOf(spark: SparkSession, frontierAll: DataFrame,
                               bstatsAll: DataFrame, rollupAll: DataFrame,
                               adjAll: DataFrame): (DataFrame, DataFrame) = {
    val roll = rollupAll.filter(col("stage") =!= "_max")
      .groupBy(col("stage"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val sAgg = bstatsAll.agg(
      coalesce(sum(col("bdocs")), lit(0L)), coalesce(sum(col("btot")), lit(0L))).first()
    // delta-set-sized aggregate: bounded by the docs ever retro-cut
    // (compaction sums a doc's deltas to one row), never the corpus
    val adjTot = Option(adjAll.agg(sum(col("delta"))).first().get(0))
      .fold(0L)(_.asInstanceOf[Long])
    val (survDocs, tot) = (sAgg.getLong(0), sAgg.getLong(1) - adjTot)
    val emptyFrontier = frontierAll.limit(0)
    if (survDocs == 0L) return (roll, emptyFrontier)
    val step = math.max(1L, tot / 100L)
    val nBounds = tot / step // ≤ 199 for any tot (worst case tot = 2·step − 1)
    // boundary m·step lives in the unique bucket whose ADJUSTED
    // cum-range (bprefix, bprefix + btot] contains it; the bucket
    // table is O(√corpus) rows, the boundary side ≤ 199 — broadcast it
    val bucketAdj = adjAll.groupBy(col("bucket")).agg(sum(col("delta")).as("bdelta"))
    val bucketTable = bstatsAll.groupBy(col("bucket"))
      .agg(sum(col("btot")).as("braw"))
      .join(bucketAdj, Seq("bucket"), "left")
      .withColumn("btot", col("braw") - coalesce(col("bdelta"), lit(0L)))
      .withColumn("bprefix", coalesce(sum(col("btot")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val bounds = spark.range(1L, nBounds + 1L)
      .select((col("id") * step).as("v"))
    // candidate buckets: ≤ nBounds values — a bounded driver-side
    // list, which turns the frontier read into a partition-pruned
    // scan of ~boundaries·bucketload rows instead of the whole corpus
    val cands = bucketTable.join(broadcast(bounds),
        col("bprefix") < col("v") && col("v") <= col("bprefix") + col("btot"))
      .select(col("bucket")).distinct()
      .collect().map(_.getLong(0))
    val pruned =
      if (cands.isEmpty) emptyFrontier
      else frontierAll.filter(col("bucket").isin(cands: _*))
    // correct the pruned rows by the retro deltas: own delta by an
    // equi-join on doc_id (adj is delta-set-sized -> broadcast); the
    // cum prefix Σ{delta_d : d ≤ x} by ta6's TWO-LEVEL decomposition
    // (bucket = doc_id DIV bucketSize, so bucket order IS doc order):
    //   - CROSS-bucket part: per candidate bucket, the sum of adj
    //     deltas in strictly-SMALLER buckets — a theta-join of the
    //     ≤ ~199 candidate buckets against the delta-bucket rollup
    //     (both bounded, broadcast), no ordered window at all;
    //   - WITHIN-bucket part: a bucket-PARTITIONED window over pruned
    //     ∪ (adj rows of candidate buckets, co-located via their real
    //     bucket), ordered (doc_id, is_f) so a doc's own delta lands
    //     inside its prefix.
    // The previous form ran ONE global-orderBy window over all pruned
    // ∪ adj rows — tens of millions of rows through a single task at
    // a 10¹¹-doc boundary; both parts now run at bounded or
    // per-bucket-parallel grain.
    val sess = spark
    import sess.implicits._
    val ownAdj = adjAll.groupBy(col("doc_id")).agg(sum(col("delta")).as("odelta"))
    val adjPrefix = cands.toSeq.toDF("bucket")
      .join(broadcast(bucketAdj.select(col("bucket").as("ab"), col("bdelta"))),
        col("ab") < col("bucket"), "left")
      .groupBy(col("bucket"))
      .agg(coalesce(sum(col("bdelta")), lit(0L)).as("adj_bprefix"))
    val pr = pruned.select(col("doc_id"), col("nt"), col("cum"), col("bucket"))
      .withColumn("delta", lit(0L)).withColumn("is_f", lit(1))
    val ad = (if (cands.isEmpty) adjAll.limit(0)
              else adjAll.filter(col("bucket").isin(cands: _*)))
      .select(col("doc_id"), col("delta"), col("bucket"))
      .withColumn("nt", lit(0L)).withColumn("cum", lit(0L))
      .withColumn("is_f", lit(0))
      .select(col("doc_id"), col("nt"), col("cum"), col("bucket"),
        col("delta"), col("is_f"))
    val wAdj = Window.partitionBy(col("bucket"))
      .orderBy(col("doc_id"), col("is_f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val adjusted = pr.unionByName(ad)
      .withColumn("ldelta", sum(col("delta")).over(wAdj))
      .filter(col("is_f") === 1)
      .join(broadcast(adjPrefix), Seq("bucket"), "left")
      .join(broadcast(ownAdj), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("nt") - coalesce(col("odelta"), lit(0L))).as("nt"),
        (col("cum") - col("ldelta") - coalesce(col("adj_bprefix"), lit(0L))).as("cum"),
        col("bucket"))
    val sampled = adjusted
      .withColumn("n_units",
        expr(s"cum DIV ${step}L - (cum - nt) DIV ${step}L"))
      .filter(col("n_units") > 0L)
    val spAgg = sampled.agg(count(lit(1)),
      coalesce(sum(col("nt")), lit(0L))).first()
    val (sampledDocs, sampledTokens) = (spAgg.getLong(0), spAgg.getLong(1))
    val bucket100 = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long"), lit(100L))
    val sp = sampled
      .withColumn("split",
        when(bucket100 < 80, "train").when(bucket100 < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("split"), col("nt"), col("bucket"))
    val shards = Pipeline.cp5ShardsOf(sp)
    val design =
      if (survDocs - sampledDocs > 0L)
        roll.unionByName(Seq(("gate:pps_sampled_out",
            survDocs - sampledDocs, tot - sampledTokens))
          .toDF("stage", "n_docs", "n_tokens"))
          .unionByName(shards)
      else roll.unionByName(shards)
    (design, pruned)
  }

  /** Fold every state store's committed partitions into LSM range
    * sentinels (the release store keeps only its latest boundary; a
    * doc's cut versions keep only the newest; retro deltas collapse
    * to one row per doc). Replay exclusion still works — no sentinel
    * covers the in-flight batch — and a replayed pre-compaction batch
    * finds its docs already in the compacted ledger and anti-joins to
    * a no-op. `targetFiles` bounds the file count per sentinel.
    */
  def compactState(spark: SparkSession, stateDir: String,
                   targetFiles: Int = 4,
                   excludeBatchId: Long = Long.MinValue): Unit =
    stores.foreach { name =>
      StateCompaction.compactStore(spark, s"$stateDir/$name", targetFiles,
        // earlier release boundaries are superseded wholesale; a doc's
        // earlier cut versions are superseded by its latest; adj rows
        // are ADDITIVE per doc, so the fold sums them — the store is
        // then bounded by docs EVER retro-cut, not retro-cut events
        // (a boilerplate-heavy doc can re-cut many times); the
        // frontier keeps its bucket partitioning — the fold's pruning key
        keep =
          if (name == "release") StateCompaction.latestBoundary
          else if (name == "cuts") StateCompaction.latestPerDoc
          else if (name == "adj")
            (df => df.groupBy(col("doc_id"), col("bucket"))
              .agg(sum(col("delta")).as("delta"))
              .select(col("doc_id"), col("delta"), col("bucket")))
          else identity,
        bucketCol = if (name == "frontier") Some("bucket") else None,
        excludeBatchId = excludeBatchId)
    }

  /** The streaming entry: (doc_id, text, embedding) crawl stream →
    * accumulated gate indexes + attrition ledger + per-boundary
    * cumulative release design, with the state stores compacted every
    * `compactEvery` batches (0 disables).
    */
  def start(docs: DataFrame, dir: String, stateDir: String,
            checkpointDir: String, compactEvery: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, dir, stateDir, batchId)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          // the boundary batch is still in flight (not checkpoint-
          // committed): carry its partitions through uncompacted so a
          // crash between store swaps leaves every store replay-consistent
          compactState(batch.sparkSession, stateDir, excludeBatchId = batchId)
        ()
      }
      .start()

  /** The release design as of the LATEST completed batch boundary
    * (coverage-end order — a compacted sentinel never outranks a
    * newer per-batch boundary). */
  def readRelease(spark: SparkSession, stateDir: String): DataFrame =
    StateCompaction.latestBoundary(
        StateCompaction.readVisible(spark, s"$stateDir/release")
          .getOrElse(throw new IllegalStateException(
            s"no release design committed under $stateDir/release")))
      .drop("batch_id")

  /** The accumulated attrition ledger (batch_id kept for provenance
    * on uncompacted history). */
  def readAttrition(spark: SparkSession, stateDir: String): DataFrame =
    StateCompaction.readVisible(spark, s"$stateDir/att")
      .getOrElse(throw new IllegalStateException(
        s"no attrition ledger committed under $stateDir/att"))
}
