package graft

import java.nio.file.Files

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale properties the library
  * depends on: predicate/projection pushdown into the parquet scan,
  * partition pruning on the bucketed tracks layout, map-side partial
  * aggregation, and whole-stage codegen over the hot paths. These pin
  * the PLAN, not just the result — a regression that silently turns a
  * pruned scan into a full scan fails here even though results stay
  * correct.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    assume(new java.io.File(sfDir).exists())
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
  }

  test("q02 filter+project pushes both predicate and columns into the scan") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters: ["), "predicate must reach the parquet reader")
    assert(!plan.contains("PushedFilters: []"), "pushed-filter list must not be empty")
    // column pruning: the scan must not read the wide props payload
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), s"scan should prune unused columns: $readSchema")
  }

  test("q01 aggregates map-side before the exchange (partial agg) under codegen") {
    assume(new java.io.File(sfDir).exists())
    val df = SparkEntry.queries("q01_pricing_agg")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), "hash aggregate must run in partial mode below the shuffle")
    df.collect() // AQE shows codegen stages only in the final executed plan
    val finalPlan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(finalPlan.contains("[codegen id :"), s"agg pipeline must be codegen'd:\n$finalPlan")
  }

  test("q03 broadcasts the small dimension side") {
    val plan = planOf("q03_join_revenue")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "nation-sized dims must broadcast, not shuffle")
  }

  test("ll10 decontamination probes the corpus with a broadcast benchmark index") {
    val plan = planOf("ll10_decontaminate")
    assert(plan.contains("BroadcastHashJoin"),
      "the eval-suite-sized shingle index must broadcast; a shuffle join here " +
        "would shuffle the whole training corpus at scale")
  }

  test("ta6 shard packing: corpus-sized window is bucket-partitioned, prefix joins small") {
    val plan = planOf("ta6_shard_pack")
    // the sqrt(N)-row prefix table carries NO forced broadcast hint
    // (l1 reasoning); at this scale AQE/size-stats must still CHOOSE a
    // broadcast — a shuffle join here would mean the size estimate or
    // the sqrt sizing broke
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "the bucket-prefix table should broadcast back to the corpus at test scale")
    assert(plan.contains("hashpartitioning(bucket"),
      "the corpus-sized cumulative sum must run partitioned by bucket")
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1,
      s"only the bucket-totals prefix window may funnel to one partition:\n$plan")
  }

  test("ta10 classifier inference: the model table broadcasts, never shuffles the corpus") {
    val plan = planOf("ta10_quality_classifier")
    assert(plan.contains("BroadcastHashJoin"),
      "the bucket->weight model must ride a broadcast join; a shuffle join " +
        "would repartition every feature instance of the corpus")
  }

  test("ll17 semantic dedup: member-vs-representative joins broadcast (corpus-linear)") {
    val plan = planOf("ll17_semantic_dedup")
    assert(plan.contains("BroadcastHashJoin"),
      "representatives are corpus/256 — they must broadcast so members " +
        "never shuffle; a member-member pair join here is the O(n^2) bug " +
        "this operator exists to avoid")
    assert(!plan.contains("SortMergeJoin"),
      "no corpus-sized shuffle join may appear in the semantic-dedup plan")
  }

  test("ts1 keyword search: idf table broadcasts and top-k is TakeOrdered, not a sort") {
    val plan = planOf("ts1_keyword_search")
    assert(plan.contains("BroadcastHashJoin"),
      "the query-term idf table must broadcast onto the tf aggregate")
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k must run as per-partition heads + driver merge; a " +
        "global Sort here would range-shuffle every scored document")
  }

  test("ts3 BM25: idf broadcasts and top-k is TakeOrdered, not a sort") {
    val plan = planOf("ts3_bm25")
    assert(plan.contains("BroadcastHashJoin"),
      "the query-term idf table must broadcast onto the tf/dl join")
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k must run as per-partition heads + driver merge; a " +
        "global Sort here would range-shuffle every scored document")
  }

  test("ts8 hybrid fusion: the query-term table broadcasts onto the token stream " +
    "and no cartesian appears anywhere in the fused plan") {
    val plan = planOf("ts8_hybrid_rrf")
    assert(plan.contains("BroadcastHashJoin"),
      "the (10 queries x df-capped vocab) term table must broadcast onto " +
        "the matching-token tf aggregate — a shuffle join here re-keys the corpus")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "every fusion stage is an equi-join; a nested-loop means a join " +
        "condition degraded")
  }

  test("q17b native as-of join: custom exec plans one exchange per side and prunes columns") {
    val plan = planOf("q17b_asof_native")
    assert(plan.contains("AsOfJoin"),
      "the custom strategy must plan the native exec, not fall back")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 3, // one per join side + the orders pre-aggregate
      s"as-of join must cost a sort-merge join's shuffles, found $exchanges:\n$plan")
    assert(!plan.contains("Window"),
      "the native exec streams the merge — no window materialization")
  }

  test("L7 at realistic width: 300 trait columns stay ONE shuffle with a pruned scan") {
    assume(new java.io.File(sfDir).exists())
    val df = graft.operators.Relational.usersWideOf(Tables.events(spark, sfDir), 300)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1,
      s"the 300-column latest-trait aggregate must stay ONE user_id shuffle " +
        s"(map-side partial max_by per column), found $exchanges")
    assert(!plan.contains("Window"),
      "width must not smuggle in a per-column window pass")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"the scan must prune to the 4 source columns at any output width: $readSchema")
  }

  test("ll33 substring dedup: anchor counting is an equi-join on the window hash, never pairwise") {
    val plan = planOf("ll33_substring_dedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "maximal-substring detection must stay anchor-count + join-back; " +
        "any nested-loop pairing means the corpus is being compared " +
        "against itself")
    assert(plan.contains("hashpartitioning(whash") || plan.contains("hashpartitioning(doc_id"),
      "the occurrence count must shuffle on the window hash (map-side " +
        "combinable), the island merge on doc_id")
  }

  test("q25 interval join: bucketization yields an equi-join, never a range cross product") {
    val plan = planOf("q25_interval_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "the day-bucket decomposition must turn the range join into a " +
        "hash-partitioned equi-join on (user, bucket); a nested-loop " +
        "theta-join here is the per-user cross product the operator " +
        "exists to avoid")
  }

  test("rl1 fuzzy linkage: candidates come from equi-joins, never a cartesian") {
    val plan = planOf("rl1_fuzzy_link")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "blocking must generate candidates via hash-partitioned equality " +
        "joins on half-keys; any nested-loop pairing is the O(n^2) bug " +
        "blocking exists to avoid")
  }

  test("cp1 composed intake: lang + quality stages fuse, only dedup and ledger shuffle") {
    val plan = planOf("cp1_corpus_intake")
    // two exchanges: the md5 dedup window and the final ledger aggregate
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"stage fusion broken — pipeline shuffles $exchanges times:\n$plan")
  }

  test("cd1 snapshot diff: the text column never enters a shuffle") {
    assume(new java.io.File(sfDir).exists())
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = SparkEntry.queries("cd1_snapshot_diff")(spark, sfDir)
    df.collect()
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // AQE wraps executed subtrees in leaf QueryStageExec nodes —
    // expand through them or collect sees only the stage boundary
    def expand(p: SparkPlan): Seq[SparkPlan] =
      p.collect { case n => n }.flatMap {
        case q: QueryStageExec => q +: expand(q.plan)
        case n => Seq(n)
      }
    val shuffled = expand(root).collect {
      case e: ShuffleExchangeExec => e.child.output.map(_.name)
    }
    assert(shuffled.nonEmpty, "the full outer join must shuffle on doc_id")
    shuffled.foreach(cols => assert(!cols.contains("text"),
      s"each side must collapse to (doc_id, hash) before the join; shuffled: $cols"))
  }

  test("ll2/l8 read their maintained tables (signature index, identity mappings)") {
    // the maintained-index design: pair generation and mapping rollups
    // must be parquet scans of the session-materialized tables, not
    // re-derivations from text/events
    val ll2 = planOf("ll2_minhash_neardup")
    assert(ll2.contains("graft-sigtable"),
      "ll2 must scan the materialized MinHash signature table")
    assert(!ll2.toLowerCase.contains("documents.parquet"),
      "ll2 must not re-shingle the corpus from the documents table")
    val l8 = planOf("l8_identity_resolution")
    assert(l8.contains("graft-idmap"),
      "l8 must scan the materialized identity mappings table")
    assert(!l8.toLowerCase.contains("events.parquet"),
      "l8 must not re-run CC over the events table")
  }

  test("ta27/ta28 tokenizer reads: zero joins, zero UDFs — one codegen scan each") {
    Seq("ta27_tokenizer_fertility", "ta28_vocab_sweep").foreach { q =>
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"$q must not join: the encode is a string chain")
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$q must stay whole-stage-codegen (no UDF)")
      val scans = plan.linesIterator.count(_.contains("FileScan parquet"))
      assert(scans === 1, s"$q must read the corpus exactly once, saw $scans scans")
    }
  }

  test("ev12 BLEU is map-local: no join before the 6-group rollup") {
    val plan = planOf("ev12_bleu_precision")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "clipping is per-(cand, ref) row-local — a gram join is the plan regression " +
        "this test exists to catch")
  }

  test("sch1 scheduling gate: the config side broadcasts, the decision tree fuses") {
    val plan = planOf("sch1_upload_scheduling")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the 9-row config fixture must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "a warehouse-config gate must never shuffle for its config")
  }

  test("trk1 tracker: warehouse config broadcasts; the staging probe aggregates partially") {
    val plan = planOf("trk1_sync_stuck")
    assert(plan.contains("BroadcastExchange"), "the 6-row warehouse table must broadcast")
    assert(plan.contains("partial_max") || plan.contains("partial"),
      "the probe aggregate must combine map-side")
  }

  test("prof16 correlation: two aggregate passes, means broadcast, no corpus self-join") {
    val plan = planOf("prof16_correlation")
    assert(plan.contains("BroadcastExchange"), "the 1-row means must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the centered pass must never shuffle-join the corpus")
  }

  test("bucketed tracks read is partition-pruned to the touched buckets") {
    val sess = spark
    import sess.implicits._
    val dir = Files.createTempDirectory("plan_pruned").toString + "/t"
    val b = (1 to 50).map(i => (s"m$i", "u", "a", "ev",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), i.toDouble))
      .toDF("id", "user_id", "anonymous_id", "event", "timestamp", "received_at", "value")
    EventStream.mergeIntoTracks(spark, dir, b)
    val pruned = spark.read.option("basePath", dir).parquet(dir)
      .filter(col("id_bucket").isin(0, 1))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("id_bucket"),
      s"bucket filter must prune partitions, got: $scan")
    // the pruned scan must touch at most 2 of the bucket directories
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
          .map(_.files.size).sum }.sum
    val total = new java.io.File(dir).listFiles().count(_.getName.startsWith("id_bucket="))
    assert(total > 5, s"fixture should span many buckets, got $total")
    assert(files <= 2, s"pruned scan must read <=2 bucket dirs' files, read $files")
  }

  test("cp5 release: corpus work is O(1) per stage family — bounded jobs, no cartesian") {
    assume(new java.io.File(sfDir).exists())
    val df = SparkEntry.queries("cp5_pretraining_release")(spark, sfDir)
    // the plan STRING inlines the shared (persisted) attribution
    // lineage under every consumer, so node counting overstates scans;
    // the runtime property that actually regresses is a driver loop
    // whose JOB COUNT grows with the corpus (per-doc/per-gate rescans)
    // — a static plan's job count is a small constant at any sf
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        counter.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.collect()
      // listener bus is async: poll until the count is stable rather
      // than betting on a fixed sleep (slow CI delivered late starts)
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 3 && waited < 10000) {
        Thread.sleep(200); waited += 200
        if (counter.get() == last) stable += 1 else { stable = 0; last = counter.get() }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // ~63 AQE query-stage jobs measured at sf0.001 — plan-shaped, not
    // corpus-shaped. The bound is 4x the corpus size (50 docs), NOT a
    // snug constant: any per-doc/per-gate driver loop costs >=1 job
    // per doc per stage and blows through it, while AQE re-planning
    // across Spark versions moves the constant by tens at most
    assert(counter.get() > 0 && counter.get() <= 200,
      s"cp5 launched ${counter.get()} jobs — a corpus-sized driver loop would show here")
    assert(!df.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "no stage may pair the corpus against itself unblocked")
  }

  test("jd2 read-excluded partitions: the blocklist anti-join broadcasts") {
    val plan = planOf("jd2_read_excluded")
    // the exclusion set is metadata-grain (<= workspaces x
    // numPartitions ids); at 100 TB it must ride a broadcast
    // anti-join — a shuffle here would repartition the whole queue
    // scan to skip a handful of partitions
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"exclusions must apply as a broadcast anti-join:\n$plan")
  }
}
