package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Automated scale-killer sweep over EVERY SparkEntry query's physical
  * plan — the regression gate for the properties a 100 TB deployment
  * dies without. Rules:
  *
  *  (a) no CartesianProduct, ever;
  *  (b) a nested-loop join (crossJoin) is legal only when one side is
  *      a config-sized LocalTableScan (broadcast fixture) — pairing
  *      two data-backed inputs without an equi-key is the O(n²) bug;
  *  (c) no Window/global-Sort fed by an Exchange SinglePartition whose
  *      subtree reads table files — that funnels a corpus through one
  *      task. Aggregate-below-exchange shapes (global counts; 32-row
  *      bucket totals) are row-collapsed and safe: the ones relied on
  *      are pinned below WITH their safety argument, so a new
  *      occurrence fails until justified.
  *
  * AQE is disabled while planning so the sweep sees the static plan
  * (AQE can only improve on it at runtime).
  */
class ScaleGuardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** query -> why its single-partition window/sort is safe at scale */
  private val singlePartitionPinned: Map[String, String] = Map(
    "ta6_shard_pack" ->
      ("the global prefix window runs over bucket TOTALS — exactly " +
        "n_buckets (32) rows regardless of corpus size; per-doc " +
        "cumulative sums stay bucket-partitioned"))

  /** query -> why its nested-loop join is safe despite no local side.
    * All three pair the corpus against a BROADCAST of an explicitly
    * bounded query set (filtered to < 10 ids): cost is k·n, linear in
    * the corpus for fixed k. They are the brute-force ORACLE ANCHORS —
    * the pruned scale paths are ll4/ll4b (IVF), ll7/ll8 (LSH) and
    * ll16's own rerank stage.
    */
  private val nestedLoopPinned: Map[String, String] = Map(
    "ll3_ann_topk" ->
      "brute-force k×n baseline; broadcast query side bounded to <10 rows by filter",
    "ll16_quantized_ann" ->
      "int8 coarse stage is k×n by design; broadcast query side bounded to <10 rows",
    "mm3_media_similar" ->
      "feature-similarity baseline; broadcast query side bounded to <10 rows",
    "ll21_hard_negatives" ->
      "brute-force k×n baseline (label anti-filter); broadcast query side bounded to <10 rows")

  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(flatten)

  private def hasFileScan(p: SparkPlan): Boolean =
    flatten(p).exists(_.isInstanceOf[FileSourceScanExec])

  private def oneSideLocal(l: SparkPlan, r: SparkPlan): Boolean = {
    def configSized(leaf: SparkPlan): Boolean = leaf match {
      case _: LocalTableScanExec => true // literal fixture
      case rg: RangeExec => rg.numElements <= 4096 // spark.range epoch/salt fan-outs
      case _ => false
    }
    def allLocal(s: SparkPlan): Boolean =
      flatten(s).collect { case leaf if leaf.children.isEmpty => leaf }
        .forall(configSized)
    allLocal(l) || allLocal(r)
  }

  /** Walks through sorts/projections to see whether a window/sort input
    * is a single-partition exchange.
    */
  private def feedsSinglePartition(n: SparkPlan): Boolean = n match {
    case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
    case s: SortExec => feedsSinglePartition(s.child)
    case p: ProjectExec => feedsSinglePartition(p.child)
    case _ => false
  }

  private def violations(name: String, plan: SparkPlan): Seq[String] =
    flatten(plan).flatMap {
      case c: CartesianProductExec if !oneSideLocal(c.left, c.right) =>
        Some(s"$name: CartesianProduct over two data-backed inputs")
      case j: BroadcastNestedLoopJoinExec
        if !oneSideLocal(j.left, j.right) && !nestedLoopPinned.contains(name) =>
        Some(s"$name: nested-loop join without a config-sized local side")
      case w: WindowExec
        if feedsSinglePartition(w.child) && hasFileScan(w) &&
          !singlePartitionPinned.contains(name) =>
        Some(s"$name: corpus-backed Window over Exchange SinglePartition")
      case s: SortExec
        if s.global && feedsSinglePartition(s.child) && hasFileScan(s) &&
          !singlePartitionPinned.contains(name) =>
        Some(s"$name: corpus-backed global Sort over Exchange SinglePartition")
      case _ => None
    }

  test("no query plan contains a scale-killer (cartesian / unpinned 1-partition window)") {
    assume(new java.io.File(sfDir).exists())
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val found = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        violations(name, plan)
      }
      assert(found.isEmpty, "scale-killer plans found:\n" + found.mkString("\n"))
      // the pins must still be needed — a stale pin hides regressions
      val stale = (singlePartitionPinned.keys ++ nestedLoopPinned.keys)
        .filterNot(SparkEntry.queries.contains)
      assert(stale.isEmpty, s"pinned exceptions for unknown queries: $stale")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
