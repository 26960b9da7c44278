package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** NATIVE AS-OF JOIN — the whole-operator path of the build plan's
  * preference order (custom LogicalPlan + Strategy + SparkPlan),
  * for the one relational operator Spark's DSL cannot express without
  * the union trick q17 uses: for every left row, the LATEST right row
  * of the same key with right.ts <= left.ts
  * (`warehouse/identity` lookups and q17's event->order enrichment
  * are this shape).
  *
  * The key/ts ATTRIBUTES are carried as node expressions, so the node
  * plays fair with the optimizer: ColumnPruning sees them in
  * `references` and keeps them alive while still pruning unused
  * payload columns straight through the join — the same column-prune
  * story a built-in join has (PlanSpec pins this).
  *
  * Physical contract — the part that matters at 100 TB: both children
  * hash-cluster on the key and sort within partitions by (key, ts),
  * which EnsureRequirements satisfies with ONE exchange + sort per
  * side (identical to a sort-merge join's shape); the merge itself is
  * a single forward pass per partition holding ONE buffered right row
  * — O(|L| + |R|) time, O(1) state, no per-key grouping, no window
  * materialization. The union-trick q17 pays the same exchange but
  * materializes a running window; this node streams.
  *
  * Left-outer semantics: unmatched left rows pad the right side with
  * nulls. Right rows should be unique per (key, ts) for a
  * deterministic match — q17b collapses them with a greatest-wins
  * aggregate first, as q17 does.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        lKey: Attribute, lTs: Attribute,
                        rKey: Attribute, rTs: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        lKey: Attribute, lTs: Attribute,
                        rKey: Attribute, rTs: Attribute) extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(lKey)),
    ClusteredDistribution(Seq(rKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(lKey, Ascending), SortOrder(lTs, Ascending)),
    Seq(SortOrder(rKey, Ascending), SortOrder(rTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(lKey, Ascending), SortOrder(lTs, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    // bind the key/ts attributes to their (possibly pruned) child
    // positions by exprId — positions are NOT stable under
    // ColumnPruning, which is free to drop payload columns
    def idx(attrs: Seq[Attribute], a: Attribute): Int = {
      val i = attrs.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"as-of attribute $a missing from ${attrs.mkString(",")}")
      i
    }
    val (lkI, ltI) = (idx(left.output, lKey), idx(left.output, lTs))
    val (rkI, rtI) = (idx(right.output, rKey), idx(right.output, rTs))
    val nRight = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nulls = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      lIter.map { l =>
        val lk = l.getLong(lkI)
        val lt = l.getLong(ltI)
        // advance the right side up to (lk, lt]; the last row of the
        // SAME key becomes the as-of match. Rows of earlier keys are
        // simply passed over — both inputs share one (key, ts) order.
        while (rHead != null && {
          val rk = rHead.getLong(rkI)
          rk < lk || (rk == lk && rHead.getLong(rtI) <= lt)
        }) {
          if (rHead.getLong(rkI) == lk) {
            lastMatch = rHead.copy() // iterator reuses the row object
            lastMatchKey = lk
          }
          rHead = if (rIter.hasNext) rIter.next() else null
        }
        val m = if (lastMatch != null && lastMatchKey == lk) lastMatch else nulls
        proj(joined(l, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: the one-node translation, registered either through
  * `spark.experimental.extraStrategies` (what [[AsOfJoins.asof]]
  * does, works on any live session) or `GraftExtensions`
  * (config-time, covers Connect/Thrift-served sessions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoins {
  /** As-of-join two frames following the (key, ts, payload...) column
    * convention — both LongType. Output = left columns ++ right
    * columns (right side nullable); registration of the planner
    * strategy is idempotent.
    */
  def asof(left: DataFrame, right: DataFrame): DataFrame = {
    Seq(left, right).foreach { df =>
      require(df.schema(0).dataType == LongType && df.schema(1).dataType == LongType,
        s"as-of inputs lead with (key: bigint, ts: bigint); got ${df.schema.simpleString}")
    }
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        lPlan.output(0), lPlan.output(1), rPlan.output(0), rPlan.output(1)))
  }
}
