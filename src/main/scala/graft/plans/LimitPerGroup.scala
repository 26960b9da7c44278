package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** NATIVE LIMIT-PER-GROUP — the second whole-operator node: emit the
  * first k rows of every group under a given order, the top-k-per-
  * group primitive that the DSL can only express as a rank window +
  * filter. The window form materializes WindowExec frame state and a
  * rank column per row; this exec just COUNTS within the sorted
  * stream — O(1) state (current group key + a counter), zero extra
  * columns, rows stream straight through.
  *
  * Physical contract: child hash-clusters on the group keys and sorts
  * by (group keys, order) — one exchange + sort, after which the pass
  * is free. The partition-sized-group caveat is the same as any
  * grouped top-k (q28's salted two-phase remains the skew answer; the
  * exec serves BOTH of its phases).
  */
case class LimitPerGroupPlan(child: LogicalPlan, groupKeys: Seq[Attribute],
                             order: Seq[SortOrder], k: Int) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LimitPerGroupPlan =
    copy(child = newChild)
}

case class LimitPerGroupExec(child: SparkPlan, groupKeys: Seq[Attribute],
                             order: Seq[SortOrder], k: Int) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupKeys))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupKeys.map(SortOrder(_, Ascending)) ++ order)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    groupKeys.map(SortOrder(_, Ascending)) ++ order

  protected override def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(groupKeys, child.output)
      var cur: UnsafeRow = null
      var n = 0
      iter.filter { row =>
        val g = proj(row)
        if (cur == null || g != cur) {
          cur = g.copy() // the projection reuses its row object
          n = 1
          true
        } else {
          n += 1
          n <= k
        }
      }
    }, preservesPartitioning = true)

  override protected def withNewChildInternal(newChild: SparkPlan): LimitPerGroupExec =
    copy(child = newChild)
}

object LimitPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LimitPerGroupPlan(child, g, o, k) =>
      LimitPerGroupExec(planLater(child), g, o, k) :: Nil
    case _ => Nil
  }
}

object LimitPerGroup {
  /** First k rows per group of `df`, ordered by the named columns
    * (`(name, ascending)` pairs). Column names resolve against the
    * analyzed output; strategy registration is idempotent.
    */
  def limitPerGroup(df: DataFrame, groupCols: Seq[String],
                    orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(LimitPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ LimitPerGroupStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(",")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftSqlBridge.ofRows(spark,
      LimitPerGroupPlan(plan, groupCols.map(attr), order, k))
  }
}
