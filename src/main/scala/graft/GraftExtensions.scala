package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductExpr, FlattenJsonExpr, HilbertIndexExpr, SafeNameExpr, SqDistExpr, Utf16LengthExpr}

/** Production injection point: register the engine's native Catalyst
  * expressions at session build time —
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * so every session (including Thrift/Connect-served ones) sees
  * `flatten_json_native` without imperative registration calls.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator nodes: native as-of join + limit-per-group
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.LimitPerGroupStrategy)
    ext.injectFunction((
      FunctionIdentifier("flatten_json_native"),
      new ExpressionInfo(classOf[FlattenJsonExpr].getName, "flatten_json_native"),
      (children: Seq[Expression]) => FlattenJsonExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("safe_name_native"),
      new ExpressionInfo(classOf[SafeNameExpr].getName, "safe_name_native"),
      (children: Seq[Expression]) => SafeNameExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("utf16_length"),
      new ExpressionInfo(classOf[Utf16LengthExpr].getName, "utf16_length"),
      (children: Seq[Expression]) => Utf16LengthExpr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndexExpr].getName, "hilbert_index"),
      (children: Seq[Expression]) => HilbertIndexExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_native"),
      (children: Seq[Expression]) => DotProductExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sqdist_native"),
      new ExpressionInfo(classOf[SqDistExpr].getName, "sqdist_native"),
      (children: Seq[Expression]) => SqDistExpr(children.head, children(1))))
  }
}
