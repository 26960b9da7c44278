package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the recursive JSON flatten (W2) —
  * the engine's hottest per-row operation at 100 TB.
  *
  * Versus the ScalaUDF form: no Row encoder round-trip, and doGenCode
  * emits a direct static call, so the flatten stays INSIDE the
  * surrounding WholeStageCodegen span instead of breaking the stage at
  * a UDF boundary. The parse itself (Jackson) is the irreducible cost;
  * everything around it is now fused.
  */
case class FlattenJsonExpr(child: Expression, maxDepth: Int = 3)
  extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullSafeEval(input: Any): Any =
    FlattenJsonExpr.flattenToMapData(input.asInstanceOf[UTF8String], maxDepth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = FlattenJsonExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.flattenToMapData($c, $maxDepth);")
  }

  override protected def withNewChildInternal(newChild: Expression): FlattenJsonExpr =
    copy(child = newChild)

  override def prettyName: String = "flatten_json_native"
}

object FlattenJsonExpr {

  /** Static entry shared by interpreted eval and generated code. */
  def flattenToMapData(input: UTF8String, maxDepth: Int): MapData = {
    val m = JsonFlatten.flatten(input.toString, maxDepth)
    if (m == null) null
    else ArrayBasedMapData(
      m.keysIterator.map(UTF8String.fromString).toArray[Any],
      m.valuesIterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Register as a SQL function so plans can use it without UDF
    * plumbing: `expr("flatten_json_native(props)")`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "flatten_json_native",
      (children: Seq[Expression]) => FlattenJsonExpr(children.head),
      "built-in")
}
