package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The remaining tiny Catalyst expressions SURVEY §2.9 calls for:
  * safe-name mangling and UTF-16 length, both emitting direct static
  * calls from doGenCode so they stay inside whole-stage codegen like
  * FlattenJsonExpr.
  */
case class SafeNameExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    SafeNameExpr.eval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = SafeNameExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.MODULE$$.eval($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): SafeNameExpr =
    copy(child = newChild)
  override def prettyName: String = "safe_name_native"
}

object SafeNameExpr {
  def eval(input: UTF8String): UTF8String =
    UTF8String.fromString(SafeNames.toSafeName(input.toString))
}

/** UTF-16 code-unit length — the unit the Redshift text>512 rule
  * counts (transformer.go:32 uses Go utf16 length). Spark's `length`
  * counts code points; astral-plane characters count twice here.
  */
case class Utf16LengthExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.length
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c.toString().length();")
  override protected def withNewChildInternal(newChild: Expression): Utf16LengthExpr =
    copy(child = newChild)
  override def prettyName: String = "utf16_length"
}

object NameExprs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "safe_name_native", (children: Seq[Expression]) => SafeNameExpr(children.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "utf16_length", (children: Seq[Expression]) => Utf16LengthExpr(children.head), "built-in")
  }
}
