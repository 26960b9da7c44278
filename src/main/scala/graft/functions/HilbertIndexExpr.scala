package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression for the 16-bit Hilbert index (zo2's
  * layout key). The declarative form — an `aggregate()` fold over 16
  * iterations — is semantically right but runs INTERPRETED (higher-
  * order functions don't codegen) and allocates a struct per
  * iteration per row: measured 11.5 s over sf0.1 lineitem. This
  * expression emits one static call containing the tight 16-step
  * loop, stays inside the surrounding WholeStageCodegen span, and
  * allocates nothing. LayoutSpec pins it point-for-point against the
  * fold expression and the Scala twin.
  */
case class HilbertIndexExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndexExpr.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HilbertIndexExpr.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = $cls.MODULE$$.compute($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

object HilbertIndexExpr {

  /** The xy2d walk — identical arithmetic to Layout.hilbertSql's fold
    * and Layout.hilbertAt (quadrant = 3rx + ry - 2rxry, reflect+swap
    * when ry = 0). Inputs are 16-bit scaled coordinates.
    */
  def compute(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var i = 15
    while (i >= 0) {
      val s = 1L << i
      val rx = (x >> i) & 1L
      val ry = (y >> i) & 1L
      d += s * s * (3L * rx + ry - 2L * rx * ry)
      if (ry == 0L) {
        val nx = if (rx == 1L) s - 1L - y else y
        val ny = if (rx == 1L) s - 1L - x else x
        x = nx
        y = ny
      }
      i -= 1
    }
    d
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_index",
      (children: Seq[Expression]) => HilbertIndexExpr(children.head, children(1)),
      "built-in")
}
