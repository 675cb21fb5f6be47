package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product of two numeric-array columns (each side
  * independently `array<float>` or `array<double>`): one loop, no
  * intermediate array — versus `aggregate(zip_with(...))`, which
  * allocates a zipped array per evaluation. The LSH signature path
  * evaluates 16 dots per row (one per hyperplane), so the per-call
  * allocation matters there; the k-means assignment path evaluates one
  * per (vector × centroid) with a double-array centroid side, which is
  * why both element widths are supported.
  *
  * Accumulation order is index-ascending in double precision — identical
  * to the HOF fold, so swapping forms never changes results.
  * NULL if either input is NULL or lengths differ.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects numeric arrays (float/double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (fa, fb) = (isFloat(left), isFloat(right))
    var dot = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName for EVERY local: nullSafeCodeGen leaves this block
      // unbraced when both children are non-nullable, so fixed names would
      // collide across two instances in one generated function (Janino
      // error → silent interpreted fallback). The LSH path emits 16 of
      // these per projection.
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      val dot = ctx.freshName("dot")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.$getA($i) * (double) $b.$getB($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
