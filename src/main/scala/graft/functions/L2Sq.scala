package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd squared-L2 distance between two aligned double
  * arrays: `l2_sq(a, b) = Σᵢ (aᵢ − bᵢ)²`, index-ascending double
  * accumulation.
  *
  * This is the ADC hot loop of the IVF-PQ serving path
  * ([[graft.ops.Vectors]]): the distance-table build evaluates it once
  * per (query, probed list, subspace, codeword) — ~360k rows at the
  * sf0.1 50-query panel, ~3.5 s of interpreted CPU per ADC pass as the
  * `aggregate(zip_with(sv, centroid, (a,b) -> (a-b)*(a-b)), 0, +)` HOF
  * twin (HigherOrderFunctions are CodegenFallback). Semantics are
  * EXACTLY the twin's, so every DuckDB oracle replay is unchanged:
  *   - per element, d = aᵢ − bᵢ once, the product d·d, accumulated
  *     left-to-right from 0.0 — the same IEEE ops in the same order
  *     (the HOF's lambda evaluates (a−b) twice, but both evaluations
  *     yield the identical IEEE value, so d·d is bit-equal);
  *   - mismatched lengths → NULL (the zip_with twin pads with NULL,
  *     which nulls the whole fold);
  *   - element NULLs are not expected (dense vector slices); the twin
  *     would propagate NULL, and so does the mismatch rule here —
  *     callers only pass non-null dense arrays;
  *   - NULL input → NULL (BinaryExpression null-safe contract).
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "l2_sq expects (array<float|double>, array<float|double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val fa = isFloat(left)
    val fb = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ((double) $a.$getA($i)) - ((double) $b.$getB($i));
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}
