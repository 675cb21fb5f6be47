package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd PQ code assignment: given a subvector and the WHOLE
  * packed per-subspace codebook `array<struct<c:int, centroid:
  * array<double>>>` (sorted by c — a few KB, broadcast), returns
  * `struct<c:int, d2:double>` — the argmin squared-L2 over all
  * candidates in ONE projection loop.
  *
  * This is [[ArgmaxCosine]]'s shape for the PQ half of the index
  * ([[graft.ops.Vectors.pqFit]]): the `array_min(transform(codebook,
  * ...))` HOF twin it replaces is CodegenFallback — interpreted per
  * row — which was fine at the k = 16 demo codebooks but becomes the
  * hot loop at the FAISS-default k = 256 (N × M rows × k candidates ×
  * subDim fused multiply-adds per Lloyd pass). Semantics are EXACTLY
  * the HOF twin's, so the DuckDB oracles (which replay the codebook
  * join + `row_number() OVER (ORDER BY d2, c)`) are unchanged:
  *   - d2 accumulates index-ascending in double precision — the
  *     zip_with/aggregate fold order;
  *   - candidates scan in array order (pack with `sort_array` ⇒
  *     c-ascending) with a strictly-less update, so exact ties keep
  *     the LOWEST c — identical to `array_min` over (d2, c) structs
  *     and to the oracle's `ORDER BY d2, c` rank;
  *   - a length-mismatched candidate is SKIPPED (its distance is
  *     undefined). This is the ONE divergence from the HOF twin: the
  *     zip_with form yields NULL d2 for such a candidate, and Spark's
  *     struct ordering sorts a NULL field FIRST ascending, so
  *     `array_min` would have PICKED the mismatched candidate.
  *     Unreachable in [[graft.ops.Vectors.pqFit]] (every centroid is
  *     subDim-length by construction), but a caller with ragged
  *     codebooks gets the skip semantics, not the HOF's;
  *   - NULL input or no valid candidate → NULL.
  */
case class ArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val rightOk = right.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, IntegerType, _, _),
        StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
      case _ => false
    }
    if (leftOk && rightOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "argmin_l2 expects (array<float|double>, " +
        s"array<struct<int, array<double>>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("c", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "argmin_l2"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cands = r.asInstanceOf[ArrayData]
    val fa = leftIsFloat
    val n = v.numElements()
    var bestC = 0
    var bestD2 = 0.0
    var found = false
    var j = 0
    val k = cands.numElements()
    while (j < k) {
      if (!cands.isNullAt(j)) {
        val st = cands.getStruct(j, 2)
        val cent = st.getArray(1)
        if (cent.numElements() == n) {
          var d2 = 0.0
          var t = 0
          while (t < n) {
            val x = if (fa) v.getFloat(t).toDouble else v.getDouble(t)
            val d = x - cent.getDouble(t)
            d2 += d * d
            t += 1
          }
          if (!found || d2 < bestD2) {
            bestD2 = d2; bestC = st.getInt(0); found = true
          }
        }
      }
      j += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestC, bestD2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cands) => {
      val getV = if (leftIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n")
      val bestC = ctx.freshName("bestC"); val bestD2 = ctx.freshName("bestD2")
      val found = ctx.freshName("found"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val st = ctx.freshName("st")
      val cent = ctx.freshName("cent"); val d2 = ctx.freshName("d2")
      val t = ctx.freshName("t"); val d = ctx.freshName("d")
      s"""
         |int $n = $v.numElements();
         |int $bestC = 0; double $bestD2 = 0.0; boolean $found = false;
         |int $k = $cands.numElements();
         |for (int $j = 0; $j < $k; $j++) {
         |  if (!$cands.isNullAt($j)) {
         |    org.apache.spark.sql.catalyst.InternalRow $st = $cands.getStruct($j, 2);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cent = $st.getArray(1);
         |    if ($cent.numElements() == $n) {
         |      double $d2 = 0.0;
         |      for (int $t = 0; $t < $n; $t++) {
         |        double $d = ((double) $v.$getV($t)) - $cent.getDouble($t);
         |        $d2 += $d * $d;
         |      }
         |      if (!$found || $d2 < $bestD2) {
         |        $bestD2 = $d2; $bestC = $st.getInt(0); $found = true;
         |      }
         |    }
         |  }
         |}
         |if (!$found) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{java.lang.Integer.valueOf($bestC), java.lang.Double.valueOf($bestD2)});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminL2 =
    copy(left = newLeft, right = newRight)
}
