package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd nearest-centroid assignment: given a vector and the
  * WHOLE packed centroid table `array<struct<c:int, centroid:
  * array<double>>>` (sorted by c, a few KB broadcast as a literal-like
  * 1-row cross join), returns `struct<c:int, cos:double>` — the argmax
  * cosine over all candidates in ONE projection loop.
  *
  * This replaces the crossJoin + max_by formulation whose cost is not
  * the arithmetic but the ROW EXPLOSION: N × nlist joined rows (each
  * dragging a vector copy and a centroid copy) materialized through a
  * join and partially re-aggregated, per Lloyd pass. With nlist = √N
  * that is N^1.5 rows of shuffle-side traffic at scale; measured at the
  * ×100 corpus (200 k vectors, nlist 448) the explosion put
  * q_embed_kmeans at 31 s where this projection form needs none of it.
  * The per-row loop is k·dim fused multiply-adds in whole-stage
  * codegen — the FAISS IVF-assign shape expressed as a Catalyst
  * expression.
  *
  * Semantics are EXACTLY the crossJoin twin's, so the DuckDB oracles
  * (which replay the cross join + `row_number() OVER (ORDER BY cos
  * DESC, c)`) are unchanged:
  *   - cosine accumulates index-ascending in double precision
  *     (bit-identical to [[CosineSimilarity]] and the HOF fold);
  *   - candidates are scanned in array order (pack with `sort_array` ⇒
  *     c-ascending) with a strictly-greater update, so exact ties keep
  *     the LOWEST c — identical to `max_by(struct(cos, -c))` and to
  *     the oracle's `ORDER BY cos DESC, c` rank;
  *   - a zero-norm candidate and a length-mismatched candidate are
  *     skipped (their cosine is undefined — the crossJoin twin yields
  *     NULL cos for them and desc-NULLS-LAST ranking never picks them);
  *   - NULL/zero-norm input vector, or no valid candidate → NULL.
  */
case class ArgmaxCosine(left: Expression, right: Expression)
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
      "argmax_cosine expects (array<float|double>, " +
        s"array<struct<int, array<double>>>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = StructType(Seq(
    StructField("c", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "argmax_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val fa = leftIsFloat
    val n = v.numElements()
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = if (fa) v.getFloat(i).toDouble else v.getDouble(i)
      na += x * x
      i += 1
    }
    if (na == 0.0) return null
    val sqna = math.sqrt(na)
    var bestC = 0
    var bestCos = 0.0
    var found = false
    var j = 0
    val k = cents.numElements()
    while (j < k) {
      if (!cents.isNullAt(j)) {
        val st = cents.getStruct(j, 2)
        val cent = st.getArray(1)
        if (cent.numElements() == n) {
          var dot = 0.0; var nb = 0.0
          var t = 0
          while (t < n) {
            val x = if (fa) v.getFloat(t).toDouble else v.getDouble(t)
            val y = cent.getDouble(t)
            dot += x * y; nb += y * y
            t += 1
          }
          if (nb > 0.0) {
            val cos = dot / (sqna * math.sqrt(nb))
            if (!found || cos > bestCos) {
              bestCos = cos; bestC = st.getInt(0); found = true
            }
          }
        }
      }
      j += 1
    }
    if (!found) null
    else new GenericInternalRow(Array[Any](bestC, bestCos))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val getV = if (leftIsFloat) "getFloat" else "getDouble"
      // fresh names: nullSafeCodeGen may splice this block unbraced
      val n = ctx.freshName("n"); val na = ctx.freshName("na")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      val sqna = ctx.freshName("sqna")
      val bestC = ctx.freshName("bestC"); val bestCos = ctx.freshName("bestCos")
      val found = ctx.freshName("found"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val st = ctx.freshName("st")
      val cent = ctx.freshName("cent"); val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb"); val t = ctx.freshName("t")
      val y = ctx.freshName("y"); val cos = ctx.freshName("cos")
      s"""
         |int $n = $v.numElements();
         |double $na = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.$getV($i);
         |  $na += $x * $x;
         |}
         |if ($na == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sqna = java.lang.Math.sqrt($na);
         |  int $bestC = 0; double $bestCos = 0.0; boolean $found = false;
         |  int $k = $cents.numElements();
         |  for (int $j = 0; $j < $k; $j++) {
         |    if (!$cents.isNullAt($j)) {
         |      org.apache.spark.sql.catalyst.InternalRow $st = $cents.getStruct($j, 2);
         |      org.apache.spark.sql.catalyst.util.ArrayData $cent = $st.getArray(1);
         |      if ($cent.numElements() == $n) {
         |        double $dot = 0.0; double $nb = 0.0;
         |        for (int $t = 0; $t < $n; $t++) {
         |          double $x = (double) $v.$getV($t);
         |          double $y = $cent.getDouble($t);
         |          $dot += $x * $y; $nb += $y * $y;
         |        }
         |        if ($nb > 0.0) {
         |          double $cos = $dot / ($sqna * java.lang.Math.sqrt($nb));
         |          if (!$found || $cos > $bestCos) {
         |            $bestCos = $cos; $bestC = $st.getInt(0); $found = true;
         |          }
         |        }
         |      }
         |    }
         |  }
         |  if (!$found) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{java.lang.Integer.valueOf($bestC), java.lang.Double.valueOf($bestCos)});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxCosine =
    copy(left = newLeft, right = newRight)
}
