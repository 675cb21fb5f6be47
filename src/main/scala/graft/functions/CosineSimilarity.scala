package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric-array
  * columns (each side independently `array<float>` or `array<double>`)
  * in ONE codegen'd loop (dot product and both norms accumulated
  * together), versus the composed higher-order-function form
  * (`aggregate(zip_with(...)) / (sqrt(aggregate(...)) * ...)`) which
  * allocates an intermediate array and walks each input three times.
  * The double side exists for the k-means assignment path, whose
  * centroids are double arrays: the HOF form there is interpreted
  * (HigherOrderFunction is CodegenFallback), and the assignment
  * evaluates N × nlist cosines per Lloyd pass.
  *
  * Accumulation order (index-ascending, double precision) is identical to
  * the HOF form, so results are bit-identical and oracle-safe — the spec
  * asserts exact equality against the HOF formulation.
  *
  * Null/shape semantics: NULL if either input is NULL, if lengths differ,
  * or if either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects numeric arrays (float/double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val (fa, fb) = (isFloat(left), isFloat(right))
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName for EVERY local: nullSafeCodeGen leaves this block
      // unbraced when both children are non-nullable, so fixed names would
      // collide across two instances in one generated function (Janino
      // error → silent interpreted fallback)
      val getA = if (isFloat(left)) "getFloat" else "getDouble"
      val getB = if (isFloat(right)) "getFloat" else "getDouble"
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$getA($i);
         |    double $y = (double) $b.$getB($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API surface for the native functions.
  * Sessions built with `graft.GraftExtensions` get `cosine_sim` at
  * session construction; `register` is the fallback for plain sessions
  * and is a no-op when the function already exists.
  */
object VectorFunctions {
  /** Idempotent SQL registration: `SELECT cosine_sim(a, b)` /
    * `dot_product(a, b)`.
    */
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
      reg.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product")))
      reg.createOrReplaceTempFunction(
        "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("argmax_cosine")))
      reg.createOrReplaceTempFunction(
        "argmax_cosine", exprs => ArgmaxCosine(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("argmin_l2")))
      reg.createOrReplaceTempFunction(
        "argmin_l2", exprs => ArgminL2(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("l2_sq")))
      reg.createOrReplaceTempFunction(
        "l2_sq", exprs => L2Sq(exprs(0), exprs(1)), "built-in")
  }

  /** Column API: `cosine_sim($"a", $"b")` (registers lazily via expr). */
  def cosine_sim(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }

  /** Column API: `dot_product($"a", $"b")`. */
  def dot_product(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("dot_product", a, b)
  }

  /** Column API: `argmax_cosine($"vec", $"packedCentroids")` →
    * `struct<c, cos>` (see [[ArgmaxCosine]]).
    */
  def argmax_cosine(s: SparkSession, v: Column, cents: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("argmax_cosine", v, cents)
  }

  /** Column API: `argmin_l2($"subvec", $"packedCodebook")` →
    * `struct<c, d2>` (see [[ArgminL2]]).
    */
  def argmin_l2(s: SparkSession, v: Column, cands: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("argmin_l2", v, cands)
  }

  /** Column API: `l2_sq($"a", $"b")` → double Σ(aᵢ−bᵢ)² (see [[L2Sq]]). */
  def l2_sq(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    org.apache.spark.sql.functions.call_function("l2_sq", a, b)
  }
}
