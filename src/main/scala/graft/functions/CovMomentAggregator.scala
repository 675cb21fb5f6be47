package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed object-buffer aggregator for the covariance-moment row sums
  * ([[graft.ops.Vectors]] covMatRows): per group (row index i), sums
  * `CAST(xi · e[j] AS DECIMAL(30,14))` over the sampled vectors for
  * every column index j, returning the d per-j sums as doubles.
  *
  * Replaces a d-wide `sum(cast(... as decimal(30,14)))` hash aggregate:
  * precision 30 exceeds the long-backed decimal range, so every one of
  * the sample × d² updates paid a BigDecimal allocation PLUS a
  * variable-length UnsafeRow buffer rewrite (~7 s single-task at the
  * sf0.1 OPQ decision). As a typed Aggregator (ScalaAggregator =
  * TypedImperativeAggregate) the buffer stays a deserialized
  * `Array[BigDecimal]` between updates and serializes only at partial
  * exchange — the arithmetic is unchanged:
  *   - the per-element cast is java `BigDecimal.valueOf(p).setScale(14,
  *     HALF_UP)` — exactly Spark's double→DECIMAL(30,14) cast (shortest
  *     decimal representation, then half-up at scale 14);
  *   - sums are exact decimal adds, order-free, so partial merge order
  *     cannot change the value;
  *   - finish maps each exact sum through `.toDouble` — the same
  *     BigDecimal→double conversion the old `.cast("double")` ran.
  * The buffer round-trips through the scale-18 decimal encoder; scale-14
  * values widen exactly, so serialization never moves a value.
  */
case class CovMomentAggregator(d: Int)
    extends Aggregator[(Double, Array[Double]), Array[BigDecimal], Array[Double]] {

  override def zero: Array[BigDecimal] = Array.empty[BigDecimal]

  private def cast14(p: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(p)
      .setScale(14, java.math.RoundingMode.HALF_UP))

  override def reduce(b: Array[BigDecimal],
      in: (Double, Array[Double])): Array[BigDecimal] = {
    val (xi, e) = in
    require(e.length == d,
      s"CovMomentAggregator: vector of dim ${e.length}, expected $d")
    val s = if (b.isEmpty) Array.fill(d)(BigDecimal(0)) else b
    var j = 0
    while (j < d) {
      s(j) = s(j) + cast14(xi * e(j))
      j += 1
    }
    s
  }

  override def merge(a: Array[BigDecimal],
      b: Array[BigDecimal]): Array[BigDecimal] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"CovMomentAggregator: merging dims ${a.length} and ${b.length}")
      var j = 0
      while (j < a.length) { a(j) = a(j) + b(j); j += 1 }
      a
    }

  override def finish(r: Array[BigDecimal]): Array[Double] =
    if (r.isEmpty) Array.fill(d)(0.0) else r.map(_.toDouble)

  override def bufferEncoder: Encoder[Array[BigDecimal]] =
    ExpressionEncoder[Array[BigDecimal]]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
