package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY.md §4.3's planned worked example):
  * element-wise mean of `Array[Float]` embedding vectors.
  *
  * The buffer is (running double sums, count) — partial aggregation
  * (`merge`) works across partitions, so the shuffle carries one
  * (dim+1)-wide buffer per group instead of the raw vectors: the correct
  * 100 TB layout for dense-vector reduction. Usage:
  * `ds.groupByKey(_.label).agg(CentroidAggregator.toColumn)` or
  * `udaf(CentroidAggregator)` for the untyped API.
  */
object CentroidAggregator
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    val s = if (sums.isEmpty) new Array[Double](v.length) else sums
    // fail loudly on ragged inputs: a centroid over mixed dimensionality
    // is undefined, and a silent truncation (or an AIOOBE mid-task) is
    // far worse than an immediate, explicit error
    require(v.length == s.length,
      s"CentroidAggregator: vector of dim ${v.length} in a group of dim ${s.length}")
    var i = 0
    while (i < v.length) { s(i) += v(i); i += 1 }
    (s, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) =
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      require(a._1.length == b._1.length,
        s"CentroidAggregator: merging buffers of dim ${a._1.length} and ${b._1.length}")
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0L) Array.empty[Float]
    else r._1.map(s => (s / r._2).toFloat)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Float]] =
    ExpressionEncoder[Array[Float]]()
}
