package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact per-group top-K as a typed Aggregator.
  *
  * A rank window (`row_number().over(partitionBy(g))`) must co-locate
  * EVERY row of a group on one task — the single-reducer-per-group
  * bottleneck that kills skewed groups at 100 TB. This aggregator's
  * buffer is a bounded sorted list of the K best (value, id) pairs,
  * and `merge` is associative/commutative, so Spark runs it with
  * partial aggregation: each map task contributes at most K rows per
  * group to the shuffle regardless of group size, and the final reduce
  * merges ≤ K·#map-tasks candidates. Ordering is value DESC with id ASC
  * tie-break — fully deterministic, so results are oracle-comparable
  * against the window formulation they replace.
  *
  * (q_group_sample solves the same problem probabilistically with a
  * hash threshold; this is the exact algebraic form.)
  *
  * Semantics are top-K over DISTINCT (value, id) pairs: insert skips a
  * pair already in the buffer, so a duplicated input row cannot occupy
  * two of the K slots and evict a real candidate (it also makes merge
  * idempotent on overlapping partials). With unique ids — the common
  * case, e.g. q_grouped_topk's event_id — distinct-pair and multiset
  * top-K coincide.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // insert keeping the buffer sorted (value DESC, id ASC), bounded, and
  // duplicate-free: O(k) per row, allocation-light for the hot reduce path
  private def insert(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] = {
    // TOTAL order via Double.compare, not primitive >: with IEEE
    // comparisons a NaN key makes every test false, so NaN inserts at
    // the head AND later finite keys insert ahead of it — buffer order
    // then depends on arrival order and take(k) may evict a larger
    // finite value. Double.compare ranks NaN above +Inf consistently,
    // so ordering and truncation are arrival-independent for any keys.
    val (better, worse) = b.span { e =>
      val c = java.lang.Double.compare(e._1, x._1)
      c > 0 || (c == 0 && e._2 < x._2)
    }
    // duplicate test over the WHOLE buffer with explicit NaN handling:
    // primitive == alone misses NaN duplicates (NaN != NaN), boxed
    // Tuple2.equals alone misses -0.0 vs 0.0 (Double.equals separates
    // them), and NaN entries all pile at the span boundary so a
    // head-only check is insufficient — an O(k) scan (k is small and
    // insert is O(k) already) covers every case
    def sameVal(a: Double, c: Double): Boolean = a == c || (a.isNaN && c.isNaN)
    if (b.exists(e => sameVal(e._1, x._1) && e._2 == x._2)) b
    else {
      val merged = better ::: (x :: worse)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    insert(b, a)

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
