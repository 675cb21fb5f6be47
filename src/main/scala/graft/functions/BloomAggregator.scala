package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter membership sketch as a typed Aggregator: the buffer is
  * the bit array itself (`m` bits in `m/64` longs), `reduce` sets the k
  * probe bits of each key, and `merge` is a bitwise OR — associative and
  * commutative, so Spark runs it with partial aggregation and the
  * shuffle carries one fixed-size bitset per map task instead of the
  * keys. This is how membership screening scales when the "seen" side
  * is too large for an exact join: the finished sketch is a few KB
  * broadcast to every probe task, with a bounded false-positive rate
  * and zero false negatives.
  *
  * Probe positions derive from the caller's 48-bit key as
  * `(key >> 12·i) mod m` for i < k — plain arithmetic both Spark SQL
  * and the DuckDB oracle can replay exactly, which keeps the whole
  * sketch semantics (not just its outputs) cross-engine checkable.
  */
class BloomAggregator(m: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m % 64 == 0, s"bit count $m must pack into longs")

  override def zero: Array[Long] = new Array[Long](m / 64)

  override def reduce(bits: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val p = ((key >>> (12 * i)) % m).toInt
      bits(p / 64) |= (1L << (p % 64))
      i += 1
    }
    bits
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
