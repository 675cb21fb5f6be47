package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Oracle-safe expression helpers.
  *
  * The driver cross-checks every query against DuckDB by hashing result
  * values, so floating-point aggregates must be bit-identical across the
  * two engines. Plain `sum(double)` is order-dependent (Spark sums in
  * partition order, DuckDB in its own scan order), so any double
  * aggregation routes through exact decimal arithmetic — deterministic in
  * both engines — and is emitted as double at the end. The DuckDB side of
  * each query applies the same `CAST(... AS DECIMAL(18,4))` before SUM.
  *
  * At 100 TB this costs one decimal widening per row on the agg path;
  * decimal sums stay inside whole-stage codegen and partial aggregation
  * (map-side combine) still applies, so the shape of the plan is
  * unchanged vs a double sum.
  */
object Ox {
  /** Exact sum of a double column: decimal(18,4) in, double out. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Exact-numerator average: (decimal sum as double) / count. IEEE double
    * division of identical operands is identical in both engines.
    */
  def davg(c: Column): Column = dsum(c) / count(lit(1)).cast(LongType)

  /** count(*) as BIGINT (DuckDB count is BIGINT already; Spark long). */
  def cnt: Column = count(lit(1))

  /** md5-derived uniform in [0, 16^6): the deterministic "random" draw
    * shared by every sampler (mixture/group/temperature/stratified/pca):
    * a pure function of (prefix, key), so every run, engine, executor,
    * and file layout agrees on a row's draw — the reproducibility a
    * 100 TB rerun needs, where seed+partition-order sampling silently
    * changes with the layout. DuckDB twin: fold the first 6 hex chars of
    * md5(prefix || key) to the same integer.
    */
  def mdUniform(prefix: String, key: Column): Column =
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 6), 16, 10)
      .cast("long")
}
