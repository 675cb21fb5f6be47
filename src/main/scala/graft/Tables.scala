package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (`/root/testdata/sf*`, schemas in
  * FIXTURES.md §2). One parquet file per table; at 100 TB each would be a
  * partitioned directory — the loaders take a directory and a name so the
  * layout can change without touching operators.
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** `events.ts` is parquet TIMESTAMP(NANOS); Spark 4.x rejects it unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, which surfaces it as
    * LongType epoch-nanoseconds (see SURVEY.md §1.3). We keep the raw long
    * (`ts`, exact arithmetic, matches DuckDB `epoch_ns(ts)`) and add a
    * microsecond-truncated TimestampType view (`ts_ts`) for window ops.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(p(dir, "events"))
      // ts_us: epoch-µs (what DuckDB's µs-precision TIMESTAMP sees — its
      // oracle truncates ns → µs, so all oracle-visible outputs use this);
      // ts_ts: TimestampType view for window()/session_window() ops.
      // integer division — double `/` loses ulps at epoch-ns magnitude
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
  }
}
