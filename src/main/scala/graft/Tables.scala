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

  /** Driver fixtures have shipped `events.ts` under two physical types:
    * parquet TIMESTAMP(NANOS) — which Spark 4.x reads as LongType epoch-ns
    * only under `spark.sql.legacy.parquet.nanosAsLong` (SURVEY.md §1.3) —
    * and parquet TIMESTAMP(MICROS) without UTC adjustment, which Spark
    * reads as TimestampNTZ. Normalize both to the epoch-ns long the
    * operators are written against (`ts`, exact integer arithmetic; the
    * session timezone is pinned to UTC so the NTZ cast is lossless), and
    * add the derived views every operator shares.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(p(dir, "events"))
    val ns = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // TIMESTAMP(NANOS) fixture
      case _ => // TIMESTAMP(MICROS) fixture: NTZ/LTZ → epoch-µs → epoch-ns
        raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
    // ts_us: epoch-µs (what DuckDB's µs-precision TIMESTAMP sees — its
    // oracle truncates ns → µs, so all oracle-visible outputs use this);
    // ts_ts: TimestampType view for window()/session_window() ops.
    // integer division — double `/` loses ulps at epoch-ns magnitude
    ns.withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
  }
}
