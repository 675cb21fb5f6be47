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
    * only under `spark.sql.legacy.parquet.nanosAsLong`, set once at
    * session build (GraftSession / SparkSpec; SURVEY.md §1.3) — and
    * parquet TIMESTAMP(MICROS) without UTC adjustment, which Spark reads
    * as TimestampNTZ.
    *
    * Deriving the canonical epoch-ns `ts` as an expression per query
    * defeats parquet predicate pushdown and row-group min/max pruning on
    * the fact table's time column — at 100 TB a selective time-range
    * query would read every row group. So the fixture is normalized ONCE
    * per (fixture file) into a canonical table whose columns are all
    * physical: `ts` epoch-ns long (exact integer arithmetic; session
    * timezone pinned UTC so the NTZ cast is lossless), `ts_us` epoch-µs
    * (what DuckDB's µs-precision oracle sees), `ts_ts` TimestampType for
    * window()/session_window(). This is the normalize-at-ingest shape a
    * production pipeline runs: pay one linear pass, then every
    * downstream query scans a long column with full stats. Queries on
    * any of the three views push filters into the scan (PlanSpec pins
    * this).
    */
  def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(canonicalEvents(s, dir))

  /** dir → published canonical path, resolved at most once per JVM. */
  private val eventsNorm = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def canonicalEvents(s: SparkSession, dir: String): String =
    eventsNorm.computeIfAbsent(dir, _ => {
      val srcPath = new java.io.File(p(dir, "events"))
      // cache key covers the fixture's byte identity: a driver
      // regeneration (new mtime/size) gets a fresh normalization
      val key = md5Hex(s"${srcPath.getAbsolutePath}:${srcPath.length}:${srcPath.lastModified}")
      // the normalized-output root is configurable: on a cluster it must
      // be SHARED storage every executor can read (the normalize-at-
      // ingest job's published table), not the driver's local tmpdir —
      // which remains the single-node harness default
      val rootDir = s.conf.get("spark.graft.events.normRoot",
        System.getProperty("java.io.tmpdir"))
      val base = new java.io.File(rootDir, s"graft_events_norm_$key")
      val dest = new java.io.File(base, "events.parquet")
      if (dest.exists()) dest.getPath
      else {
        val raw = s.read.parquet(srcPath.getPath)
        val ns = raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType => raw // TIMESTAMP(NANOS) fixture
          case _ => // TIMESTAMP(MICROS) fixture: NTZ/LTZ → epoch-µs → epoch-ns
            raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
        }
        // integer division — double `/` loses ulps at epoch-ns magnitude
        val canon = ns
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts_ts", timestamp_micros(expr("ts div 1000")))
        // write aside, publish by atomic directory rename: a concurrent
        // JVM either wins the rename or finds the winner's copy
        val tmp = new java.io.File(base.getParentFile,
          s"${base.getName}.tmp-${ProcessHandle.current().pid()}")
        canon.write.mode("overwrite").option("compression", "snappy")
          .parquet(new java.io.File(tmp, "events.parquet").getPath)
        if (tmp.renameTo(base) || dest.exists()) dest.getPath
        else new java.io.File(tmp, "events.parquet").getPath
      }
    })

  private def md5Hex(v: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
