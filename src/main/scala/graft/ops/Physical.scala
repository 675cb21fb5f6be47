package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Ox._

/** Physical-technique operators: the logical result is ordinary (and
  * DuckDB-oracled), the point is the execution shape — skew salting and
  * bucket-co-located joins, the two knobs the 100 TB plan leans on when
  * AQE alone isn't enough.
  */
object Physical {

  /** Skew-salted aggregation: the input is deliberately skewed (~90% of
    * rows share user_id 0 via a synthetic heavy stream unioned onto
    * events). A plain groupBy(user_id) would send the hot key to one
    * task; salting first aggregates on (user_id, salt) — 16-way fan of
    * the hot key — then re-aggregates partials. Both aggregation levels
    * are decimal-exact, so the two-stage result is bit-identical to the
    * one-stage oracle.
    */
  private def skewSalted(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val base = Tables.events(s, dir).select(col("user_id"), col("value"))
    val hot = s.range(100000).select(
      lit(0L).as("user_id"),
      ((col("id") * 37 % 1000).cast(DoubleType) / 10.0).as("value"))
    val skewed = base.union(hot)
    val salted = skewed
      .withColumn("salt", pmod(xxhash64(col("value")), lit(16)))
      .groupBy("user_id", "salt")
      .agg(sum(col("value").cast(DecimalType(18, 4))).as("psum"), cnt.as("pn"))
    salted
      .groupBy("user_id")
      .agg(sum(col("psum")).cast(DoubleType).as("sum_value"),
        sum(col("pn")).as("n"))
      .orderBy("user_id")
  }

  /** Bucket-co-located join (⊘ rows-only for the physical shape; the
    * values are additionally asserted against q_join_smj's oracle twin in
    * PlanSpec): lineitem and orders are written bucketed 8-ways on the
    * join key, then joined — the plan has NO shuffle exchange on either
    * side. At 100 TB this is how a recurring fact-fact join amortizes its
    * shuffle: pay it once at write time.
    */
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    // auto bucketed scans would un-bucket the small sf inputs; disable for
    // THIS query only — the session is shared across the whole Bench/
    // Verify run, so the prior value must be restored or every later
    // query plans with bucketed scans disabled
    val confKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prior = s.conf.getOption(confKey)
    s.conf.set(confKey, "false")
    try {
      val df = bucketedJoinBody(s, dir)
      // force physical planning NOW, while the conf is in effect: the
      // QueryExecution caches executedPlan, so a later collect() on this
      // DataFrame keeps the exchange-free bucketed shape even after the
      // conf is restored (results are conf-independent either way)
      df.queryExecution.executedPlan
      df
    } finally prior match {
      case Some(v) => s.conf.set(confKey, v)
      case None => s.conf.unset(confKey)
    }
  }

  private def bucketedJoinBody(s: SparkSession, dir: String): DataFrame = {
    val db = "graft_buckets"
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // table names carry the source dir: the cached bucketed tables must
    // never be served for a DIFFERENT scale factor than the one asked for
    val dirTag = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir).toLong & 0xffffffffL)
    def ensure(base: String, df: DataFrame, key: String): Unit = {
      val name = s"${base}_$dirTag"
      if (!s.catalog.tableExists(s"$db.$name")) {
        // the in-memory catalog resets per JVM but spark-warehouse persists;
        // clear any stale location or the CTAS refuses to write
        val loc = new org.apache.hadoop.fs.Path(
          s"${s.conf.get("spark.sql.warehouse.dir")}/$db.db/$name")
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        df.write.bucketBy(8, key).sortBy(key)
          .mode("overwrite").format("parquet").saveAsTable(s"$db.$name")
      }
    }
    ensure("li_b", Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    ensure("o_b", Tables.orders(s, dir)
      .select("o_orderkey", "o_orderpriority"), "o_orderkey")
    // pin SMJ (at sf0.001 AQE would broadcast instead); bucketing makes the
    // "shuffle" merge join exchange-free on both inputs
    s.table(s"$db.li_b_$dirTag").hint("merge")
      .join(s.table(s"$db.o_b_$dirTag").hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(cnt.as("n"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_salted" -> (skewSalted _),
    "q_bucketed_join" -> (bucketedJoin _)
  )

  val oracleSql: Map[String, String] = Map(
    "q_skew_salted" ->
      ("WITH skewed AS (SELECT user_id, value FROM events " +
        "UNION ALL SELECT 0 AS user_id, CAST(i * 37 % 1000 AS DOUBLE) / 10.0 AS value FROM range(100000) t(i)) " +
        "SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value, " +
        "CAST(count(*) AS BIGINT) AS n FROM skewed GROUP BY user_id ORDER BY user_id"),
    "q_bucketed_join" ->
      ("SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
  )
}
