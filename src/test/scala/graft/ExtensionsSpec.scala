package graft

import org.apache.spark.sql.SparkSession

/** The SparkSessionExtensions entry point must make `cosine_sim`
  * resolvable from pure SQL in a session built with it — the deployment
  * path (`spark.sql.extensions=graft.GraftExtensions`).
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects cosine_sim into a fresh session") {
    spark // materialize the shared session (and its SparkContext) first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // reuses the existing SparkContext; extensions apply because this
      // builds a genuinely new session
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .master("local[4]")
        .getOrCreate()
      val v = s2.sql(
        """SELECT cosine_sim(
          |  array(cast(1.0 as float), cast(0.0 as float)),
          |  array(cast(1.0 as float), cast(0.0 as float))) AS c""".stripMargin)
        .head.getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      // orthogonal vectors → 0
      val z = s2.sql(
        """SELECT cosine_sim(
          |  array(cast(1.0 as float), cast(0.0 as float)),
          |  array(cast(0.0 as float), cast(1.0 as float))) AS c""".stripMargin)
        .head.getDouble(0)
      assert(z === 0.0)

      // the as-of join plans through the injected strategy from pure SQL:
      // the marker Join stays intact through ALL optimizer batches (no
      // mid-optimization rewrite) and extraction happens at planning
      val asof = s2.sql(
        """SELECT l.id, r.v FROM
          |  (SELECT * FROM VALUES (1L, 10L), (1L, 20L), (2L, 10L) AS t(id, t)) l
          |JOIN
          |  (SELECT * FROM VALUES (1L, 5L, 'a'), (1L, 15L, 'b'), (3L, 1L, 'c') AS u(id, t, v)) r
          |ON l.id = r.id AND asof_le(l.t, r.t)""".stripMargin)
      val plan = asof.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan.take(600))
      val rows = asof.collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(rows.toSeq === Seq((1L, "a"), (1L, "b"))) // t=10→a(5), t=20→b(15)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("filters below an as-of input still push into the parquet scan") {
    // regression for the extensions-path plan defect: injecting
    // RewriteAsOfJoin as an optimizer rule materialized the opaque
    // AsOfJoin node MID-optimization, freezing filter pushdown / column
    // pruning beneath it in every extensions-built session. The strategy
    // now extracts the intact marker Join at planning time, so pushdown
    // must reach both scans.
    import org.apache.spark.sql.functions._
    spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .master("local[4]")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      val ev = Tables.events(s2, sfDir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
      val df = purchases.join(clicks,
        col("user_id") === col("c_user") && expr("asof_le(ts_us, c_ts)"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"), plan.take(800))
      assert(plan.contains("EqualTo(event_type,purchase)"),
        s"filter below the as-of join was not pushed to the scan:\n${plan.take(1500)}")
      assert(plan.contains("EqualTo(event_type,click)"), plan.take(1500))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
