package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Ox._

/** Time-window semantics (SURVEY.md §2 "streaming" tier), formulated over
  * the batch `events` table so the DuckDB oracle applies. The same
  * transformations run unchanged on a `readStream` DataFrame — see
  * `graft.streaming.StreamOps`, which reuses these via shared column
  * expressions; the batch formulation is the spec, the streaming one adds
  * watermarks/output-mode.
  *
  * Scale: every op here groups by (bucket[, user]) — a plain hash
  * aggregation with partial combine; no self-joins, no per-row driver
  * work. Sliding windows fan out rows ×(len/slide) before the agg, which
  * is the textbook cost and still map-side combinable.
  */
object TimeWindows {

  /** Tumbling 1-hour windows (reference A6's hourly bucketing as an
    * aggregation). Emits the bucket as epoch-seconds so both engines
    * compare integers, not timestamps.
    */
  private def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts_ts"), "1 hour").as("w"))
      .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("n"), col("sum_value"))
      .orderBy("bucket")

  /** Sliding 1-hour windows every 15 minutes: each event lands in 4
    * buckets (Expand before the agg).
    */
  private def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts_ts"), "1 hour", "15 minutes").as("w"))
      .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("w.start")).as("bucket"), col("n"), col("sum_value"))
      .orderBy("bucket")

  /** Session windows: 30-minute inactivity gap per user. Spark's
    * session_window merges events whose gap is < 30 min (end-exclusive);
    * the oracle reproduces that with the classic lag-gap-cumsum
    * sessionization. Session start is emitted in epoch-µs.
    */
  private def session(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes").as("w"))
      .agg(cnt.as("n"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Watermark semantics as a batch filter (reference A8: the
    * `maxTimestamp` register IS the watermark): keep rows within 1 hour of
    * the global max event time. The 1-row max aggregate broadcasts; the
    * fact scan streams past it with no shuffle.
    */
  private def watermarkFilter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val hw = ev.agg(max(col("ts_us")).as("hw"))
    ev.crossJoin(broadcast(hw))
      .filter(col("ts_us") >= col("hw") - lit(3600L * 1000000L))
      .select("event_id", "ts_us", "user_id")
      .orderBy("event_id")
  }

  /** Deterministic keep-first dedup (reference A5 idempotence as an
    * operator): earliest event per (user_id, event_type). Implemented as
    * row_number=1 rather than dropDuplicates, which keeps an arbitrary
    * row and would not be oracle-comparable. One shuffle on the dedup key.
    */
  private def dedupFirst(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts_us", "event_id")
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts_us")
      .orderBy("user_id", "event_type")
  }

  /** First-order Markov transition matrix over per-user event sequences —
    * the behavior-modeling / next-event-prediction primitive (and the
    * bigram statistic sequence models train on). One user-key shuffle for
    * the `lead` window ((ts_us, event_id) tie-break — same-µs events
    * would otherwise order nondeterministically), then a hash aggregate
    * whose key space is |event types|² — BOUNDED, so the row-normalizing
    * probability window runs over a tiny table regardless of corpus size
    * (the only safe kind of near-global window). Per-user partitions are
    * user-activity-bounded, the natural skew unit of event data.
    */
  private def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val c = Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(cnt.as("n"))
    c.withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy("event_type")), 6))
      .orderBy("event_type", "next_type")
  }

  /** OHLC candle rollup per (event_type, hour) — the canonical
    * time-series downsample: open/close via `min_by`/`max_by` on the raw
    * NANOSECOND timestamp (globally unique in this data; the ns order is
    * also exactly what DuckDB's arg_min/arg_max see, so the endpoints
    * are engine-identical), high/low/n as plain aggregates. One
    * map-side-combinable hash aggregate — min_by partials carry a single
    * (value, ts) pair per group per task.
    */
  private def ohlc(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        cnt.as("n"))
      .orderBy("event_type", "hour")

  /** Dense hourly grid + forward fill per event type — the gap-fill /
    * resample pass every time-series consumer needs (the reference's
    * hourly layout makes missing hours structural, not exceptional).
    * The grid is `sequence(min_hour, max_hour)` exploded from a 1-row
    * bounds aggregate (broadcast), left-joined to the hourly rollup;
    * missing hours take the last observed mean via an IGNORE-NULLS
    * last_value window. The fill window partitions per type — at scale
    * per (type, day-range) tiles with carried boundaries, same
    * two-level trick as epoch_order.
    */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .agg(cnt.as("n"), (dsum(col("value")) / count(lit(1))).as("mean_value"))
    val bounds = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(expr("min(ts_us div 3600000000)").as("h0"),
        expr("max(ts_us div 3600000000)").as("h1"))
    val grid = bounds.select(col("event_type"),
      explode(sequence(col("h0"), col("h1"))).as("hour"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("filled", last(col("mean_value"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("filled").as("mean_value"),
        col("n").isNull.as("is_gap"))
      .orderBy("event_type", "hour")
  }

  /** Linear interpolation over the same dense grid — gapFill's forward
    * carry replaced by a weighted blend of the surrounding observations:
    * interp = prev + (next − prev)·(h − h_prev)/(h_next − h_prev).
    * Four IGNORE-NULLS window scans (prev/next value and hour) over the
    * per-type hour order; grid edges fall back to the available side.
    * All arithmetic is integer-ratio × double — engine-identical.
    */
  private def interpolate(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .agg(cnt.as("n"), (dsum(col("value")) / count(lit(1))).as("mv"))
    val bounds = Tables.events(s, dir)
      .groupBy("event_type")
      .agg(expr("min(ts_us div 3600000000)").as("h0"),
        expr("max(ts_us div 3600000000)").as("h1"))
    val grid = bounds.select(col("event_type"),
      explode(sequence(col("h0"), col("h1"))).as("hour"))
    val back = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHour = when(col("mv").isNotNull, col("hour"))
    val joined = grid.join(hourly, Seq("event_type", "hour"), "left")
      .withColumn("pv", last(col("mv"), ignoreNulls = true).over(back))
      .withColumn("ph", last(obsHour, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("mv"), ignoreNulls = true).over(fwd))
      .withColumn("nh", first(obsHour, ignoreNulls = true).over(fwd))
    val blend = when(col("mv").isNotNull, col("mv"))
      .when(col("pv").isNull, col("nv"))
      .when(col("nv").isNull, col("pv"))
      .otherwise(col("pv") + (col("nv") - col("pv")) *
        ((col("hour") - col("ph")).cast("double") /
          (col("nh") - col("ph")).cast("double")))
    joined.select(col("event_type"), col("hour"),
        col("mv").isNull.as("is_gap"),
        // explicit half-up at 4 dp: round()'s tie rule differs across
        // engines on blend boundaries (same trick as embed_quantize)
        (floor(blend * 10000 + 0.5) / 10000).as("value"))
      .orderBy("event_type", "hour")
  }

  /** Replay-idempotent id dedup (reference A5 as an operator): the
    * events table unioned with itself stands in for a replayed ingest
    * batch; `dropDuplicates("event_id")` collapses it back to exactly
    * one row per id. Projected to the id so the kept-row arbitrariness
    * of dropDuplicates can't leak into the comparison — the full-row
    * deterministic variant is q_dedup_first.
    */
  private def dedupIds(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("event_id", "user_id", "ts_us")
    ev.unionByName(ev) // the replayed batch
      .dropDuplicates("event_id")
      .select("event_id")
      .orderBy("event_id")
  }

  /** Cohort retention (round 12) — the product-analytics counterpart of
    * the ADX activity plugins (q_kql_activity/q_kql_engagement): cohort
    * = an actor's first-seen day; for each (cohort, days-since-cohort)
    * cell, how many of the cohort's actors were active. The classic
    * retention triangle, emitted flat. 100 TB shape: the corpus
    * collapses once to distinct (actor, day) pairs; first-seen is a
    * map-side-combinable min over those pairs; the pairs re-join their
    * cohort ON THE SAME actor key they were just aggregated on (AQE
    * sees a co-partitioned join, no extra corpus shuffle), and the
    * final cell aggregate runs on the bounded cohort×period grid. The
    * ratio divides two exact integers, so the double is
    * engine-identical.
    */
  private def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), (col("ts_us") - pmod(col("ts_us"), lit(dayUs))).as("day_us"))
      .distinct()
    val cohorts = pairs.groupBy("user_id")
      .agg(min(col("day_us")).as("cohort_us"))
    val sizes = cohorts.groupBy("cohort_us").agg(cnt.as("cohort_size"))
    pairs.join(cohorts, "user_id")
      .groupBy(col("cohort_us"),
        ((col("day_us") - col("cohort_us")) / lit(dayUs)).cast("long").as("period"))
      .agg(cnt.as("retained"))
      .join(sizes, "cohort_us")
      .select(col("cohort_us"), col("period"), col("retained"), col("cohort_size"),
        (col("retained").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
      .orderBy("cohort_us", "period")
  }

  /** Ordered funnel (round 12): view → click → purchase per actor, each
    * step's timestamp strictly after the previous step's FIRST
    * occurrence (the standard conditional-min chain — an actor who
    * clicked before ever viewing does not convert). Emits per-step
    * reached counts and step-to-step conversion. 100 TB shape: each
    * step is a pushed-down type filter + a hash aggregate, and the
    * chain joins stay on the actor key throughout — three co-keyed
    * shuffles, no window over the corpus, no all-pairs. The final
    * 3-row summary folds from the three bounded aggregates.
    */
  private def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts_us")
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, "user_id").filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min(col("ts_us")).as("t3"))
    def step(idx: Int, name: String, d: DataFrame) =
      d.agg(cnt.as("n_users"))
        .select(lit(idx).as("step"), lit(name).as("stage"), col("n_users"))
    step(1, "view", s1)
      .unionByName(step(2, "click", s2))
      .unionByName(step(3, "purchase", s3))
      .withColumn("conversion", {
        // guard the lag: a 0-completer stage would divide 0.0/0.0 into
        // NaN on Spark while DuckDB's ÷0 behavior differs by version —
        // the activity_ratio pattern (0.0 on an empty denominator),
        // mirrored as CASE in the oracle
        val prev = coalesce(
          lag(col("n_users"), 1).over(Window.orderBy("step")),
          col("n_users"))
        when(prev > 0,
          col("n_users").cast("double") / prev.cast("double"))
          .otherwise(lit(0.0))
      })
      .orderBy("step")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_retention_cohorts" -> (retentionCohorts _),
    "q_funnel_steps" -> (funnelSteps _),
    "q_dedup_ids" -> (dedupIds _),
    "q_interpolate" -> (interpolate _),
    "q_ohlc" -> (ohlc _),
    "q_gap_fill" -> (gapFill _),
    "q_tumbling_window" -> (tumbling _),
    "q_sliding_window" -> (sliding _),
    "q_session_window" -> (session _),
    "q_watermark_filter" -> (watermarkFilter _),
    "q_dedup_first" -> (dedupFirst _),
    "q_event_transitions" -> (eventTransitions _)
  )

  val oracleSql: Map[String, String] = Map(
    // retention/funnel: ts_us ≡ epoch_us(ts) (the standing q_agg_max
    // equivalence); day bins are UTC-midnight anchored µs; every ratio
    // divides exact integers so the doubles are engine-identical
    "q_retention_cohorts" ->
      ("WITH pairs AS (SELECT DISTINCT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) - (CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) % 86400000000) AS day_us FROM events), " +
        "coh AS (SELECT user_id, min(day_us) AS cohort_us FROM pairs GROUP BY user_id), " +
        "sz AS (SELECT cohort_us, CAST(count(*) AS BIGINT) AS cohort_size FROM coh GROUP BY cohort_us), " +
        "cells AS (SELECT c.cohort_us AS cohort_us, CAST((p.day_us - c.cohort_us) / 86400000000 AS BIGINT) AS period, CAST(count(*) AS BIGINT) AS retained " +
        "FROM pairs p JOIN coh c ON p.user_id = c.user_id GROUP BY 1, 2) " +
        "SELECT cells.cohort_us, period, retained, cohort_size, " +
        "CAST(retained AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention " +
        "FROM cells JOIN sz ON cells.cohort_us = sz.cohort_us ORDER BY cells.cohort_us, period"),
    "q_funnel_steps" ->
      ("WITH s1 AS (SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id), " +
        "s2 AS (SELECT e.user_id AS user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t2 FROM events e JOIN s1 ON e.user_id = s1.user_id " +
        "WHERE e.event_type = 'click' AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s1.t1 GROUP BY e.user_id), " +
        "s3 AS (SELECT e.user_id AS user_id, min(epoch_us(CAST(e.ts AS TIMESTAMP))) AS t3 FROM events e JOIN s2 ON e.user_id = s2.user_id " +
        "WHERE e.event_type = 'purchase' AND epoch_us(CAST(e.ts AS TIMESTAMP)) > s2.t2 GROUP BY e.user_id), " +
        "steps AS (SELECT CAST(1 AS INT) AS step, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1 " +
        "UNION ALL SELECT CAST(2 AS INT), 'click', CAST(count(*) AS BIGINT) FROM s2 " +
        "UNION ALL SELECT CAST(3 AS INT), 'purchase', CAST(count(*) AS BIGINT) FROM s3) " +
        "SELECT step, stage, n_users, CASE WHEN COALESCE(lag(n_users) OVER (ORDER BY step), n_users) > 0 " +
        "THEN CAST(n_users AS DOUBLE) / CAST(COALESCE(lag(n_users) OVER (ORDER BY step), n_users) AS DOUBLE) ELSE 0.0 END AS conversion " +
        "FROM steps ORDER BY step"),
    "q_dedup_ids" ->
      ("SELECT DISTINCT event_id FROM (SELECT event_id FROM events UNION ALL SELECT event_id FROM events) " +
        "ORDER BY event_id"),
    "q_interpolate" ->
      ("WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mv " +
        "FROM events GROUP BY event_type, hour), " +
        "bounds AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY event_type), " +
        "grid AS (SELECT event_type, h0 + g.i AS hour FROM bounds CROSS JOIN range(0, 100000) g(i) WHERE h0 + g.i <= h1), " +
        "j AS (SELECT grid.event_type, grid.hour, hourly.mv, " +
        "CASE WHEN hourly.mv IS NOT NULL THEN grid.hour END AS oh " +
        "FROM grid LEFT JOIN hourly ON grid.event_type = hourly.event_type AND grid.hour = hourly.hour), " +
        "w AS (SELECT event_type, hour, mv, " +
        "last_value(mv IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv, " +
        "last_value(oh IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph, " +
        "first_value(mv IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv, " +
        "first_value(oh IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh " +
        "FROM j) " +
        "SELECT event_type, hour, mv IS NULL AS is_gap, " +
        "floor((CASE WHEN mv IS NOT NULL THEN mv WHEN pv IS NULL THEN nv WHEN nv IS NULL THEN pv " +
        "ELSE pv + (nv - pv) * (CAST(hour - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE)) END) * 10000 + 0.5) / 10000 AS value " +
        "FROM w ORDER BY event_type, hour"),
    "q_ohlc" ->
      ("SELECT event_type, epoch_us(ts) // 3600000000 AS hour, " +
        "arg_min(value, ts) AS open, max(value) AS high, min(value) AS low, " +
        "arg_max(value, ts) AS close, CAST(count(*) AS BIGINT) AS n " +
        "FROM events GROUP BY event_type, hour ORDER BY event_type, hour"),
    "q_gap_fill" ->
      ("WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean_value " +
        "FROM events GROUP BY event_type, hour), " +
        "bounds AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY event_type), " +
        "grid AS (SELECT event_type, h0 + g.i AS hour FROM bounds CROSS JOIN range(0, 100000) g(i) WHERE h0 + g.i <= h1) " +
        "SELECT grid.event_type, grid.hour, coalesce(hourly.n, 0) AS n, " +
        "last_value(hourly.mean_value IGNORE NULLS) OVER (PARTITION BY grid.event_type ORDER BY grid.hour " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean_value, " +
        "hourly.n IS NULL AS is_gap " +
        "FROM grid LEFT JOIN hourly ON grid.event_type = hourly.event_type AND grid.hour = hourly.hour " +
        "ORDER BY grid.event_type, grid.hour"),
    "q_tumbling_window" ->
      ("SELECT (epoch_us(ts) // 3600000000) * 3600 AS bucket, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY bucket ORDER BY bucket"),
    "q_sliding_window" ->
      ("SELECT ((epoch_us(ts) // 900000000) - k.k) * 900 AS bucket, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS k(k) " +
        "GROUP BY bucket ORDER BY bucket"),
    "q_session_window" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events), " +
        "g AS (SELECT *, CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL " +
        "OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), " +
        "x AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid FROM g) " +
        "SELECT user_id, CAST(min(t) AS BIGINT) AS session_start, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value " +
        "FROM x GROUP BY user_id, sid ORDER BY user_id, session_start"),
    "q_watermark_filter" ->
      ("SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, user_id FROM events " +
        "WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) FROM events) - 3600000000 " +
        "ORDER BY event_id"),
    "q_dedup_first" ->
      ("SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn FROM events) " +
        "WHERE rn = 1 ORDER BY user_id, event_type"),
    "q_event_transitions" ->
      ("WITH s AS (SELECT event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type FROM events), " +
        "c AS (SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n FROM s " +
        "WHERE next_type IS NOT NULL GROUP BY event_type, next_type) " +
        "SELECT event_type, next_type, n, " +
        "round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY event_type), 6) AS p " +
        "FROM c ORDER BY event_type, next_type")
  )
}
