package graft

import org.apache.spark.sql.functions._
import graft.plans.Asof

/** Native as-of join: semantics against a naive all-pairs formulation,
  * plan shape (AsOfJoinExec with sorted, co-partitioned inputs), and
  * determinism of the tie-break contract.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def purchases = Tables.events(spark, sfDir)
    .filter($"event_type" === "purchase")
    .select($"event_id", $"user_id", $"ts_us")

  private def clicks = Tables.events(spark, sfDir)
    .filter($"event_type" === "click")
    .groupBy($"user_id".as("c_user"), $"ts_us".as("c_ts"))
    .agg(max($"event_id").as("click_id"))

  private def nativeResult = {
    Asof.ensureInstalled(spark)
    purchases
      .join(clicks, $"user_id" === $"c_user" && Asof.asof_le($"ts_us", $"c_ts"))
      .select($"event_id", $"click_id", $"c_ts")
  }

  test("as-of join matches the naive latest-prior formulation") {
    // naive: all qualifying pairs, keep the max c_ts per purchase (and the
    // deduped click_id at that ts)
    val naive = purchases.as("p")
      .join(clicks, $"user_id" === $"c_user" && $"c_ts" <= $"ts_us")
      .groupBy($"event_id")
      .agg(max_by($"click_id", $"c_ts").as("click_id"), max($"c_ts").as("c_ts"))
    val got = nativeResult.as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = naive.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    assert(got === expect)
  }

  test("forward as-of (negated axes) matches the naive earliest-after formulation") {
    Asof.ensureInstalled(spark)
    val fwd = purchases
      .join(clicks, $"user_id" === $"c_user" && Asof.asof_le(-$"ts_us", -$"c_ts"))
      .select($"event_id", $"click_id", $"c_ts")
    // naive: all qualifying following pairs, keep the MIN c_ts per purchase
    val naive = purchases.as("p")
      .join(clicks, $"user_id" === $"c_user" && $"c_ts" >= $"ts_us")
      .groupBy($"event_id")
      .agg(min_by($"click_id", $"c_ts").as("click_id"), min($"c_ts").as("c_ts"))
    val got = fwd.as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = naive.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    assert(got === expect)
    // the negation composes through the SAME native exec
    val plan = fwd.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(600))
  }

  test("purchases with no prior click are dropped (inner as-of)") {
    val matched = nativeResult.select("event_id").as[Long].collect().toSet
    val all = purchases.select("event_id").as[Long].collect().toSet
    // the corpus has early purchases before any click for some users
    assert(matched.subsetOf(all))
    val naiveMatched = purchases
      .join(clicks, $"user_id" === $"c_user" && $"c_ts" <= $"ts_us", "left_semi")
      .select("event_id").as[Long].collect().toSet
    assert(matched === naiveMatched)
  }

  test("left-outer as-of keeps unmatched purchases with null click columns") {
    Asof.ensureInstalled(spark)
    val outer = purchases
      .join(clicks, $"user_id" === $"c_user" && Asof.asof_le($"ts_us", $"c_ts"),
        "left_outer")
      .select($"event_id", $"click_id", $"c_ts")
      .collect()
    val inner = nativeResult.collect()
    assert(outer.length === purchases.count())
    val matched = outer.filter(!_.isNullAt(1))
    assert(matched.map(_.toString).sorted.toSeq === inner.map(_.toString).sorted.toSeq)
    val unmatched = outer.filter(_.isNullAt(1))
    assert(unmatched.nonEmpty && unmatched.forall(_.isNullAt(2)))
  }

  test("left-outer null-pads correctly even with a NON-nullable right side") {
    // regression: the result projection must bind against the
    // nullability-ADJUSTED output attributes — bound against the raw
    // right output (non-nullable here, from spark.range), the unmatched
    // null-pad row was read without a null check → 0/garbage/NPE
    Asof.ensureInstalled(spark)
    val left = Seq((1L, 100L), (9L, 100L)).toDF("k", "t")
    val right = spark.range(5).select($"id".as("rk"),
      ($"id" * 10).as("rt"), ($"id" + 1000).as("payload"))
    assert(right.schema.forall(!_.nullable), "fixture must be non-nullable")
    val out = left
      .join(right, $"k" === $"rk" && Asof.asof_le($"t", $"rt"), "left_outer")
      .select($"k", $"payload")
    assert(out.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val m = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(m(1L) === Some(1001L)) // latest rt <= 100 for rk=1 is rt=10
    assert(m(9L) === None) // unmatched: NULL, never a zero-filled pad
  }

  test("tolerance bounds the look-back window like merge_asof(tolerance=...)") {
    Asof.ensureInstalled(spark)
    val tolUs = 3600L * 1000000L // 1 hour
    val got = purchases
      .join(clicks, $"user_id" === $"c_user" &&
        Asof.asof_le($"ts_us", $"c_ts", tolUs))
      .select($"event_id", $"click_id", $"c_ts")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // naive twin: latest click in [ts - tol, ts]
    val expect = purchases.as("p")
      .join(clicks, $"user_id" === $"c_user" &&
        $"c_ts" <= $"ts_us" && $"c_ts" >= $"ts_us" - tolUs)
      .groupBy($"event_id")
      .agg(max_by($"click_id", $"c_ts").as("click_id"), max($"c_ts").as("c_ts"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty && got === expect)
    // the bound genuinely bites: strictly fewer matches than unbounded
    assert(got.length < nativeResult.count())
  }

  test("plan is AsOfJoinExec over sorted co-partitioned inputs, no blowup join") {
    val df = nativeResult
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(800)) // nodeName strips "Exec"
    // the rewrite consumed the marker — no fallback join remains
    assert(!plan.contains("asof_le"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop"),
      plan.take(800))
  }

  test("unevaluable marker fails loudly when the rewrite is not installed") {
    // a session flavor without the rule: strip experimental additions
    val exps = spark.experimental
    val savedOpt = exps.extraOptimizations
    val savedStrat = exps.extraStrategies
    exps.extraOptimizations = Nil
    exps.extraStrategies = Nil
    try {
      val err = intercept[Exception] {
        purchases
          .join(clicks, $"user_id" === $"c_user" && Asof.asof_le($"ts_us", $"c_ts"))
          .collect()
      }
      assert(err != null)
    } finally {
      exps.extraOptimizations = savedOpt
      exps.extraStrategies = savedStrat
    }
  }
}
