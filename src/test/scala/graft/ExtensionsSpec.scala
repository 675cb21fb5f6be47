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
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
