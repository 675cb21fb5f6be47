package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The native codegen'd cosine must be bit-identical to the
  * higher-order-function formulation (same fold order), and handle the
  * null/shape edge cases.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def hofCos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("bit-identical to the HOF formulation on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorFunctions.cosine_sim(spark, $"embedding", $"qv").as("native"),
        hofCos($"embedding", $"qv").as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
    assert(both.filter($"native".isNull).count() === 0)
  }

  test("native dot_product is bit-identical to the HOF fold") {
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(
        VectorFunctions.dot_product(spark, $"embedding", $"qv").as("native"),
        hofDot($"embedding", $"qv").as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("multiple codegen'd instances coexist in one generated function") {
    // regression: the generated bodies used FIXED local names; with both
    // children non-nullable nullSafeCodeGen leaves the block unbraced, so
    // two instances in one function declared duplicate locals → Janino
    // failure → silent interpreted fallback. fallback=false turns that
    // silent degradation into a test failure.
    val key = "spark.sql.codegen.fallback"
    val prior = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      // non-nullable AND non-foldable inputs (constant folding would
      // otherwise evaluate the expression interpreted at optimize time)
      val v = array(($"id".cast("float") + lit(1f)), lit(2f))
      val w = array(lit(3f), lit(4f))
      val rows = spark.range(3).select($"id",
          VectorFunctions.dot_product(spark, v, w).as("d1"),
          VectorFunctions.dot_product(spark, w, v).as("d2"),
          VectorFunctions.cosine_sim(spark, v, w).as("c1"),
          VectorFunctions.cosine_sim(spark, w, v).as("c2"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1)
      assert(rows.nonEmpty)
      rows.foreach { case (id, d1, d2, c1, c2) =>
        val expect = (id + 1).toDouble * 3.0 + 2.0 * 4.0
        assert(d1 === expect && d2 === expect, s"id=$id dot")
        assert(c1 === c2 && c1 > 0.0 && c1 <= 1.0, s"id=$id cos")
      }
    } finally spark.conf.set(key, prior)
  }

  test("null and shape edge cases") {
    val df = Seq(
      (1L, Some(Array(1f, 0f)), Some(Array(1f, 0f))),   // identical → 1.0
      (2L, Some(Array(1f, 0f)), Some(Array(0f, 1f))),   // orthogonal → 0.0
      (3L, Some(Array(1f, 0f)), Some(Array(1f, 0f, 1f))), // shape mismatch → null
      (4L, None, Some(Array(1f, 0f))),                  // null input → null
      (5L, Some(Array(0f, 0f)), Some(Array(1f, 0f)))    // zero norm → null
    ).toDF("id", "a", "b")
    val got = df.select($"id",
        VectorFunctions.cosine_sim(spark, $"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(1.0))
    assert(got(2L) === Some(0.0))
    assert(got(3L) === None)
    assert(got(4L) === None)
    assert(got(5L) === None)
  }

  test("works through SQL registration") {
    VectorFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_cos_spec")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_cos_spec LIMIT 5")
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(0) - 1.0) < 1e-12))
  }
}
