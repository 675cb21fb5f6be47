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
