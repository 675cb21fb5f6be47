package graft

import graft.ingest.{Gateway, GatewaySocket}
import graft.ops.IngestOps

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** End-to-end replay of the reference's shipped HTTP cases
  * (reference tests/test.http:1-89) over a REAL TCP port: the 401 key
  * gate, 400 validation, 200 ingest echo with register side effects,
  * GET / register read, POST /query in both dialects (ADX CSL envelope
  * and native SQL), and 404. Everything the transport-free GatewaySpec
  * pins is re-exercised here through an actual socket, so the one
  * previously-unreproduced reference capability — being a network
  * service — is now executable.
  */
class GatewaySocketSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  private def get(url: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(url: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(url))
      .header("content-type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def withServer(apiKey: Option[String] = None)(
      f: (String, String) => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft_sock").toString
    val handle = GatewaySocket.start(new Gateway(spark, wh, apiKey = apiKey))
    try f(s"http://127.0.0.1:${handle.port}", wh)
    finally {
      handle.stop()
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("ingest + register cycle over a real socket (test.http happy path)") {
    withServer() { (base, wh) =>
      // registers start empty (GET /?key=123 shape, test.http:70)
      val r0 = get(s"$base/")
      assert(r0.statusCode() === 200)
      assert(r0.body() === """{"lastTimeGenerated":0,"maxTimestamp":0}""")
      assert(r0.headers().firstValue("Content-Type").orElse("") ===
        "application/json")

      // full-fields envelope (test.http:1-40 analog, deterministic fixture)
      val r1 = post(s"$base/", IngestOps.fixtures(0)._2)
      assert(r1.statusCode() === 200)
      assert(r1.body() ===
        """{"id":"batch-1","timeGenerated":1697049600000,"maxTimestamp":1697049601000}""")

      // minimal-fields envelope (test.http:76-85: only timestamp+value;
      // missing fields take Go zero values, not NULL)
      val minimal = """{"content":[{"timestamp":1697049700000,"value":7.0}],""" +
        """"id":"min-1","timeGenerated":1697049700000,""" +
        """"file":"factory-9/2023/10/11/19/m.parquet"}"""
      assert(post(s"$base/", minimal).statusCode() === 200)

      // registers advanced through the socket round-trips
      assert(get(s"$base/").body() ===
        """{"lastTimeGenerated":1697049700000,"maxTimestamp":1697049700000}""")

      // rows are durable in the hour-partitioned warehouse
      assert(spark.read.parquet(wh).count() === 3L)

      // validation 400 with the reference's message, over the wire
      val bad = post(s"$base/", IngestOps.fixtures(4)._2)
      assert(bad.statusCode() === 400)
      assert(bad.body() ===
        """{"error":"Malformed request: content must be non-empty"}""")

      // unknown route
      assert(get(s"$base/nope").statusCode() === 404)
    }
  }

  test("the ?key= auth gate 401s before any route, over the wire") {
    withServer(apiKey = Some("u5pvjtrozvx3c")) { (base, _) =>
      assert(get(s"$base/").statusCode() === 401)
      assert(post(s"$base/", IngestOps.fixtures(0)._2).statusCode() === 401)
      assert(get(s"$base/?key=wrong").statusCode() === 401)
      assert(get(s"$base/?key=u5pvjtrozvx3c").statusCode() === 200)
      // the key rides the query string on POST too (test.http:44)
      assert(post(s"$base/?key=u5pvjtrozvx3c",
        IngestOps.fixtures(0)._2).statusCode() === 200)
    }
  }

  test("POST /query speaks the ADX CSL envelope and native SQL over the socket") {
    withServer() { (base, _) =>
      Tables.events(spark, sfDir).orderBy("event_id").limit(42)
        .createOrReplaceTempView("OmyaData")
      // the reference's verbatim envelope (test.http:47-53)
      val csl = post(s"$base/query",
        """{
          |    "db":"adxdbhisv2",
          |    "csl":"OmyaData | take 100",
          |    "properties": {
          |        "Options":{ "queryconsistency": "strongconsistency"}
          |    }
          |}""".stripMargin)
      assert(csl.statusCode() === 200, csl.body())
      // count rows by key occurrence — the props column's embedded JSON
      // string carries literal braces, so brace-counting overcounts
      assert(csl.body().split("\"event_id\":").length - 1 === 42)

      // the new dialect breadth end-to-end: summarize over the socket
      val sm = post(s"$base/query",
        """{"csl":"OmyaData | summarize n = count() by event_type | sort by event_type asc"}""")
      assert(sm.statusCode() === 200, sm.body())
      assert(sm.body().contains(""""n":"""))

      // native SQL
      Seq((1, "a"), (2, "b")).toDF("k", "v").createOrReplaceTempView("sock_t")
      val sql = post(s"$base/query", "SELECT k, v FROM sock_t ORDER BY k")
      assert(sql.statusCode() === 200)
      assert(sql.body() === """[{"k":1,"v":"a"},{"k":2,"v":"b"}]""")

      // read-only contract holds through the socket
      val ddl = post(s"$base/query", "DROP TABLE sock_t")
      assert(ddl.statusCode() === 400)
      assert(ddl.body().contains("read-only"))
    }
  }
}
