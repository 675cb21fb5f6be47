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

  test("two gateway replicas over one ledger: exact row count, agg-derived register wins") {
    // The reference scales to 1-10 replicas against one store, and its
    // read-compare-set registers race across them (SURVEY §7.4). Here
    // TWO Gateway instances share one warehouse; 4 clients fire 40
    // interleaved batches across both sockets concurrently. The claim
    // under test: the ledger is exact (per-warehouse append lock — no
    // committer clobber), and the DURABLE register — the aggregation
    // over the ledger — equals the true max no matter which replica
    // served which batch, where each replica's in-memory counter only
    // saw its own subset.
    val wh = java.nio.file.Files.createTempDirectory("graft_sock_mw").toString
    val h1 = GatewaySocket.start(new Gateway(spark, wh))
    val h2 = GatewaySocket.start(new Gateway(spark, wh))
    try {
      val bases = Seq(s"http://127.0.0.1:${h1.port}", s"http://127.0.0.1:${h2.port}")
      val t0 = 1697049600000L
      def env(id: Int): String = {
        val ts = t0 + id * 1000L
        s"""{"content":[{"timestamp":$ts,"value":1.0},{"timestamp":${ts - 5},"value":2.0}],""" +
          s""""id":"mw-$id","timeGenerated":$ts,""" +
          s""""file":"factory-mw/2023/10/26/19/b$id.parquet"}"""
      }
      val writers = 4
      val perWriter = 10
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      (0 until writers).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit =
            (0 until perWriter).foreach { i =>
              val id = w * perWriter + i
              // interleave across the two replicas
              val r = post(s"${bases(id % 2)}/", env(id))
              if (r.statusCode() != 200)
                failures.add(s"batch $id -> ${r.statusCode()}: ${r.body()}")
            }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
      assert(failures.isEmpty, failures)
      val trueMax = t0 + (writers * perWriter - 1) * 1000L
      // ledger exactness: every row of every batch landed exactly once
      val ledger = spark.read.parquet(wh)
      assert(ledger.count() === (writers * perWriter * 2).toLong)
      assert(ledger.select("id").distinct().count() === (writers * perWriter).toLong)
      // the agg-over-ledger register (q_state_registers' derivation) is
      // exact regardless of replica routing
      import org.apache.spark.sql.functions.max
      assert(ledger.agg(max("timestamp")).head().getLong(0) === trueMax)
      // each replica's in-memory view is a monotone UNDER-approximation
      // (it saw only its own batches) — their max is the true max only
      // because together they saw everything; the reference's replica
      // race is exactly trusting these counters individually
      def regMax(base: String): Long = {
        val b = get(s"$base/").body()
        """"maxTimestamp":(\d+)""".r.findFirstMatchIn(b).get.group(1).toLong
      }
      val views = bases.map(regMax)
      views.foreach(v => assert(v <= trueMax))
      assert(views.max === trueMax)
    } finally { h1.stop(); h2.stop() }
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
