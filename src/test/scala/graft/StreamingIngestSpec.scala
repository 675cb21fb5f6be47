package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
import graft.ops.IngestOps

/** End-to-end streaming ingest: the reference's POST / loop (JSON
  * envelopes → validate → explode → hour-partitioned parquet) run as a
  * Structured Streaming job over a file source, including the reject
  * side-output, incremental micro-batches, and restart idempotence via
  * the checkpoint + sink commit log.
  */
class StreamingIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming ingest: envelopes flow to the partitioned sink, rejects to the side-output") {
    val in = tmp("graft_sin"); val out = tmp("graft_sout")
    val rej = tmp("graft_srej"); val cp = tmp("graft_scp")

    // batch 1: the shared envelope fixtures (2 valid envelopes → 4 rows,
    // 3 invalid)
    Files.write(Paths.get(in, "b1.json"),
      IngestOps.fixtures.map(_._2).mkString("\n").getBytes)
    val q1 = StreamOps.ingestStream(spark, in, out, s"$cp/main")
    val q2 = StreamOps.ingestRejects(spark, in, rej, s"$cp/rej")
    q1.processAllAvailable(); q2.processAllAvailable()

    val written = spark.read.parquet(out)
    assert(written.count() === 4)
    // caller path prefix became the source partition; hour derives from
    // timeGenerated (1697049600000 ms = 2023-10-11T18:40 UTC)
    assert(written.select("source").distinct().as[String].collect().toSeq === Seq("factory-1"))
    assert(Files.exists(Paths.get(out, "source=factory-1/year=2023/month=10/day=11/hour=18")))
    // zero-value semantics survive the stream (fixture 2 has minimal fields)
    val minimal = written.filter($"id" === "batch-2")
    assert(minimal.count() === 2)
    assert(minimal.select("pointId").distinct().as[String].collect().toSeq === Seq(""))
    assert(minimal.select("quality").distinct().as[Long].collect().toSeq === Seq(0L))

    val rejects = spark.read.parquet(rej)
    assert(rejects.count() === 3)
    assert(rejects.select("reject_reason").as[String].collect().toSet ===
      Set("file is required", "timeGenerated is required", "content must be non-empty"))

    // batch 2: a new file arrives; only it is processed (no re-ingest of b1)
    Files.write(Paths.get(in, "b2.json"),
      """{"content":[{"timestamp":1697139000000,"value":9.9}],"id":"batch-6","timeGenerated":1697139000000,"file":"factory-2/2023/10/12/17/e.parquet"}""".getBytes)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    val after = spark.read.parquet(out)
    assert(after.count() === 5)
    assert(after.filter($"source" === "factory-2").count() === 1)
    assert(spark.read.parquet(rej).count() === 3)

    // restart from the same checkpoint with no new data: the commit log
    // makes replay a no-op — row count is unchanged (A5 idempotence)
    val q3 = StreamOps.ingestStream(spark, in, out, s"$cp/main")
    q3.processAllAvailable(); q3.stop()
    assert(spark.read.parquet(out).count() === 5)

    // state registers over the sink ledger match the ingested envelopes
    val regs = graft.ingest.Ingest.stateRegisters(
      spark.read.parquet(out)
        .withColumn("arrivalSeq", col("timestamp")))
      .collect().head
    assert(regs.getLong(0) === 1697139000000L) // maxTimestamp high-water mark
    assert(regs.getLong(1) === 1697139000000L) // lastTimeGenerated
  }
}
