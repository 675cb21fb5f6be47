package graft

import org.apache.spark.sql.functions._
import graft.ingest.Ingest

/** A registrable non-default Hadoop FileSystem (`graftfs://`) backed by
  * local disk: proves the ingest sink composes with an alternate scheme
  * purely through `fs.<scheme>.impl` configuration — the same seam an
  * `abfss://`/`s3a://` deployment uses. The create counter witnesses
  * that writes really routed through THIS implementation.
  */
class GraftTestFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
  override def initialize(uri: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): Unit = {
    GraftTestFileSystem.initialized.incrementAndGet()
    super.initialize(uri, conf)
  }
}
object GraftTestFileSystem {
  val initialized = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Reference ingest semantics (SURVEY.md §5.2 items 1/3/4): validation,
  * zero-value coalesce, partitioned-sink round-trip, overwrite
  * idempotence, state registers.
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parsed =
    Ingest.parseEnvelopes(ops.IngestOps.fixtures.toDF("idx", "json"))

  test("validation accepts/rejects per the reference contract") {
    val got = parsed.select("idx", "_valid", "_reject_reason")
      .orderBy("idx").collect()
      .map(r => (r.getInt(0), r.getBoolean(1), Option(r.getString(2)).getOrElse("")))
    assert(got.toSeq === Seq(
      (1, true, ""),
      (2, true, ""),
      (3, false, "file is required"),
      (4, false, "timeGenerated is required"),
      (5, false, "content must be non-empty")))
  }

  test("malformed JSON envelopes reject instead of crashing the pipeline") {
    val raw = Seq(
      (1, """{"broken json"""),                       // unparseable
      (2, """[1, 2, 3]"""),                           // wrong shape
      (3, """"just a string""""),                     // scalar
      (4, """{"content":[{"timestamp":1,"value":2.0}],"id":"ok","timeGenerated":5,"file":"s/x.parquet"}""")
    ).toDF("idx", "json")
    val parsed = Ingest.parseEnvelopes(raw)
    assert(parsed.count() === 4) // nothing thrown, nothing dropped silently
    val valid = parsed.filter(col("_valid")).select("idx").as[Int].collect().toSeq
    assert(valid === Seq(4))
    val reasons = parsed.filter(!col("_valid"))
      .select("_reject_reason").as[String].collect()
    assert(reasons.forall(_.nonEmpty))
  }

  test("missing JSON fields coalesce to Go zero values, not NULL") {
    val rows = Ingest.explodeContent(parsed)
      .filter($"id" === "batch-2").orderBy("timestamp").collect()
    assert(rows.length === 2)
    val r = rows(0)
    assert(r.getAs[String]("pointId") === "")
    assert(r.getAs[Long]("sequence") === 0L)
    assert(r.getAs[String]("project") === "")
    assert(r.getAs[Long]("quality") === 0L)
    assert(r.getAs[Double]("value") === 5.5)
  }

  test("partitioned sink round-trips and overwrite is idempotent") {
    val out = java.nio.file.Files.createTempDirectory("graft_ingest_spec").toString
    val batch = Ingest.withPartitionColumns(
      Ingest.syntheticBatch(spark, 5000), lit("factory-1"), col("timestamp"))
    Ingest.writeBatch(batch, out)
    val once = spark.read.parquet(out)
    assert(once.count() === 5000)
    // partition columns materialized in the layout
    assert(once.columns.toSet.intersect(Set("source", "year", "month", "day", "hour")).size === 5)
    // same batch re-written to the same path ⇒ overwritten, not appended
    // (re-read from scratch: the old DataFrame's file listing is stale)
    Ingest.writeBatch(batch, out)
    val again = spark.read.parquet(out)
    assert(again.count() === 5000)
    // data equality mod ordering
    val a = again.select("timestamp", "pointId", "value")
    val b = batch.select("timestamp", "pointId", "value")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sink accepts Hadoop-FS URIs (file://) — the remote-FS A17 path") {
    // the sink is scheme-agnostic: an explicit file:// URI exercises the
    // same Hadoop-FS resolution an abfss:///s3a:// path goes through,
    // and the options pass-through carries per-write FS/parquet confs
    val dir = java.nio.file.Files.createTempDirectory("graft_uri_spec")
    val uri = dir.toUri.toString // file:///...
    assert(uri.startsWith("file://"))
    val batch = Ingest.withPartitionColumns(
      Ingest.syntheticBatch(spark, 1000), lit("factory-1"), col("timestamp"))
    Ingest.writeBatch(batch, uri, options = Map("parquet.page.size" -> "1048576"))
    assert(spark.read.parquet(uri).count() === 1000)
  }

  test("sink round-trips through a NON-default FileSystem scheme with codec intact (A17)") {
    import scala.jdk.CollectionConverters._
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_a17")
    val uri = "graftfs://" + dir.toString
    val batch = Ingest.withPartitionColumns(
      Ingest.syntheticBatch(spark, 1000), lit("factory-1"), col("timestamp"))
    Ingest.writeBatch(batch, uri)
    // scheme resolution is the routing proof: graftfs:// is only
    // resolvable through this impl (otherwise "No FileSystem for scheme"),
    // and the initialize counter witnesses the instance came up
    assert(GraftTestFileSystem.initialized.get() > 0,
      "write never routed through the graftfs:// implementation")
    // read back through the same alternate scheme
    val back = spark.read.parquet(uri)
    assert(back.count() === 1000)
    assert(back.columns.toSet.intersect(
      Set("source", "year", "month", "day", "hour")).size === 5)
    // the sink's parquet options survived the scheme indirection: check
    // the actual footer of a data file (local disk backs graftfs://)
    val pf = java.nio.file.Files.walk(dir).iterator().asScala
      .find(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("_")).get
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.toUri),
        spark.sparkContext.hadoopConfiguration))
    try {
      val codecs = reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala).map(_.getCodec.toString).toSet
      assert(codecs === Set("SNAPPY"), s"codec lost through graftfs://: $codecs")
    } finally reader.close()
  }

  test("TTL registers: expired ledger rows are invisible, all-expired reads zero (A12)") {
    // edge = newest timeGenerated (9000); ttl 5000 ⇒ rows with
    // timeGenerated > 4000 are live. The expired row holds the GLOBAL max
    // timestamp, so a wrong implementation that filters after aggregating
    // (or not at all) reports 999 instead of 300.
    val ledger = Seq((999L, 1000L, 1L), (200L, 5000L, 2L), (300L, 9000L, 3L))
      .toDF("timestamp", "timeGenerated", "arrivalSeq")
    val r = Ingest.stateRegistersWithTtl(ledger, 5000L).collect()(0)
    assert(r.getAs[Long]("maxTimestamp") === 300L)
    assert(r.getAs[Long]("lastTimeGenerated") === 9000L)
    // ttl 0: everything written strictly before the edge has expired
    val r0 = Ingest.stateRegistersWithTtl(ledger, 0L).collect()(0)
    assert(r0.getAs[Long]("maxTimestamp") === 0L)
    assert(r0.getAs[Long]("lastTimeGenerated") === 0L)
    // empty ledger: same zero contract as the base registers
    val empty = spark.emptyDataset[(Long, Long, Long)]
      .toDF("timestamp", "timeGenerated", "arrivalSeq")
    val re = Ingest.stateRegistersWithTtl(empty, 5000L).collect()(0)
    assert(re.getAs[Long]("maxTimestamp") === 0L)
  }

  test("compaction collapses per-batch small files without changing the data") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    // 6 small batches appended into the same hour layout — the
    // reference's one-file-per-POST behavior
    (0 until 6).foreach { i =>
      Ingest.withPartitionColumns(
          Ingest.syntheticBatch(spark, 500, seed = i.toLong),
          lit("factory-1"), col("timestamp"))
        .write.mode("append")
        .partitionBy("source", "year", "month", "day", "hour")
        .parquet(out)
    }
    def dataFiles = {
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles).toSeq.flatten
          .flatMap(f => if (f.isDirectory) walk(f) else Seq(f))
      walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
    }
    val before = spark.read.parquet(out)
      .select("timestamp", "pointId", "value").collect().sortBy(_.toString)
    val filesBefore = dataFiles.size
    val nDirs = dataFiles.map(_.getParent).distinct.size
    assert(filesBefore >= nDirs * 6) // 6 files per hour dir pre-compaction

    val n = Ingest.compactPartitions(spark, out, lit(true))
    assert(n === 6 * 500)
    assert(dataFiles.size === nDirs) // exactly 1 file per hour dir
    val after = spark.read.parquet(out)
      .select("timestamp", "pointId", "value").collect().sortBy(_.toString)
    assert(after.toSeq === before.toSeq)
    // idempotent: compacting again changes nothing
    Ingest.compactPartitions(spark, out, lit(true))
    assert(dataFiles.size === nDirs)
  }

  test("synthetic batch generator is deterministic") {
    val a = Ingest.syntheticBatch(spark, 100).collect()
    val b = Ingest.syntheticBatch(spark, 100).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("state registers: empty ledger reads as zero (reference GET / on fresh store)") {
    val empty = spark.emptyDataset[(Long, Long, Long)]
      .toDF("timestamp", "timeGenerated", "arrivalSeq")
    val r = Ingest.stateRegisters(empty).collect()(0)
    assert(r.getAs[Long]("maxTimestamp") === 0L)
    assert(r.getAs[Long]("lastTimeGenerated") === 0L)
  }

  test("state registers: maxTimestamp is running max, lastTimeGenerated is last-writer-wins") {
    val ledger = Seq(
      (100L, 1L, 1L), (500L, 2L, 2L), (300L, 3L, 3L) // late batch arrives last
    ).toDF("timestamp", "timeGenerated", "arrivalSeq")
    val r = Ingest.stateRegisters(ledger).collect()(0)
    assert(r.getAs[Long]("maxTimestamp") === 500L)     // monotonic high-water mark
    assert(r.getAs[Long]("lastTimeGenerated") === 3L)  // by arrival, not by time
  }

  test("every format in the matrix round-trips the same content") {
    val rows = q("q_format_matrix")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted === Seq("csv", "json", "orc", "parquet"))
    // identical row counts, char totals, and content checksums across formats
    assert(rows.map(_._2).distinct.size === 1, "row counts diverge")
    assert(rows.map(_._3).distinct.size === 1, "char totals diverge")
    assert(rows.map(_._4).distinct.size === 1, "content checksums diverge")
    assert(rows.head._2 === Tables.documents(spark, sfDir).count())
  }
}
