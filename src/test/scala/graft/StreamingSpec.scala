package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Ev, UserMax}

/** A registrable Hadoop FileSystem (`graftns://`, local-disk backed)
  * whose rename is the OBJECT-STORE emulation: copy everything, then
  * delete the source — functional but non-atomic, exactly the semantics
  * that make directory-rename swap protocols unsafe on s3a/abfss. The
  * upsert-sink spec runs against it to prove the commit-marker protocol
  * never leans on rename atomicity for visibility.
  */
class NonAtomicRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "graftns"
  override def getUri: java.net.URI = java.net.URI.create("graftns:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    NonAtomicRenameFileSystem.renames.incrementAndGet()
    if (exists(dst)) super.rename(src, dst) // keep native into-dir semantics
    else org.apache.hadoop.fs.FileUtil.copy(this, src, this, dst,
      false, getConf) && delete(src, true)
  }
}
object NonAtomicRenameFileSystem {
  val renames = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** Structured-Streaming semantics driven through MemoryStream
  * (SURVEY.md §5.2 item 5): the streaming formulations must agree with
  * their batch twins, and keyed state must behave like the reference's
  * registers.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsBatch = Tables.events(spark, sfDir)
    .select("event_id", "user_id", "ts_us", "ts_ts", "value")

  test("streaming tumbling counts equal the batch formulation") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("event_id", "user_id", "ts_ts", "value")
    val out = StreamOps.runToMemory(spark,
      StreamOps.tumblingCounts(stream), "tumbling_spec", OutputMode.Complete())

    input.addData(eventsBatch
      .select($"event_id", $"user_id", $"ts_ts", $"value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect().toSeq: _*)
    val q2 = StreamOps.runToMemory(spark,
      StreamOps.tumblingCounts(stream), "tumbling_spec2", OutputMode.Complete())

    val batch = eventsBatch
      .groupBy(window($"ts_ts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .select(unix_timestamp($"w.start").as("bucket"), $"n")
      .as[(Long, Long)].collect().toMap
    val streamed = q2.select($"bucket", $"n").as[(Long, Long)].collect().toMap
    assert(streamed === batch)
  }

  test("stream-stream join attributes purchases to in-window clicks only") {
    implicit val sq = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val joined = StreamOps.clickPurchaseJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts_ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts_ts", "value"),
      windowUs = 600L * 1000000L) // 10 minutes
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_spec").start()

    clicks.addData((100L, 1L, ts(1000)), (101L, 2L, ts(1000)), (102L, 1L, ts(5000)))
    purchases.addData(
      (200L, 1L, ts(1300), 9.99),  // 5 min after click 100 → joins
      (201L, 2L, ts(2000), 5.00),  // 16+ min after click 101 → outside window
      (202L, 3L, ts(1100), 1.00))  // no click for user 3
    q.processAllAvailable(); q.stop()

    val got = spark.table("ssj_spec")
      .select("user_id", "purchase_id", "click_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 200L, 100L)),
      s"only the in-window attribution may join: $got")
  }

  test("transformWithState registers: monotone high-water mark, last-writer-wins") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState runs on the RocksDB state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[StreamOps.Batch]
      val q = StreamOps.registerStream(input.toDS()).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("regs_spec").start()

      input.addData(
        StreamOps.Batch("f1", 1000L, 500L, 0L),
        StreamOps.Batch("f1", 1001L, 900L, 1L),
        StreamOps.Batch("f2", 2000L, 300L, 2L))
      q.processAllAvailable()
      val r1 = spark.table("regs_spec")
        .as[StreamOps.Registers].collect().map(r => r.source -> r).toMap
      assert(r1("f1").maxTimestamp === 900L)
      assert(r1("f1").lastTimeGenerated === 1001L)
      assert(r1("f2").maxTimestamp === 300L)

      // batch 2: lower timestamps must NOT move the high-water mark back
      // (A8 monotonicity), but lastTimeGenerated follows arrival (A9)
      input.addData(StreamOps.Batch("f1", 1002L, 100L, 3L))
      q.processAllAvailable(); q.stop()
      val r2 = spark.table("regs_spec").as[StreamOps.Registers].collect()
        .filter(_.source == "f1").maxBy(_.lastTimeGenerated)
      assert(r2.maxTimestamp === 900L) // unchanged by the late low batch
      assert(r2.lastTimeGenerated === 1002L) // last writer wins
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming PSI monitor converges to the batch drift statistic") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // reference = the click value histogram (unit bins) of the corpus
      val ref = Tables.events(spark, sfDir)
        .filter($"event_type" === "click" && $"value".isNotNull)
        .select(floor($"value").cast("long").as("b"))
        .groupBy("b").count()
        .as[(Long, Long)].collect().toMap
      // streamed sample = the purchase events, pinned to ONE window
      // (ts_us = 0) so the final emission is the GLOBAL statistic
      val purchases = Tables.events(spark, sfDir)
        .filter($"event_type" === "purchase" && $"value".isNotNull)
        .select($"event_id", $"user_id", lit(0L).as("ts_us"), $"value")
        .as[StreamOps.Ev].collect()
      val input = MemoryStream[StreamOps.Ev]
      val q2 = StreamOps.psiMonitorStream(input.toDS(), ref).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("psimon_spec").start()
      purchases.grouped(math.max(1, purchases.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq); q2.processAllAvailable()
      }
      q2.stop()
      val emissions = spark.table("psimon_spec")
        .as[StreamOps.PsiOut].collect()
      // the monitor re-emits per batch; the final (max-n) emission has
      // seen everything and must equal the batch q_drift_psi exactly
      val fin = emissions.maxBy(_.n)
      assert(fin.n === purchases.length.toLong)
      val batch = q("q_drift_psi").collect()(0)
      assert(fin.psi === batch.getAs[Double]("psi"),
        "converged streaming PSI must equal the batch statistic")
      assert(fin.stable === batch.getAs[Boolean]("stable"))
      assert(fin.drifted === batch.getAs[Boolean]("drifted"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming sliding-window counts converge to the batch plugin rows") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the batch plugin over the SAME slice: daily bins, 7-day
      // trailing window, [2024-01-01, 2024-01-31)
      val fromUs = java.time.Instant.parse("2024-01-01T00:00:00Z")
        .toEpochMilli * 1000L
      val toUs = java.time.Instant.parse("2024-01-31T00:00:00Z")
        .toEpochMilli * 1000L
      Tables.events(spark, sfDir).createOrReplaceTempView("events_csl")
      val batch = graft.ingest.Kql.translate(spark,
        "events_csl | evaluate sliding_window_counts(user_id, ts_ts, " +
          "datetime(2024-01-01), datetime(2024-01-31), 7d, 1d)")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // stream the same in-range events through the fanout processor
      val evs = Tables.events(spark, sfDir)
        .filter($"ts_us" >= fromUs && $"ts_us" < toUs)
        .select($"event_id", $"user_id", $"ts_us", lit(0.0).as("value"))
        .as[StreamOps.Ev].collect()
      val input = MemoryStream[StreamOps.Ev]
      val q2 = StreamOps.slidingCountsStream(input.toDS(),
        lookbackBins = 7, binUs = 86400000000L, anchorUs = fromUs).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("slide_spec").start()
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq); q2.processAllAvailable()
      }
      q2.stop()
      // last emission per bin = the bin's converged counts; restrict
      // to the batch grid (the stream also emits the <r trailing bins
      // past the range end, which the plugin's grid drops)
      val emissions = spark.table("slide_spec").as[StreamOps.SlideOut]
        .collect().groupBy(_.bin_us)
        .view.mapValues(v => v.maxBy(_.count_)).toMap
        .filter { case (b, _) => b >= fromUs && b < toUs }
      emissions.foreach { case (b, out) =>
        val (c, d) = batch.getOrElse(b,
          fail(s"stream emitted bin $b the batch grid lacks"))
        assert(out.count_ === c, s"count parity at bin $b")
        assert(out.dcount === d, s"dcount parity at bin $b")
      }
      // every batch bin with activity was emitted by the stream
      batch.filter(_._2._1 > 0).keys.foreach { b =>
        assert(emissions.contains(b), s"batch-active bin $b not streamed")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming KL monitor converges to the batch drift statistic per source") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // reference = the corpus language histogram (the batch grid's
      // q side); streamed = every document, keyed by source
      val ref = Tables.documents(spark, sfDir)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      val docs = Tables.documents(spark, sfDir)
        .select($"doc_id", $"source", $"lang")
        .as[StreamOps.DocEv].collect()
      val input = MemoryStream[StreamOps.DocEv]
      val q2 = StreamOps.klMonitorStream(input.toDS(), ref).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("klmon_spec").start()
      docs.grouped(math.max(1, docs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq); q2.processAllAvailable()
      }
      q2.stop()
      val emissions = spark.table("klmon_spec").as[StreamOps.KlOut].collect()
      // final (max-n) emission per source must equal the batch row
      val fin = emissions.groupBy(_.source).view.mapValues(_.maxBy(_.n_docs)).toMap
      val batch = q("q_drift_kl").collect()
      assert(batch.nonEmpty)
      batch.foreach { r =>
        val src = r.getAs[String]("source")
        assert(fin(src).n_docs === r.getAs[Long]("n_docs"), s"$src n_docs")
        assert(fin(src).kl_nats === r.getAs[Double]("kl_nats"),
          s"$src: converged streaming KL must equal the batch statistic")
      }
      // incremental: more emissions than sources
      assert(emissions.length > fin.size)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming KS monitor converges to the batch drift statistic") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // both sample sides stream in, pinned to ONE window (ts_us = 0)
      // so the final emission is the GLOBAL two-sample statistic
      val evs = Tables.events(spark, sfDir)
        .filter($"event_type".isin("click", "purchase") && $"value".isNotNull)
        .select($"event_id", $"user_id", $"event_type", $"ts",
          lit(0L).as("ts_us"), $"value")
        .as[StreamOps.TypedEv].collect()
      val input = MemoryStream[StreamOps.TypedEv]
      val q2 = StreamOps.ksMonitorStream(input.toDS()).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("ksmon_spec").start()
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq); q2.processAllAvailable()
      }
      q2.stop()
      val emissions = spark.table("ksmon_spec")
        .as[StreamOps.KsOut].collect()
      val fin = emissions.maxBy(e => e.n_a + e.n_b)
      val batch = q("q_drift_ks").collect()(0)
      assert(fin.n_a === batch.getAs[Long]("n_a"))
      assert(fin.n_b === batch.getAs[Long]("n_b"))
      assert(fin.ks_stat === batch.getAs[Double]("ks_stat"),
        "converged streaming KS must equal the batch statistic")
      assert(fin.crit_05 === batch.getAs[Double]("crit_05"))
      assert(fin.reject_h0 === batch.getAs[Boolean]("reject_h0"))
      // the monitor is incremental: intermediate emissions exist and
      // carry growing sample sizes
      assert(emissions.length >= 2)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming scan funnel equals the batch declare-state scan row-for-row") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val evs = Tables.events(spark, sfDir)
        .select($"event_id", $"user_id", $"event_type", $"ts", $"ts_us", $"value")
        .as[StreamOps.TypedEv].collect()
      val input = MemoryStream[StreamOps.TypedEv]
      val q2 = StreamOps.scanFunnelStream(input.toDS()).toDF()
        .writeStream.outputMode("append").format("memory")
        .queryName("scanfunnel_spec").start()
      // event-time-ordered replay in three micro-batches: cross-batch
      // state must carry each actor's step machine forward
      evs.sortBy(e => (e.ts, e.event_id))
        .grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
          input.addData(chunk.toSeq); q2.processAllAvailable()
        }
      q2.stop()
      val streamed = spark.table("scanfunnel_spec")
        .select("user_id", "event_id", "hops", "bonus")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      val batch = q("q_kql_scan2")
        .select("user_id", "event_id", "hops", "bonus")
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
      assert(streamed === batch,
        "ordered streaming replay must equal the batch scan output")
      assert(streamed.nonEmpty)
      // append-only: no (user, step) emitted twice
      val perUserSteps = spark.table("scanfunnel_spec")
        .select("user_id", "step").as[(Long, Int)].collect().toSeq
      assert(perUserSteps.distinct.length === perUserSteps.length)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming event registers replayed in micro-batches equal the batch register pipeline") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // the batch pipeline's validation gate, replayed as a stream
      val evs = Tables.events(spark, sfDir)
        .filter($"event_type" =!= "error" &&
          get_json_object($"props", "$.k").isNotNull)
        .select($"event_id", $"user_id", $"event_type", $"ts", $"ts_us", $"value")
        .as[StreamOps.TypedEv].collect()
      val input = MemoryStream[StreamOps.TypedEv]
      val q2 = StreamOps.eventRegisterStream(input.toDS()).toDF()
        .writeStream.outputMode("update").format("memory")
        .queryName("evregs_spec").start()
      // three micro-batches: state must accumulate across them
      evs.grouped(math.max(1, evs.length / 3)).foreach { chunk =>
        input.addData(chunk.toSeq); q2.processAllAvailable()
      }
      q2.stop()
      val streamed = spark.table("evregs_spec")
        .as[StreamOps.EventRegisters].collect()
        .groupBy(r => (r.user_id, r.event_type))
        .map { case (k, rs) => k -> rs.maxBy(_.n_events) } // final emission
      val batch = q("q_register_pipeline").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")) -> r)
        .toMap
      assert(streamed.keySet === batch.keySet,
        "streamed keys must equal the batch pipeline's keys")
      streamed.foreach { case (k, sr) =>
        val br = batch(k)
        assert(sr.n_events === br.getAs[Long]("n_events"), s"$k: count register")
        assert(sr.max_value === br.getAs[Double]("max_value"), s"$k: running-max register")
        assert(sr.last_value === br.getAs[Double]("last_value"), s"$k: last-value register")
        assert(sr.last_ts === br.getAs[Long]("last_ts"), s"$k: watermark")
        assert(sr.first_ts === br.getAs[Long]("first_ts"), s"$k: first-seen bound")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("event registers converge for random events under random micro-batch splits") {
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7L)
      (1 to 3).foreach { round =>
        // adversarial shapes: µs-tie timestamps (distinct ns), few keys
        // so every key spans batches, values with repeats
        val evs = (1 to 120).map { i =>
          val ts = 1700000000000000000L + rnd.nextInt(50).toLong * 500L
          StreamOps.TypedEv(i.toLong, rnd.nextInt(3).toLong,
            if (rnd.nextBoolean()) "a" else "b", ts, ts / 1000L,
            rnd.nextInt(5).toDouble)
        }
        val input = MemoryStream[StreamOps.TypedEv]
        val q = StreamOps.eventRegisterStream(input.toDS()).toDF()
          .writeStream.outputMode("update").format("memory")
          .queryName(s"evregs_prop_$round").start()
        var rest = rnd.shuffle(evs)
        while (rest.nonEmpty) {
          val n = 1 + rnd.nextInt(rest.length)
          input.addData(rest.take(n)); q.processAllAvailable()
          rest = rest.drop(n)
        }
        q.stop()
        val got = spark.table(s"evregs_prop_$round")
          .as[StreamOps.EventRegisters].collect()
          .groupBy(r => (r.user_id, r.event_type))
          .map { case (k, rs) => k -> rs.maxBy(_.n_events) }
        val want = evs.groupBy(e => (e.user_id, e.event_type)).map { case (k, es) =>
          val last = es.maxBy(e => (e.ts, e.event_id))
          k -> StreamOps.EventRegisters(k._1, k._2, es.size.toLong,
            es.map(_.value).max, last.value, last.ts_us, es.map(_.ts_us).min)
        }
        assert(got === want, s"round $round diverged")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState sessionizer matches the batch lag-gap sessionization") {
    implicit val sq = spark.sqlContext
    val gapUs = 1800L * 1000000L // 30 min, the q_session_window gap
    val input = MemoryStream[Ev]
    val evs = eventsBatch.select($"event_id", $"user_id", $"ts_us", $"value")
      .as[Ev].collect().toSeq
    input.addData(evs: _*)
    val q = StreamOps.sessionize(input.toDS(), gapUs).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("sessionize_spec").start()
    q.processAllAvailable()
    // sentinel batch far past every event: closes all open sessions
    val maxTs = evs.map(_.ts_us).max
    val users = evs.map(_.user_id).distinct
    input.addData(users.map(u => Ev(-1L, u, maxTs + 10 * gapUs, 0.0)): _*)
    q.processAllAvailable(); q.stop()

    val got = spark.table("sessionize_spec")
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // batch twin: lag-gap-cumsum sessionization (the q_session_window oracle)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us")
    val expect = eventsBatch
      .withColumn("gap", $"ts_us" - lag($"ts_us", 1).over(w))
      .withColumn("new_s", when($"gap".isNull || $"gap" >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"start_us", $"end_us", $"n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === expect)
  }

  test("mapGroupsWithState running max matches the batch max per user") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val evs = eventsBatch.select($"event_id", $"user_id", $"ts_us", $"value")
      .as[Ev].collect().toSeq
    input.addData(evs: _*)
    val q = StreamOps.runningMax(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("runningmax_spec").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("runningmax_spec")
      .groupBy("user_id").agg(max("max_ts_us").as("m"), max("n").as("n"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val expect = eventsBatch.groupBy("user_id")
      .agg(max("ts_us").as("m"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === expect)
  }

  test("new-actor stream equals the batch firsts; actors emit exactly once") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamOps.newActorStream(input.toDS()).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("newactor_spec").start()
    // event-time-ordered replay in three micro-batches: cross-batch
    // state must suppress re-emission of chunk-1 actors in chunks 2-3
    val evs = eventsBatch.select($"event_id", $"user_id", $"ts_us", $"value")
      .orderBy("ts_us").as[Ev].collect()
    evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
      input.addData(chunk.toSeq: _*); query.processAllAvailable()
    }
    query.stop()
    val got = spark.table("newactor_spec")
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1).distinct.length === got.length,
      "an actor emitted more than once across micro-batches")
    val dayUs = 86400000000L
    val expect = eventsBatch.groupBy("user_id")
      .agg(min(($"ts_us" - $"ts_us" % dayUs)).as("d"))
      .as[(Long, Long)].collect().toSeq
    assert(got.sorted === expect.sorted,
      "streamed first-sight table must equal the batch min-day-per-actor")
    // and its per-day rollup IS q_kql_activity's new_dcount column.
    // Parity is only valid while the fixture lies entirely inside the
    // plugin's [2024-01-01, 2024-01-31) window (an actor whose GLOBAL
    // first sight fell outside would differ from the plugin's
    // in-window first even though both systems are correct) — pin the
    // precondition so a fixture change fails loudly here, not as a
    // confusing bin mismatch
    val (fixLo, fixHi) = eventsBatch
      .agg(min($"ts_us"), max($"ts_us")).as[(Long, Long)].head()
    val winLo = 1704067200000000L // 2024-01-01 epoch-µs
    val winHi = 1706659200000000L // 2024-01-31 epoch-µs
    assert(fixLo >= winLo && fixHi < winHi,
      s"events fixture [$fixLo, $fixHi] left the activity window — " +
        "re-scope the parity comparison before trusting it")
    val rolled = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val activity = q("q_kql_activity")
      .select("bin_us", "new_dcount").as[(Long, Long)].collect()
    activity.foreach { case (bin, n) =>
      assert(rolled.getOrElse(bin, 0L) === n, s"new_dcount parity at bin $bin")
    }
  }

  test("state survives across micro-batches (register semantics)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamOps.runningMax(input.toDS()).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("state_spec").start()
    input.addData(Ev(1, 7, 100, 1.0)); q.processAllAvailable()
    input.addData(Ev(2, 7, 50, 1.0)); q.processAllAvailable()  // late event
    q.stop()
    val last = spark.table("state_spec").orderBy($"n".desc)
      .as[UserMax].collect().head
    assert(last.max_ts_us === 100L) // high-water mark did not regress
    assert(last.n === 2L)
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("event_id", "ts_ts", "value")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val q = StreamOps.dedupStream(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_spec").start()
    input.addData((1L, t0, 1.0), (1L, t0, 1.0), (2L, t0, 2.0))
    q.processAllAvailable()
    input.addData((1L, t0, 1.0)) // replayed batch (reference A5 overwrite)
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_spec").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L))
  }

  test("ohlc candles bound their endpoints and gap fill densifies the grid") {
    val candles = q("q_ohlc")
    assert(candles.filter($"low" > $"high").count() === 0)
    assert(candles.filter($"open" < $"low" || $"open" > $"high").count() === 0)
    assert(candles.filter($"close" < $"low" || $"close" > $"high").count() === 0)

    val filled = q("q_gap_fill").cache()
    // dense: one row per hour between each type's bounds
    val expect = filled.groupBy("event_type")
      .agg((max($"hour") - min($"hour") + 1).as("span"))
      .agg(sum($"span")).collect()(0).getLong(0)
    assert(filled.count() === expect, "grid must have no holes")
    // gap rows carry n=0 and a forward-filled (non-null) mean
    assert(filled.filter($"is_gap" && $"n" =!= 0).count() === 0)
    assert(filled.filter($"is_gap" && $"mean_value".isNull).count() === 0,
      "every gap after the first observation forward-fills")
    assert(filled.filter($"is_gap").count() > 0, "data has structural gaps")

    // interpolation stays inside the convex hull of its neighbours, so
    // every value sits within the type's observed [min, max] mean range
    val interp = q("q_interpolate")
    val hull = q("q_gap_fill").filter(!$"is_gap")
      .groupBy("event_type")
      .agg(min($"mean_value").as("lo"), max($"mean_value").as("hi"))
    val out = interp.join(hull, "event_type")
      .filter($"value" < $"lo" - 0.0001 || $"value" > $"hi" + 0.0001).count()
    assert(out === 0, "linear interpolation cannot leave the observed range")
  }

  test("event transitions form a stochastic matrix over exactly n - users transitions") {
    import org.apache.spark.sql.functions._
    val rows = q("q_event_transitions")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // each state's outgoing probabilities sum to 1 (up to the 6-dp rounding)
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-4, s"rows ${g.head._1}")
    }
    // every user with k events contributes exactly k - 1 transitions
    val ev = Tables.events(spark, sfDir)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum === nEvents - nUsers)
  }

  test("foreachBatch upsert sink converges to latest-per-key across batches") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val state = s"$dir/state"
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val stream = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val q = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((1L, 7L, "click", 100L, 1.0), (2L, 7L, "click", 200L, 2.0))
    q.processAllAvailable()
    input.addData((3L, 7L, "click", 150L, 3.0), (4L, 8L, "view", 50L, 4.0))
    q.processAllAvailable()
    q.stop()
    val rows = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    // (7, click): event 2 wins (ts 200 > 150 > 100); late event 3 ignored
    assert(rows === Set((7L, "click", 2L, 2.0), (8L, "view", 4L, 4.0)))
    // superseded versions were collected: exactly one committed version
    // (plus its marker) remains under the root
    val names = new java.io.File(state).listFiles().map(_.getName).toSet
    assert(names.count(_.startsWith("_committed_")) === 1, names)
    assert(names.count(_.startsWith("v")) === 1, names)
  }

  test("late rows land in quarantine; on-time rows and the first batch pass") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    val input = MemoryStream[(Long, Long)]
    val stream = input.toDF().toDF("event_id", "ts_us")
    val q = StreamOps.lateDataSink(stream, s"$dir/main", s"$dir/quarantine",
      s"$dir/state", latenessUs = 50L, checkpoint = s"$dir/ckpt")
    // batch 0: no prior mark -> everything passes, mark becomes 200
    input.addData((1L, 100L), (2L, 200L))
    q.processAllAvailable()
    // batch 1: cut = 200 - 50 = 150; ts 100 is late, 210 and 160 pass
    input.addData((3L, 210L), (4L, 100L), (5L, 160L))
    q.processAllAvailable()
    q.stop()
    val main = spark.read.parquet(s"$dir/main")
      .select("event_id").as[Long].collect().toSet
    val late = spark.read.parquet(s"$dir/quarantine")
      .select("event_id").as[Long].collect().toSet
    assert(main === Set(1L, 2L, 3L, 5L))
    assert(late === Set(4L))
    // the mark is write-once per batch and pruned to the replayable tail
    val marks = new java.io.File(s"$dir/state").listFiles()
      .map(_.getName).filter(_.startsWith("mark.")).toSet
    assert(marks === Set("mark.0", "mark.1"))
  }

  test("upsert sink honors CDC tombstones: delete removes the key, a later insert resurrects it") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_del").toString
    val state = s"$dir/state"
    val input = MemoryStream[(Long, Long, String, Long, Double, String)]
    val stream = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_us", "value", "op")
    val q = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    // batch 1: two live keys
    input.addData((1L, 7L, "click", 100L, 1.0, "U"), (2L, 8L, "view", 200L, 2.0, "U"))
    q.processAllAvailable()
    // batch 2: tombstone key 7 — it must LEAVE the state table
    input.addData((3L, 7L, "click", 300L, 0.0, "D"))
    q.processAllAvailable()
    val afterDelete = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type").as[(Long, String)].collect().toSet
    assert(afterDelete === Set((8L, "view")), s"tombstoned key survived: $afterDelete")
    // batch 3: an out-of-order row OLDER than the tombstone must NOT
    // resurrect (the tombstone was the latest fold decision and the key
    // is gone — but within one batch the rank still decides); then a
    // genuinely newer insert resurrects the key
    input.addData((4L, 7L, "click", 400L, 4.0, "U"))
    q.processAllAvailable()
    q.stop()
    val rows = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows === Set((7L, "click", 4L, 4.0), (8L, "view", 2L, 2.0)),
      s"resurrection after tombstone failed: $rows")
  }

  test("upsert sink recovers full state after a crash between data write and commit") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_cr").toString
    val state = s"$dir/state"
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val stream = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val q = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((1L, 7L, "click", 100L, 1.0), (2L, 8L, "view", 200L, 2.0))
    q.processAllAvailable()
    q.stop()
    // simulate the crash window: a writer died AFTER fully writing the
    // next version's data but BEFORE creating its commit marker. The
    // orphan — here with data that would poison the state if believed —
    // must stay invisible to readers and be clobbered by the next batch.
    Seq((99L, 7L, "click", 999L, 9.9))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
      .write.mode("overwrite").parquet(s"$state/v1")
    val visible = StreamOps.upsertState(spark, state)
      .select("event_id").as[Long].collect().toSet
    assert(visible === Set(1L, 2L), "an uncommitted orphan version leaked to readers")
    // restart the stream on the same checkpoint with one more batch
    val q2 = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((3L, 9L, "click", 300L, 3.0))
    q2.processAllAvailable()
    q2.stop()
    val rows = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    // keys 7 and 8 come from the committed v0; the orphan's event 99
    // (ts 999 would have beaten event 1) must be gone
    assert(rows === Set((7L, "click", 1L, 1.0), (8L, "view", 2L, 2.0),
      (9L, "click", 3L, 3.0)),
      "recovery must resume from the last COMMITTED version")
  }

  test("upsert sink is object-store safe: converges on a copy+delete-rename FS") {
    // graftns:// renames are NON-atomic copy-then-delete (the object-store
    // failure mode that broke the old dst→old→dst swap design). The
    // commit-marker protocol never depends on rename for visibility, so
    // the sink must converge identically here.
    implicit val sq = spark.sqlContext
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftns.impl", classOf[NonAtomicRenameFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_ns").toString
    val state = s"graftns://$dir/state"
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val stream = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val q = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((1L, 7L, "click", 100L, 1.0), (2L, 8L, "view", 200L, 2.0))
    q.processAllAvailable()
    input.addData((3L, 7L, "click", 300L, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(NonAtomicRenameFileSystem.renames.get() > 0,
      "the run never exercised the non-atomic rename path (task commits rename)")
    val rows = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows === Set((7L, "click", 3L, 3.0), (8L, "view", 2L, 2.0)))
  }

  test("upsert multi-writer race: losers abort and retry, no committed row is ever lost") {
    // The reference runs 1-10 gateway replicas against one store and its
    // read-compare-set registers race (SURVEY §7.4). Here 4 writers × 5
    // batches race through the REAL merge path concurrently: a lost
    // marker create aborts that attempt (the streaming engine's batch
    // retry), the writer re-resolves and retries. Writer-unique staging
    // dirs mean a loser's overwrite can never touch a winner's committed
    // part files — the exactly-once claim under contention.
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_mw").toString
    val state = s"$dir/state"
    val writers = 4
    val rounds = 5
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val retries = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until writers).foreach { wtr =>
      pool.submit(new Runnable {
        def run(): Unit =
          try {
            (0 until rounds).foreach { r =>
              val id = (wtr * rounds + r + 1).toLong
              val batch = Seq((id, id % 3, "click", 1000L + id, id.toDouble))
                .toDF("event_id", "user_id", "event_type", "ts_us", "value")
              var attempts = 0
              var committed = false
              while (!committed) {
                try { StreamOps.upsertMerge(batch, state); committed = true }
                catch {
                  // lost race (marker exists) or state read torn by a
                  // concurrent winner's GC — both abort-and-retry paths
                  case e: Exception if attempts < 200 =>
                    attempts += 1; retries.incrementAndGet()
                }
              }
            }
          } catch { case t: Throwable => errs.add(t) }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(errs.isEmpty, errs)
    // every one of the 20 rows committed exactly once: the final state is
    // the latest row per key over ALL rows — max event_id per user_id
    val rows = StreamOps.upsertState(spark, state)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows === Set(
      (0L, "click", 18L, 18.0), (1L, "click", 19L, 19.0), (2L, "click", 20L, 20.0)))
    // versions are a contiguous ledger: one marker per committed version,
    // the highest one resolving — 20 successful merges = versions 0..19
    val names = new java.io.File(state).listFiles().map(_.getName)
    val markers = names.filter(_.startsWith("_committed_"))
      .map(_.stripPrefix("_committed_").toLong)
    assert(markers.max === 19L, names.toSeq)
  }

  test("upsert sink aborts on unreadable state instead of overwriting it") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_bad").toString
    val state = s"$dir/state"
    val input = MemoryStream[(Long, Long, String, Long, Double)]
    val stream = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val q = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((1L, 7L, "click", 100L, 1.0))
    q.processAllAvailable()
    q.stop()
    // corrupt the live state table: truncate every parquet part file to
    // garbage so the read fails with a footer error, NOT path-not-found
    // (the live dir carries a writer-unique token: v0-<token>)
    val stateDir = new java.io.File(state).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v0")).head
    val parts = stateDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      java.nio.file.Files.write(f.toPath, "not a parquet file".getBytes)
    }
    val q2 = StreamOps.upsertSink(stream, state, s"$dir/ckpt")
    input.addData((2L, 8L, "view", 200L, 2.0))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    // the batch must ABORT: the corrupt table is still in place for an
    // operator to repair — not silently replaced with batch-only content
    val after = stateDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(after.map(_.getName).toSet === parts.map(_.getName).toSet)
    assert(after.forall(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath)) ==
        "not a parquet file"),
      "a state-read failure must propagate, not wipe the state table")
  }

  test("stream-static dedup drops docs already in the corpus, keeps new ones") {
    implicit val sq = spark.sqlContext
    val corpus = Tables.documents(spark, sfDir)
    val dupText = corpus.select("text").as[String].head()
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = StreamOps.dedupAgainstCorpus(stream, corpus)
      .writeStream.outputMode("append").format("memory")
      .queryName("corpus_dedup_spec").start()
    input.addData((900001L, dupText), (900002L, "a genuinely new document"))
    q.processAllAvailable()
    input.addData((900003L, dupText)) // replay of known content, later batch
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("corpus_dedup_spec").select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(kept === Seq(900002L), "only the unseen document survives")
  }

  test("upsert retention keeps a time-travel window; default retains only the live version") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_tt").toString
    val state = s"$dir/state"
    def batch(rows: (Long, Long, String, Long, Double)*) =
      spark.createDataFrame(rows.toSeq)
        .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    // three merges with a 3-version retention window
    StreamOps.upsertMerge(batch((1L, 7L, "click", 100L, 1.0)), state, 3)
    StreamOps.upsertMerge(batch((2L, 8L, "view", 200L, 2.0)), state, 3)
    StreamOps.upsertMerge(batch((3L, 7L, "click", 300L, 3.0)), state, 3)
    def keysAt(v: Long) = StreamOps.upsertStateAt(spark, state, v)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(keysAt(0L) === Set((7L, 1L)))
    assert(keysAt(1L) === Set((7L, 1L), (8L, 2L)))
    assert(keysAt(2L) === Set((7L, 3L), (8L, 2L)),
      "the live version folds the key-7 update")
    // the live read and the newest time-travel read agree
    assert(StreamOps.upsertState(spark, state)
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet === keysAt(2L))
    // a fourth merge at the same retention slides the window: v0 goes
    StreamOps.upsertMerge(batch((4L, 9L, "error", 400L, 4.0)), state, 3)
    intercept[IllegalArgumentException] { keysAt(0L) }
    assert(keysAt(1L) === Set((7L, 1L), (8L, 2L)), "v1 still inside the window")
    // default retention (1): history is GC'd at the next merge
    val state2 = s"$dir/state2"
    StreamOps.upsertMerge(batch((1L, 7L, "click", 100L, 1.0)), state2)
    StreamOps.upsertMerge(batch((2L, 8L, "view", 200L, 2.0)), state2)
    intercept[IllegalArgumentException] {
      StreamOps.upsertStateAt(spark, state2, 0L)
    }
    assert(StreamOps.upsertStateAt(spark, state2, 1L).count() === 2L)
  }

  test("stream-stream left-outer join emits unattributed purchases after the watermark") {
    implicit val sq = spark.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp, Double)]
    val joined = StreamOps.clickPurchaseJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts_ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts_ts", "value"),
      windowUs = 600L * 1000000L, joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_spec").start()
    clicks.addData((100L, 1L, ts(1000)))
    purchases.addData(
      (200L, 1L, ts(1300), 9.99), // in-window → attributed
      (202L, 3L, ts(1100), 1.00)) // no click for user 3 → null row later
    q.processAllAvailable()
    // push the watermark far past purchase 202's eviction bound on BOTH
    // sides, then trigger again so the evicted row's null-extension emits
    clicks.addData((101L, 2L, ts(100000)))
    purchases.addData((201L, 2L, ts(100000), 5.00))
    q.processAllAvailable()
    clicks.addData((102L, 2L, ts(200000)))
    purchases.addData((203L, 2L, ts(200000), 5.00))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_outer_spec")
      .select("user_id", "purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // attributed purchase joins; the clickless one lands exactly once,
    // null-extended — no purchase is silently dropped
    assert(got.contains((1L, 200L, 100L)), s"attribution missing: $got")
    assert(got.contains((3L, 202L, -1L)), s"outer null row missing: $got")
    assert(got.count(_._2 == 202L) <= 1, s"outer row must emit once: $got")
  }
}
