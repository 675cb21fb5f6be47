package graft.tools

import graft.{GraftSession, SparkEntry}

/** Warm repeated-measurement profiler: runs the named queries (or the
  * full registry) N times after a warmup pass and prints min/median per
  * query. The bench machine shows ±45% single-run noise — per the verify
  * recipe, tune against the MINIMUM of repeated warm runs, never one
  * cold reading.
  *
  * Run: `sbt "runMain graft.tools.Profile [reps] [query ...]"` — both
  * optional; a non-numeric first arg is treated as a query name.
  *
  * When `SPARK_GRAFT_PROFILE_OUT` is set, also writes the full table as
  * one JSON file (per-query warm min + median, total of mins, host-load
  * averages before and after the run) — the driver's BENCH tail
  * truncates, so this is the complete builder-owned bench artifact each
  * round's BASELINE.md comparison cites.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    // the f-interpolator formats through the JVM default locale; under a
    // comma-decimal locale (de_DE, fr_FR) the emitted artifact would not
    // be valid JSON — pin ROOT before any formatting happens
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val (reps, nameArgs) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (math.max(1, r), args.drop(1).toSeq)
      case None => (3, args.toSeq)
    }
    val names =
      if (nameArgs.nonEmpty) nameArgs
      else SparkEntry.queries.keys.toSeq.sorted
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(1)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadBefore = loadAvg
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    names.foreach { n =>
      val warmOk =
        try { SparkEntry.queries(n)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          println(s"PROF $n FAILED: ${e.getMessage}"); false
        }
      if (warmOk) {
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        // even rep count: average the two central readings
        val median =
          if (times.size % 2 == 1) times(times.size / 2)
          else (times(times.size / 2 - 1) + times(times.size / 2)) / 2
        results(n) = (times.head, median)
        println(f"PROF $n%-24s min=${times.head}%.2fs median=$median%.2fs reps=$reps")
      }
    }
    sys.env.get("SPARK_GRAFT_PROFILE_OUT").foreach { out =>
      // a SUBSET run merges into an existing artifact instead of
      // replacing it, and the summary fields are ALWAYS re-derived from
      // the merged per-query map at write time — a partial re-measure
      // can no longer leave total_min_sec/n_queries describing a stale
      // map (the round-8 artifact bug)
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
      val path = java.nio.file.Paths.get(out)
      if (nameArgs.nonEmpty && java.nio.file.Files.exists(path)) {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = m.readTree(java.nio.file.Files.readAllBytes(path))
        val qs = root.get("queries")
        qs.fieldNames().forEachRemaining { n =>
          merged(n) = (qs.get(n).get("min").asDouble(),
            qs.get(n).get("median").asDouble())
        }
      }
      results.foreach { case (n, v) => merged(n) = v }
      val qjson = merged.toSeq.sortBy(_._1).map { case (n, (mn, md)) =>
        f""""$n":{"min":$mn%.3f,"median":$md%.3f}"""
      }.mkString(",")
      val total = merged.valuesIterator.map(_._1).sum
      val json = f"""{"sf_dir":"$sfDir","reps":$reps,""" +
        f""""total_min_sec":$total%.3f,"n_queries":${merged.size},""" +
        f""""load_avg_before":$loadBefore%.2f,"load_avg_after":$loadAvg%.2f,""" +
        s""""queries":{$qjson}}"""
      java.nio.file.Files.write(path, json.getBytes("UTF-8"))
      println(s"PROF wrote $out (${merged.size} queries, total ${f"$total%.1f"}s)")
    }
    spark.stop()
  }
}
