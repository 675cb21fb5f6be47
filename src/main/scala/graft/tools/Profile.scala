package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftExtensions, SparkEntry}

/** Warm repeated-measurement profiler: runs the named queries (or the
  * full registry) N times after a warmup pass and prints min/median per
  * query. The bench machine shows ±45% single-run noise — per the verify
  * recipe, tune against the MINIMUM of repeated warm runs, never one
  * cold reading.
  *
  * Run: `sbt "runMain graft.tools.Profile [reps] [query ...]"`.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n => // warmup: codegen + file listing, untimed
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"PROF $n WARMUP-FAILED: ${e.getMessage}") }
    }
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"PROF $n%-24s min=${times.head}%.2fs median=${times(times.size / 2)}%.2fs reps=$reps")
    }
    spark.stop()
  }
}
