package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Measurement discipline:
  *   - a warm-up pass first (JVM/JIT, codegen cache, parquet footer
  *     cache all land there instead of inflating the first query);
  *   - full materialization via a noop-format write — `.count()` lets
  *     Catalyst prune unreferenced projections, which flatters
  *     compute-heavy select lists;
  *   - stable (sorted) query order so rounds are comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up: cheap queries spanning the hot code paths (scan+filter,
    // json, windowing, the codegen'd cosine kernel, typed Dataset).
    Seq("q02_filter_project", "q16_json_extract", "q17_events_tumbling",
      "q30_ann_brute", "q33_media_decode")
      .foreach(n => try run(n) catch { case _: Throwable => () })

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try run(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
