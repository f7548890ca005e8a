package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Loader for the local TPC-H-ish parquet corpus (TESTDATA.md), which
  * stands in for the reference's live-PostgreSQL test bed
  * (reference `tests/conftest.py:7-13`). One quirk is handled here so
  * every operator sees clean types: `events.ts` is written as parquet
  * TIMESTAMP(NANOS) which Spark rejects outright; we read it as a long
  * (legacy conf) and truncate to microsecond TimestampNTZ — the same
  * truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`, keeping the
  * oracle comparable.
  */
object Corpus {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one corpus table from `dir` (e.g. /root/testdata/sf0.01). */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** events with ts as microsecond TimestampNTZ (naive UTC wall-clock,
    * matching DuckDB's naive TIMESTAMP semantics). Handles both the
    * driver corpus encoding (TIMESTAMP(NANOS), read as long under the
    * legacy conf) and engine-written twins (skew/scale fixtures),
    * where ts is already a microsecond timestamp.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // ts arrives as nanos-since-epoch long; integer-divide to
        // micros. `div`, not `/`: at ~1.7e18 the double division `/`
        // produces is past 53-bit mantissa precision and lands 1µs
        // off for some rows.
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

  /** Spread an under-partitioned file scan across the cores before a
    * CPU-heavy per-row kernel. The driver corpus ships ONE file per
    * table → a 1-task scan → any expensive per-row kernel (XML/JSON
    * parse, MinHash, tokenization) SERIALIZES on one core (measured:
    * q266 21 s serialized vs 1.6 s spread at sf0.1). The file-count
    * guard makes this a no-op at production file counts — at 100 TB
    * the input layout IS the parallelism and no shuffle is added.
    */
  def spread(df: DataFrame): DataFrame = {
    // Streaming plans have no inputFiles (and micro-batches already
    // parallelize by source partitioning) — pass through untouched.
    if (df.isStreaming) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      if (df.inputFiles.length * 2 < par) df.repartition(par) else df
    }
  }

  /** [[spread]] to a BOUNDED number of ways (r22): for partial
    * aggregations whose per-partition state re-does work the single
    * partial would dedupe once (multi-countDistinct hash tables,
    * HLL sketches), full-width spread multiplies task cpu by the
    * partition count (measured r21: q238 cpu 7.4→29.8 s at 32 ways,
    * wall-neutral) while NO spread serializes the aggregate on the
    * 1-task scan. `n` caps the parallelism-vs-duplicated-state
    * trade-off; capped at the session's parallelism so low-core runs
    * never over-partition. Same file-count guard as [[spread]]: at
    * production file counts the layout is the parallelism and this
    * is a no-op.
    */
  def spreadTo(df: DataFrame, n: Int): DataFrame = {
    if (df.isStreaming) df
    else {
      val par = df.sparkSession.sparkContext.defaultParallelism
      val ways = math.min(n, par)
      if (df.inputFiles.length * 2 < ways) df.repartition(ways) else df
    }
  }

  /** Register every corpus table present in `dir` as a temp view. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach { n =>
      if (new java.io.File(s"$dir/$n.parquet").exists())
        read(spark, dir, n).createOrReplaceTempView(n)
    }
}
