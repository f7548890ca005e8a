package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming over the events stream (north-star extension;
  * the reference has no streaming at all). The aggregation logic is
  * the same code that runs in batch in [[graft.operators.Events]] —
  * Spark's unified engine — with watermarks bounding state so the
  * pipeline runs indefinitely on an unbounded stream: late events
  * beyond the watermark are dropped instead of growing state forever.
  *
  * Tested by streaming the events parquet through a file source with
  * a memory sink (see EventStreamsSpec); in production the source
  * would be Kafka/files and the sink a Delta/parquet append.
  */
object EventStreams {

  /** events schema as read from the corpus (ts already micros). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // raw nanos in the parquet
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of the events table with event-time ts. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventSchema)
      .parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts with a 2-hour watermark (late data beyond
    * 2h of max event time is dropped; state for closed windows is
    * evicted — bounded memory on an unbounded stream).
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))

  /** Session windows (30-minute gap) per user under a watermark. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"))

  /** Run a streaming aggregation to a named in-memory table until the
    * (finite) file source drains — the spec's harness.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
