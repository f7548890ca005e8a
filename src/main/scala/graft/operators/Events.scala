package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Event-time windowing over the `events` table — the batch side of
  * the streaming capability (the same window operators run under
  * Structured Streaming in [[graft.streaming.EventStreams]]; Spark's
  * unified model makes the logic identical). No reference analogue
  * (flaco has no streaming, SURVEY.md §1.1 last row).
  */
object Events {

  /** Tumbling 1-hour windows per event type. Decimal sum for the same
    * order-free determinism as [[sessions]].
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,6)")), 2)
          .cast("double").as("sum_value"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"),
        col("sum_value"))
      .orderBy(col("wstart"), col("event_type"))

  /** Sliding 1-hour windows every 30 minutes. */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("wstart"), col("event_type"), col("n"))
      .orderBy(col("wstart"), col("event_type"))

  /** Session windows per user with a 30-minute inactivity gap.
    * Session end = last event + gap (Spark semantics; the oracle
    * reproduces it with gaps-and-islands SQL). The per-session sum is
    * computed in DECIMAL(18,6): double addition is order-sensitive and
    * Spark's partial-aggregation order differs from the oracle's
    * ordered scan, which can flip a rounded cent; decimal addition is
    * exact and order-free on both engines.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,6)")), 2)
          .cast("double").as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** The HLL++ relative standard deviation [[approxUsers]] requests —
    * named so the accuracy spec bounds against the SAME constant the
    * sketch is configured with (3·rsd ≈ the 99.7% band for a
    * well-behaved sketch).
    */
  val ApproxRsd = 0.05

  /** Approximate distinct users per event type (HLL++ at
    * [[ApproxRsd]]) — no SQL oracle (sketch values are
    * engine-specific); the driver records a rows-only check,
    * [[exactUsers]] carries the oracle-able exact count, and
    * OperatorsSpec ("approx distinct users...") asserts each group's
    * sketch is within 3·rsd of it.
    */
  def approxUsers(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), ApproxRsd).as("approx_users"))
      .orderBy(col("event_type"))

  /** Exact distinct users per event type — the oracle-checked twin of
    * [[approxUsers]] (split so the sketch query's lack of an oracle
    * doesn't hide the distinct-count path from the correctness gate).
    */
  def exactUsers(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** Exact interpolated percentiles of event value per type (Spark
    * `percentile` == DuckDB `quantile_cont`: sort + linear
    * interpolation). For sketched quantiles at scale, swap in
    * `approx_percentile` the way [[approxUsers]] twins [[exactUsers]].
    */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  /** Statistical aggregate battery per event type: sample
    * stddev/variance, exact median (sort + midpoint interpolation in
    * both engines), Pearson correlation and sample covariance against
    * the user id — the PG aggregate surface beyond sums/counts. All
    * are single-pass mergeable aggregates (Spark's parallel moment
    * merge); moments are rounded at 4 because merge ORDER legitimately
    * perturbs the low bits across engines (the values are ~1e2-1e4, so
    * 1e-4 is far above fp noise and far below any semantic drift);
    * the median interpolates two exact doubles and rounds at 6.
    */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "events")
      .withColumn("uid_d", col("user_id").cast("double"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("value")), 4).as("sd"),
        round(var_samp(col("value")), 4).as("vr"),
        round(median(col("value")), 6).as("med"),
        round(corr(col("value"), col("uid_d")), 4).as("corr_uid"),
        round(covar_samp(col("value"), col("uid_d")), 4).as("cov_uid"))
      .orderBy(col("event_type"))
}
