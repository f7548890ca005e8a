package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout operators — the two techniques that decide whether
  * a 100 TB table is queryable: directory partitioning (partition
  * pruning: a filter on the partition column skips whole directories
  * before any I/O) and hash bucketing (co-located joins/aggregations:
  * two tables bucketed on the same key by the same count join with NO
  * shuffle — the exchange disappears from the plan). The reference
  * has no table layout at all (single-file sinks, `src/lib.rs:116-168`);
  * this is pure Spark-scale capability.
  */
object Layout {

  /** Write `df` hive-style partitioned by `cols` (low-cardinality
    * columns only — each distinct combination is a directory).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Write `df` as a bucketed external table: `buckets` hash buckets
    * on `key`, sorted within buckets (enables shuffle-free sort-merge
    * joins too). Bucketing metadata lives in the session catalog;
    * `path` keeps the data external to the warehouse.
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously bucketed on the join key with the
    * same bucket count: Catalyst sees compatible output partitioning
    * on both sides and plans the join without any Exchange.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
