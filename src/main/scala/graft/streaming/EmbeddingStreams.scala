package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.Similarity

/** Structured Streaming over the EMBEDDING corpus: the ANN-side
  * ingest stages. Like [[DocumentStreams]], every stage is a
  * stateless projection with an offline-fit broadcast model, so no
  * watermark and no state store — constant memory at any ingest
  * volume.
  */
object EmbeddingStreams {

  /** embeddings schema as written by the corpus fixtures. */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** The qS06 streaming-vs-oracle gate: q250's arrival-assignment leg
    * at INGEST — the q240-fit/qS04-score deployment split applied to
    * the ANN index: the frozen centroid model is the bounded offline
    * artifact ([[Similarity.centroidModel]], ncells rows), and every
    * arriving vector is assigned its cell by the STATELESS per-row
    * argmax [[Similarity.assignCellCol]] (a codegen'd expression over
    * the centroid literal — no join, no aggregate, no state). The
    * arrivals are q250's own fixture (negated mod-13 re-keys), so the
    * landed assignments are exactly the rows q250's maintenance leg
    * appends to the stored index — this gate IS the ingest half of
    * the index-maintenance story, and its oracle is q250's
    * from-scratch derivation restricted to the arrival set.
    */
  def ivfAssignedFinalized(spark: SparkSession, dir: String): DataFrame =
    EventStreams.stagedGate("graft-qs06-") { tmp =>
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val model = Similarity.centroidModel(spark, dir)
    e.filter(pmod(col("vec_id"), lit(13L)) === 0)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
      .repartition(4)
      .write.mode("overwrite").parquet(s"$tmp/in/arrivals.parquet")
    val q = spark.readStream
      .schema(embeddingSchema)
      .parquet(s"$tmp/in/arrivals.parquet")
      .select(col("vec_id"),
        Similarity.assignCellCol(col("embedding"), model).as("cid"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/data")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    spark.read.parquet(s"$tmp/data")
  }
    .groupBy(col("cid"))
    .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
    .orderBy(col("cid"))
}
