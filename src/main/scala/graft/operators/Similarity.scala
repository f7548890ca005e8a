package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Corpus

/** Approximate-nearest-neighbor search over the embedding column
  * (north-star extension). Two paths:
  *
  *   - [[bruteTopK]]: exact top-k — broadcast the (small) query set,
  *     one codegen'd pass over the vector corpus, per-query window
  *     rank. At 100 TB this is the correct baseline when queries are
  *     few: no shuffle of the corpus, only of the candidate rows.
  *   - [[lshTopK]]: sign-projection LSH — bucket every vector by the
  *     sign pattern of 8 fixed dimensions, join queries only to their
  *     own bucket. The candidate set shrinks ~256×; recall is traded
  *     for a proportionally smaller scan+shuffle. Bucketing by raw
  *     float sign keeps the oracle bit-exact (no RNG to replicate).
  *
  * The cosine kernel is the custom codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]].
  */
object Similarity {

  private val NumQueries = 20

  /** Exact top-k neighbors for each query vector (vec_id < 20). */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Sign-projection LSH bucket: bit j = (embedding[8j] > 0), j=0..7.
    * element_at is 1-based; exact float comparison is portable. Shared
    * with [[Dedup.embeddingNearDups]]'s bucketed pair generation.
    */
  def bucketCol(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { j =>
      when(element_at(emb, j * 8 + 1) > 0f, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-k: queries join only their bucket. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
      .withColumn("bucket", bucketCol(col("embedding")))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
    val sims = e.join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }
}
