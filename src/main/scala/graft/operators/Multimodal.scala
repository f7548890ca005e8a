package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Multimodal-column plumbing (north-star extension): media payloads
  * travel as opaque `binary` columns with typed metadata alongside.
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is
  * real: binary column construction, schema of the decoded struct,
  * per-partition batch processing via `mapPartitions` (the Scala
  * analogue of `mapInPandas` batch UDFs), and the metadata join-back.
  */
object Multimodal {

  /** Decoded-media metadata record (what a real image decode yields). */
  case class MediaMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int,
      format: String, checksum: String)

  /** STUB decode kernel: derives deterministic pseudo-metadata from
    * the payload bytes. A real deployment swaps only this function
    * (e.g. for a JPEG header parse); everything around it — batch
    * iteration, schema, partitioning — is production-shaped. Takes the
    * digest instance from the caller so the per-partition loop
    * allocates it once, not per row.
    */
  def decodeStub(docId: Long, payload: Array[Byte],
      md: java.security.MessageDigest): MediaMeta = {
    val n = payload.length.toLong
    // ??? real decoder goes here; deterministic fake below.
    val width = 64 + (n % 577).toInt
    val height = 64 + ((n * 31 + payload.headOption.getOrElse(0: Byte).toLong) % 417).toInt
    val format = if (n % 3 == 0) "png" else if (n % 3 == 1) "jpeg" else "webp"
    md.reset()
    val checksum = md.digest(payload).map("%02x".format(_)).mkString
    MediaMeta(docId, n, width, height, format, checksum)
  }

  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta =
    decodeStub(docId, payload, java.security.MessageDigest.getInstance("MD5"))

  /** documents.text encoded to a binary payload column — stands in
    * for an image/audio bytes column with the same Spark semantics.
    */
  def payloads(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))

  /** Per-partition batched decode: Dataset[MediaMeta] out. The
    * partition hook is where a real decoder amortizes setup (codec
    * init, model load); here it amortizes the digest instance.
    */
  def decodeAll(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeStub(id, bytes, md) }
      }
  }

  /** The oracle-checkable slice of [[decodeAll]]: every column the
    * stub derives by integer/md5 math alone (height needs the first
    * payload *byte*, which DuckDB SQL can't address portably on
    * multi-byte text — excluded). Runs the real typed-Dataset
    * mapPartitions path end-to-end through the correctness gate.
    */
  def decodeMeta(spark: SparkSession, dir: String): DataFrame =
    decodeAll(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes"),
        col("width").cast("long").as("width"),
        col("format"), col("checksum"))
      .orderBy(col("doc_id"))

  /** Declarative (oracle-checkable) slice of the same pipeline:
    * metadata computable without the codec — payload size, checksum,
    * and the stub's deterministic width — aggregated per source.
    * Pure integer/md5 math, portable to DuckDB.
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    payloads(spark, dir)
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("width", (lit(64) + col("n_bytes") % 577).cast("int"))
      .withColumn("checksum", md5(col("payload")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 4).as("avg_width"),
        countDistinct(col("checksum")).as("n_distinct"))
      .orderBy(col("source"))
}
