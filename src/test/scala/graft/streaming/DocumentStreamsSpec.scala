package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Corpus

/** Stream-vs-batch parity for the document cleaning pipeline: the
  * same rows (quality filter, fingerprints, redaction digests) must
  * come out whether the corpus arrives as a bounded table or as a
  * stream of files.
  */
class DocumentStreamsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** documents split into 3 parquet files streamed as micro-batches
    * (the file source needs a directory).
    */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("docstream").toString +
      "/documents.parquet"
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .repartition(3)
      .write.mode("overwrite").parquet(dir)
    dir.stripSuffix("/documents.parquet")
  }

  test("streaming mixture sample equals the batch keep set") {
    val streamed = DocumentStreams.sampledDocuments(
      DocumentStreams.readDocumentStream(spark, streamDir))
    val q = EventStreams.runToMemory(streamed, "sampled_docs", OutputMode.Append())
    try {
      val got = spark.table("sampled_docs").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      val want = DocumentStreams.sampledDocuments(
          Corpus.read(spark, TestSpark.sf, "documents"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
      assert(got.nonEmpty)
      assert(got.length < spark.read
        .parquet(s"${TestSpark.sf}/documents.parquet").count())
      assert(got.toSeq === want.toSeq)
    } finally spark.sql("drop view if exists sampled_docs")
  }

  test("streaming cleaned documents equal the batch pipeline rows") {
    val streamed = DocumentStreams.cleanedDocuments(
      DocumentStreams.readDocumentStream(spark, streamDir))
    val q = EventStreams.runToMemory(streamed, "clean_docs", OutputMode.Append())
    try {
      val got = spark.table("clean_docs").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3), r.getString(4))).sortBy(_._1)
      val want = DocumentStreams.cleanedDocuments(
          Corpus.read(spark, TestSpark.sf, "documents"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3), r.getString(4))).sortBy(_._1)
      assert(got.nonEmpty)
      assert(got.toSeq === want.toSeq)
    } finally spark.sql("drop view if exists clean_docs")
  }
}
