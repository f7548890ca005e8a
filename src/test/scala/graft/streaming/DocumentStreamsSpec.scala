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

  test("streaming near-dup guard keeps exactly one doc per minhash signature") {
    val streamed = DocumentStreams.nearDupGuardedDocuments(
      DocumentStreams.readDocumentStream(spark, streamDir))
    val q = EventStreams.runToMemory(streamed, "neardup_docs", OutputMode.Append())
    try {
      val got = spark.table("neardup_docs").collect()
        .map(r => (r.getLong(0), r.getString(3)))
      // Batch twin of the signature key — which survivor is kept is
      // arrival-order-dependent, so parity is on the signature SETS:
      // one survivor per distinct signature, none invented.
      val batchSigs = DocumentStreams.signatureKeyed(
          Corpus.read(spark, TestSpark.sf, "documents"))
        .dropDuplicates("sig_key")
        .select("doc_id", "sig_key").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val total = spark.read
        .parquet(s"${TestSpark.sf}/documents.parquet").count()
      assert(got.map(_._2).toSet === batchSigs.map(_._2).toSet)
      assert(got.length === got.map(_._2).toSet.size, "a signature survived twice")
      // The fixture corpus carries exact duplicates, which share full
      // signatures — the guard must actually drop some of them.
      assert(got.length < total)
      // Every surviving doc carries the signature the batch kernel
      // computes for that doc_id (the stream didn't scramble rows;
      // WHICH survivor per signature may differ, its content may not).
      import org.apache.spark.sql.functions.{col, concat_ws}
      val allSigs = Corpus.read(spark, TestSpark.sf, "documents")
        .select(col("doc_id"), concat_ws("|",
          graft.functions.MinHashFunctions.minhash_signature(
            graft.operators.TextAnalysis.tokens(col("text")))).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got.foreach { case (id, sig) =>
        assert(allSigs(id) === sig, s"doc $id signature drift")
      }
    } finally spark.sql("drop view if exists neardup_docs")
  }
}
