package graft.streaming

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Curation
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

  test("streaming weighted reservoir converges to the batch draw") {
    // maxFilesPerTrigger=1 forces one micro-batch per fixture file, so
    // the reservoir genuinely merges state across batches instead of
    // seeing everything at once.
    val src = spark.readStream
      .schema(DocumentStreams.documentSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$streamDir/documents.parquet")
    val streamed = DocumentStreams.weightedReservoir(src, k = 20)
    EventStreams.runToMemory(streamed, "wres_docs", OutputMode.Update())
    try {
      val emitted = spark.table("wres_docs").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(4)))
      // More than one batch ran: some stratum was re-emitted at the
      // same rank with different docs as better clocks arrived.
      assert(emitted.length > emitted.map(e => (e._1, e._3)).distinct.length
        || emitted.groupBy(e => (e._1, e._2)).exists(_._2.length > 1),
        "reservoir never updated across batches")
      // Update mode re-emits each stratum's current draw every batch;
      // clocks only ever improve, so the final draw per lang is the k
      // smallest distinct clocks across all emissions.
      val finalDraw = emitted.groupBy(_._1).view.mapValues { g =>
        g.map(e => (e._4, e._3)).distinct.sorted.take(20).map(_._2).toSet
      }.toMap
      val want = Curation.weightedSample(spark, TestSpark.sf, 20).collect()
        .map(r => (r.getString(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(finalDraw.keySet === want.keySet)
      finalDraw.foreach { case (lang, ids) =>
        assert(ids === want(lang), s"stratum $lang diverged from batch")
      }
    } finally spark.sql("drop view if exists wres_docs")
  }

  test("weighted reservoir state survives a checkpointed restart") {
    val base = java.nio.file.Files.createTempDirectory("wresume").toString
    val srcDir = s"$base/src/documents.parquet"
    val chkDir = s"$base/chk"
    val raw = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val Array(first, second) = raw.randomSplit(Array(0.5, 0.5), seed = 11)
    val buf =
      new scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      Long) => Unit = (df, id) => {
      val rows = df.collect().map(r => (id, r.getString(0), r.getLong(2)))
      buf.synchronized { buf ++= rows: Unit }
    }
    def runOnce(): Unit = {
      val q = DocumentStreams.weightedReservoir(
          DocumentStreams.readDocumentStream(spark, s"$base/src"), 20)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", chkDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q.stop()
    }
    first.write.mode("overwrite").parquet(srcDir)
    runOnce()
    buf.synchronized(buf.clear())
    // New files arrive; the RESTARTED query must merge them into the
    // checkpointed reservoir state, not start a fresh draw.
    second.write.mode("append").parquet(srcDir)
    runOnce()
    val run2 = buf.synchronized(buf.toVector)
    assert(run2.nonEmpty, "resumed run emitted nothing")
    val lastBatch = run2.map(_._1).max
    val got = run2.filter(_._1 == lastBatch)
      .groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    // first ∪ second = the full corpus, so a surviving reservoir must
    // equal the batch draw over it; a reset one would have drawn from
    // the second half only.
    val want = Curation.weightedSample(spark, TestSpark.sf, 20).collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (lang, ids) =>
      assert(ids === want(lang), s"stratum $lang lost state across restart")
    }
  }

  test("streaming cascade attrition converges to the batch funnel") {
    val streamed = DocumentStreams.cascadeAttrition(
      DocumentStreams.readDocumentStream(spark, streamDir))
    val q = EventStreams.runToMemory(streamed, "cascade_funnel",
      OutputMode.Complete())
    try {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).sortBy(_._1)
      val got = rows(spark.table("cascade_funnel"))
      val want = rows(graft.operators.TextAnalysis.filterCascade(
        spark, TestSpark.sf))
      assert(got.length === 5)
      // Complete mode re-emits the whole funnel each batch; after the
      // final micro-batch the running report equals the batch report.
      assert(got.toSeq === want.toSeq)
      // The funnel itself is internally consistent: n_out chains.
      got.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 === b._3, s"funnel broken between ${a._2} and ${b._2}")
      }
    } finally spark.sql("drop view if exists cascade_funnel")
  }

  test("streaming running top tokens equal the batch sketch") {
    val streamed = DocumentStreams.runningTopTokens(
      DocumentStreams.readDocumentStream(spark, streamDir))
    val q = EventStreams.runToMemory(streamed, "top_toks",
      OutputMode.Complete())
    try {
      val got = spark.table("top_toks").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      val want = graft.operators.TextAnalysis
        .approxTopTokens(spark, TestSpark.sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
      assert(got.length === 5)
      assert(got.toSeq === want.toSeq,
        "stream-final heavy hitters diverged from the batch sketch")
    } finally spark.sql("drop view if exists top_toks")
  }

  test("streaming contamination tallies converge to the batch report") {
    val bench = graft.operators.Dedup.evalShingleSetFor(spark, TestSpark.sf)
    val streamed = DocumentStreams.contaminationCounts(
      DocumentStreams.readDocumentStream(spark, streamDir), bench)
    val q = EventStreams.runToMemory(streamed, "contam_counts",
      OutputMode.Complete())
    try {
      val got = spark.table("contam_counts").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = graft.operators.Dedup.contaminationReport(spark, TestSpark.sf)
        .groupBy("verdict")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum("n_hits").as("sum_hits"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq === want.toSeq)
      assert(got.map(_._1).toSeq === Seq("clean", "drop", "review"))
    } finally spark.sql("drop view if exists contam_counts")
  }

  test("streaming CDC classification equals the batch classification " +
    "of the same snapshot feed (qS05 stream≡batch pin)") {
    import org.apache.spark.sql.functions.{col, max}
    val docs = Corpus.read(spark, TestSpark.sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val base = graft.operators.Relational.baseFingerprintsOf(docs)
    val snapB = graft.operators.Relational.snapshotBOf(docs, maxId)
    val dir = java.nio.file.Files.createTempDirectory("cdcstream").toString
    snapB.repartition(3)
      .write.mode("overwrite").parquet(s"$dir/snapshot.parquet")
    val streamed = DocumentStreams.cdcClassified(
      spark.readStream.schema(DocumentStreams.snapshotSchema)
        .parquet(s"$dir/snapshot.parquet"),
      base)
    val q = EventStreams.runToMemory(streamed, "cdc_rows", OutputMode.Append())
    try {
      val got = spark.table("cdc_rows").collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      val want = DocumentStreams.cdcClassified(snapB, base).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(got.nonEmpty)
      assert(got.toSeq === want.toSeq,
        "streamed per-row CDC classes diverged from the batch twin")
      // Every arrival is classified exactly once — the feed loses and
      // invents nothing across micro-batch boundaries.
      assert(got.length === snapB.count())
    } finally spark.sql("drop view if exists cdc_rows")
  }

  test("streaming BPE token counts equal the batch projection over " +
    "the same corpus (qS07 stream≡batch pin)") {
    import org.apache.spark.sql.functions.col
    val merges = graft.operators.TextAnalysis
      .bpeMergesFor(spark, TestSpark.sf)
    val streamed = graft.operators.TextAnalysis.bpeTokenCounts(
      DocumentStreams.readDocumentStream(spark, streamDir), merges)
    val q = EventStreams.runToMemory(streamed, "bpe_rows", OutputMode.Append())
    try {
      val got = spark.table("bpe_rows").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      val want = graft.operators.TextAnalysis.bpeTokenCounts(
          Corpus.read(spark, TestSpark.sf, "documents"), merges)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      assert(got.nonEmpty)
      assert(got.toSeq === want.toSeq,
        "streamed per-doc subword counts diverged from the batch twin")
      assert(q != null)
    } finally spark.sql("drop view if exists bpe_rows")
  }

  test("qS07's whole-string replace chain equals a per-word driver " +
    "replay (the separator-count arithmetic is exact)") {
    import org.apache.spark.sql.functions.col
    val merges = graft.operators.TextAnalysis
      .bpeMergesFor(spark, TestSpark.sf)
    val got = graft.operators.TextAnalysis.bpeTokenCounts(
        Corpus.read(spark, TestSpark.sf, "documents"), merges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // Driver replay of the PAPER's application: each word fenced and
    // merged independently in rank order, subwords counted by
    // splitting — no joined string, no separator arithmetic.
    val docs = Corpus.read(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val words = "\\S+".r.findAllIn(text).toSeq
      if (words.isEmpty) None
      else {
        val subs = words.map { w =>
          var sym = w.map(_.toString).mkString("·", "··", "·")
          merges.foreach { m =>
            sym = sym.replace(s"·${m._2}··${m._3}·", s"·${m._2}${m._3}·")
          }
          sym.stripPrefix("·").stripSuffix("·").split("··", -1).length.toLong
        }
        Some((id, words.size.toLong, subs.sum))
      }
    }.sortBy(_._1)
    assert(got.toSeq === want.toSeq,
      "joined-string separator counting diverged from per-word replay")
  }

  test("qS08 streamed band assignment equals the batch rawBandsOf " +
    "over the same arrivals AND the q251 index's arrival slice") {
    import org.apache.spark.sql.functions.{col, max}
    val docs = Corpus.read(spark, TestSpark.sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val delta = graft.operators.Relational.cdcDeltaOf(docs, maxId)
    val arrivals = delta.revised
      .select(col("doc_id"), col("lang"),
        col("new_text").as("text"))
      .unionByName(delta.inserted
        .select(col("doc_id"), col("lang"), col("text")))
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._3))
    val streamed = canon(DocumentStreams
      .lshBandedFinalized(spark, TestSpark.sf).collect())
    val batch = canon(graft.operators.Dedup.rawBandsOf(arrivals)
      .select(col("doc_id"), col("lang"),
        col("band").cast("long").as("band"), col("bkey"))
      .collect())
    assert(streamed.nonEmpty)
    assert(streamed.toSeq === batch.toSeq,
      "ingest-side banding diverged from the batch arrival leg")
    // The streamed rows ARE the maintained index's arrival slice:
    // what the ingest path appends is exactly what q251 stores.
    val arrivalIds = streamed.map(_._1).toSet
    val idxSlice = canon(graft.operators.Dedup
      .lshIndexMaintenance(spark, TestSpark.sf).collect())
      .filter(t => arrivalIds.contains(t._1))
    assert(streamed.toSeq === idxSlice.toSeq,
      "the ingest-banded rows differ from the q251-maintained index " +
        "slice for the same keys")
  }

  test("qS09 ingest admission equals the batch anti-join and both " +
    "admit/drop branches are live") {
    import org.apache.spark.sql.functions.{col, concat, lit, max, md5,
      pmod, when}
    val docs = Corpus.read(spark, TestSpark.sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val delta = graft.operators.Relational.cdcDeltaOf(docs, maxId)
    val arrivals = delta.revised
      .select(col("doc_id"), col("lang"), col("new_text").as("text"))
      .unionByName(delta.inserted.select(col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(2L)) === 0,
          concat(col("text"), lit(" [new]")))
          .otherwise(col("text")).as("text")))
    val base = docs.select(md5(col("text")).as("fp")).distinct()
    val want = arrivals
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
      .join(base, Seq("fp"), "left_anti")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getString(0)))
      .sortBy(_._1)
    val got = DocumentStreams.dedupAdmittedFinalized(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "ingest-side admission diverged from the batch anti-join")
    // Branch liveness: every revised row admitted (new content), at
    // least one re-key admitted (' [new]' content) and at least one
    // re-key dropped (verbatim base content).
    val revisedIds = delta.revised.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val rekeyedIds = delta.inserted.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val admitted = got.map(_._1).toSet
    assert(revisedIds.subsetOf(admitted))
    assert((rekeyedIds & admitted).nonEmpty, "no re-key was admitted")
    assert((rekeyedIds -- admitted).nonEmpty, "no re-key was dropped")
  }

  test("qS05 arrival classes equal q246's batch diff minus the " +
    "delete row (delete is a non-arrival)") {
    val streamGate = DocumentStreams
      .cdcClassifiedFinalized(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val batch = graft.operators.Relational
      .snapshotDiff(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(streamGate.map(_._1).toSeq === Seq("insert", "unchanged", "update"))
    assert(batch.map(_._1).contains("delete"))
    assert(streamGate.toSeq === batch.filter(_._1 != "delete").toSeq,
      "ingest-side CDC report diverged from the batch reconciliation")
  }

  test("qS10 ingest scrub equals the batch projection row-for-row " +
    "and its per-source fold equals q256's aggregate") {
    import org.apache.spark.sql.functions.{col, md5}
    val got = DocumentStreams.piiScrubbedFinalized(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val want = graft.operators.TextAnalysis
      .piiScrubProjection(Corpus.read(spark, TestSpark.sf, "documents"))
      .select(col("doc_id"), col("source"), col("e").cast("long"),
        col("p").cast("long"), col("i").cast("long"),
        md5(col("redacted")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
      .sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "ingest-side scrub diverged from the batch projection")
    // The per-source fold of the streamed rows must agree with the
    // batch gate's aggregate on counts (the fp folds differ by
    // construction: 60-bit bit_xor vs per-row md5).
    val folded = got.groupBy(_._2).map { case (s, rs) =>
      (s, rs.length.toLong, rs.map(_._3).sum, rs.map(_._4).sum,
        rs.map(_._5).sum)
    }.toSeq.sortBy(_._1)
    val agg = graft.operators.TextAnalysis.piiScrub(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(folded === agg,
      "per-source fold of streamed rows diverged from q256")
  }
}
