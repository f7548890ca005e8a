package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Events
import graft.sources.Corpus

/** Structured-Streaming parity: the same windowed aggregations run in
  * batch ([[graft.operators.Events]]) and as a stream with a
  * watermark, and the results must line up — Spark's unified engine
  * makes this an actual invariant, and this spec pins it.
  *
  * The finite events file is split into several files streamed one
  * per micro-batch so the watermark actually advances between batches
  * (a single batch would emit nothing in append mode).
  */
class EventStreamsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** events split into 4 parquet files with the raw nanos-long ts,
    * matching EventStreams.eventSchema.
    */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("evstream").toString + "/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .repartition(4)
      .write.mode("overwrite").parquet(dir)
    dir.stripSuffix("/events.parquet")
  }

  test("streaming tumbling counts equal the batch operator") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "tumbling_mem", OutputMode.Complete())
    try {
      val streamed = spark.table("tumbling_mem")
        .select(col("wstart").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toSeq).toSet
      val batch = Events.tumbling(spark, TestSpark.sf)
        .select(col("wstart").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming daily sketches equal the batch dailies bit-for-bit") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.dailyActiveSketches(stream), "dailysk_mem",
      OutputMode.Complete())
    try {
      val streamed = spark.table("dailysk_mem")
        .select(col("day").cast("string"), col("est_users"),
          col("n_events"))
        .collect().map(_.toSeq).toSet
      val batch = graft.sources.Corpus.events(spark, TestSpark.sf)
        .groupBy(window(col("ts"), "1 day").as("w"))
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
          .as("est_users"),
          count(lit(1)).as("n_events"))
        .select(col("w.start").cast("string"), col("est_users"),
          col("n_events"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming anomaly flags equal the batch window for every " +
    "finalized event") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.anomaliesWithState(stream).toDF(), "anom_mem",
      OutputMode.Append())
    try {
      val streamed = spark.table("anom_mem")
        .select("event_id", "user_id", "x", "n_w", "anom")
        .collect().map(_.toSeq).toSet
      // Final watermark after AvailableNow = max event time − 2h;
      // only events at/below it finalize (the sessionizer contract).
      val ev = graft.sources.Corpus.events(spark, TestSpark.sf)
      val wmUs = ev.agg(expr("max(unix_micros(cast(ts as timestamp)))"))
        .head().getLong(0) - 2L * 3600L * 1000000L
      val batch = Events.rollingAnomalies(spark, TestSpark.sf)
        .filter(col("us") <= wmUs)
        .select("event_id", "user_id", "x", "n_w", "anom")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      assert(streamed.exists(_.last == 1L),
        "no anomaly fired — the 2σ flag is vacuous on this fixture")
    } finally q.stop()
  }

  test("streaming writes to a parquet file sink with checkpointing") {
    val out = Files.createTempDirectory("evsink").toString
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    val written = spark.read.parquet(s"$out/data")
      .select(col("wstart").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    val batch = Events.tumbling(spark, TestSpark.sf)
      .select(col("wstart").cast("string"), col("event_type"), col("n"))
      .collect().map(_.toSeq).toSet
    // Append mode emits watermark-finalized windows only — subset.
    assert(written.nonEmpty)
    assert(written.subsetOf(batch), written.diff(batch).take(3).toString)
  }

  test("streaming dedup drops replayed events within the watermark") {
    // Duplicate every file so the source replays each event twice.
    val dir = Files.createTempDirectory("evdup").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    raw.union(raw).repartition(4)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val q = EventStreams.runToMemory(
      EventStreams.dedupedEvents(EventStreams.readEventStream(spark, dir)),
      "dedup_mem", OutputMode.Append())
    try {
      val n = spark.table("dedup_mem").count()
      val distinct = raw.select("event_id").distinct().count()
      assert(n === distinct,
        s"expected $distinct deduped events, got $n from a 2x-replayed source")
    } finally q.stop()
  }

  test("checkpointed query resumes exactly-once over new files") {
    val base = Files.createTempDirectory("evresume").toString
    val srcDir = s"$base/src/events.parquet"
    val outDir = s"$base/out"
    val chkDir = s"$base/chk"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val Array(first, second) = raw.randomSplit(Array(0.5, 0.5), seed = 7)

    def runOnce(): Unit = {
      val q = EventStreams.readEventStream(spark, s"$base/src")
        .select(col("event_id"), col("user_id"), col("ts"))
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q.stop()
    }

    first.write.mode("overwrite").parquet(srcDir)
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === first.count())
    // New files arrive; the restarted query must process ONLY them.
    second.write.mode("append").parquet(srcDir)
    runOnce()
    val out = spark.read.parquet(outDir)
    assert(out.count() === raw.count(),
      "resume must process exactly the new files, no replays or gaps")
    assert(out.select("event_id").distinct().count() === raw.count())
  }

  test("streaming sliding counts equal the batch operator") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.slidingCounts(stream), "sliding_mem", OutputMode.Complete())
    try {
      val streamed = spark.table("sliding_mem")
        .select(col("wstart").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toSeq).toSet
      val batch = Events.sliding(spark, TestSpark.sf)
        .select(col("wstart").cast("string"), col("event_type"), col("n"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment aggregates on the joined column") {
    val dim = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .select(col("event_type")).distinct()
      .withColumn("category", substring(col("event_type"), 1, 1))
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.enrichedCounts(stream, dim), "enriched_mem",
      OutputMode.Complete())
    try {
      val streamed = spark.table("enriched_mem")
        .select(col("wstart").cast("string"), col("category"), col("n"))
        .collect().map(_.toSeq).toSet
      val batch = Events.tumbling(spark, TestSpark.sf)
        .join(dim, Seq("event_type"))
        .groupBy(col("wstart"), col("category"))
        .agg(sum(col("n")).as("n"))
        .select(col("wstart").cast("string"), col("category"), col("n"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-stream time-bounded join matches the batch join") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.joinedNearbyEvents(stream), "ssjoin_mem", OutputMode.Append())
    try {
      val streamed = spark.table("ssjoin_mem")
        .collect().map(_.toSeq).toSet
      val ev = Corpus.read(spark, TestSpark.sf, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      val r = ev.filter(col("event_id") % 2 === 1)
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("event_id").as("r_id"))
      val batch = l.join(r,
          col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 10 minutes"))
        .select(col("user_id"), col("l_id"), col("r_id"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"stream-stream join emitted pairs absent from batch: ${streamed.diff(batch).take(3)}")
      assert(streamed.size > batch.size / 2,
        s"only ${streamed.size} of ${batch.size} joined pairs emitted")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join: matches agree with batch, " +
    "null rows only for genuinely unmatched left events") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.leftJoinedNearbyEvents(stream), "ssleft_mem",
      OutputMode.Append())
    try {
      val streamed = spark.table("ssleft_mem").collect()
      val ev = Corpus.read(spark, TestSpark.sf, "events")
      val l = ev.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_id"))
      val r = ev.filter(col("event_id") % 2 === 1)
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("event_id").as("r_id"))
      val batchPairs = l.join(r,
          col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") <= col("l_ts") + expr("INTERVAL 10 minutes"))
        .select(col("l_id"), col("r_id"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val matchedLeft = batchPairs.map(_._1)
      val matched = streamed.filter(!_.isNullAt(2))
        .map(x => (x.getLong(1), x.getLong(2))).toSet
      val nullRows = streamed.filter(_.isNullAt(2)).map(_.getLong(1)).toSet
      assert(matched.nonEmpty && matched.subsetOf(batchPairs),
        s"outer join emitted pairs absent from batch: ${matched.diff(batchPairs).take(3)}")
      // A null row asserts "no match can ever arrive" — it must never
      // name a left event the batch join DOES match.
      assert(nullRows.intersect(matchedLeft).isEmpty,
        s"null emitted for matched left ids: ${nullRows.intersect(matchedLeft).take(3)}")
      assert(nullRows.nonEmpty,
        "watermark never finalized any unmatched left event")
      // Exactly-once per emitted left id on the null side.
      val dupNulls = streamed.filter(_.isNullAt(2)).map(_.getLong(1))
        .groupBy(identity).filter(_._2.length > 1)
      assert(dupNulls.isEmpty, s"duplicate null rows: ${dupNulls.keys.take(3)}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer agrees with the batch sessions") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.sessionizeWithState(stream).toDF(),
      "sessions_state_mem", OutputMode.Append())
    try {
      val streamed = spark.table("sessions_state_mem")
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(_.toSeq).toSet
      val batch = Events.sessions(spark, TestSpark.sf)
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(_.toSeq).toSet
      assert(streamed.nonEmpty, "watermark never completed any session")
      assert(streamed.subsetOf(batch),
        s"stateful sessions disagree with batch: ${streamed.diff(batch).take(3)}")
      // The watermark-buffer pattern must emit every session whose end
      // is provably complete — compare counts against the same filter
      // on the batch result is environment-timing dependent, but at
      // minimum the bulk of a month of events vs a 2h watermark
      // horizon must be present.
      assert(streamed.size > batch.size / 2,
        s"only ${streamed.size} of ${batch.size} sessions emitted")
    } finally q.stop()
  }

  test("streaming session windows are a prefix of the batch sessions") {
    val stream = EventStreams.readEventStream(spark, streamDir)
    val q = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream), "sessions_mem", OutputMode.Append())
    try {
      val streamed = spark.table("sessions_mem")
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(_.toSeq).toSet
      val batch = Events.sessions(spark, TestSpark.sf)
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(_.toSeq).toSet
      // Append mode only emits sessions finalized by the watermark, so
      // the stream result is a (non-empty, given a month of events vs
      // a 2h watermark) subset of the batch result.
      assert(streamed.nonEmpty, "watermark never finalized any session")
      assert(streamed.subsetOf(batch),
        s"streamed sessions not found in batch: ${streamed.diff(batch).take(3)}")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped, never double-counted") {
    // Two micro-batches (one file each): batch 1 covers hours 0-5, so
    // the 2h watermark closes window [0,1) at 3h and append mode
    // emits its count. Batch 2 replays an event back at hour 0 (past
    // the watermark -> must be DROPPED) plus a fresh hour-6 event
    // (advances the watermark so more windows close). The closed
    // window must appear exactly once, with only its on-time count —
    // a second row or n=2 would mean the late row leaked into state.
    val dir = Files.createTempDirectory("evlate").toString
    val evDir = s"$dir/events.parquet"
    val baseUs = 1706745600000000L // 2024-02-01T00:00:00Z
    val hourUs = 3600000000L
    def writeFile(rows: Seq[(Long, Long)]): Unit = {
      import org.apache.spark.sql.Row
      val data = rows.map { case (id, us) =>
        Row(id, us * 1000L, 1L, "view", 1.0, "{}")
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), EventStreams.eventSchema)
        .write.mode("append").parquet(evDir)
    }
    // Two RUNS against one checkpoint (the resume pattern below) so
    // the batch boundary — and therefore the watermark the second
    // batch sees — is deterministic: AvailableNow in a single run may
    // coalesce both files into one micro-batch.
    val outDir = s"$dir/out"
    val chkDir = s"$dir/chk"
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(EventStreams.eventSchema)
        .parquet(evDir)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val q = EventStreams.tumblingCounts(stream)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", chkDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(); q.stop()
    }
    writeFile((0L to 5L).map(h => (h, baseUs + h * hourUs)))
    runOnce() // watermark now 3h: window [0,1) closed and emitted
    writeFile(Seq((100L, baseUs), (101L, baseUs + 6 * hourUs)))
    runOnce() // late h0 row is behind the restored watermark
    val out = spark.read.parquet(outDir)
      .select(col("wstart").cast("string"), col("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val w0 = out.filter(_._1 == "2024-02-01 00:00:00")
    assert(w0.length === 1,
      s"window 0 must emit exactly once, got: ${out.toSeq}")
    assert(w0.head._2 === 1L,
      s"late replay inflated the closed window: ${out.toSeq}")
  }

  test("stream over an empty source directory starts cleanly") {
    // A stream may be wired up before the producer writes its first
    // file; the schema sniff must fall back to the default (nanos
    // long) instead of failing at construction. (The file source
    // itself still requires the directory to exist — that part is
    // Spark's contract, not the sniff's.)
    val dir = Files.createTempDirectory("evempty").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = EventStreams.readEventStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("a micros-encoded long ts column is detected, not divided again") {
    // Same schema shape (plain INT64 ts) but micros-since-epoch
    // magnitude (~1.7e15): the sampled-magnitude check must skip the
    // nanos ÷1000 and land on the written instant exactly.
    val dir = Files.createTempDirectory("evmicros").toString
    val baseUs = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
      .getTime * 1000L
    spark.range(1).select(
      lit(1L).as("event_id"), lit(baseUs).as("ts"),
      lit(7L).as("user_id"), lit("view").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val stream = EventStreams.readEventStream(spark, dir)
    val q = EventStreams.runToMemory(
      stream.select(col("ts").cast("string").as("s")),
      "micros_mem", OutputMode.Append())
    try {
      val got = spark.table("micros_mem").collect().map(_.getString(0))
      assert(got.toSeq === Seq("2024-02-01 00:00:00"))
    } finally q.stop()
  }
}
