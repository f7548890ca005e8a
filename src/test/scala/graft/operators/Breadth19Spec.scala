package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimeType, VariantType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Corpus

/** Round-19 breadth: the theta warehouse roll-up (q260), the VARIANT
  * shredded write path (q261), and the native TIME(6) gate (q262).
  */
class Breadth19Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q260 theta roll-up: both sketch implementations' weekly " +
    "estimates equal the exact weekly twin; bands hold") {
    val out = Events.thetaWeeklyRollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_nd")
      assert(r.getAs[Long]("nat_weekly") === exact,
        s"native theta_union_agg drifted in exact mode (week ${r.get(0)})")
      assert(r.getAs[Long]("hi_weekly") === exact,
        s"KMV k=4096 roll-up drifted while unsaturated (week ${r.get(0)})")
      assert(r.getAs[Long]("lo_in_band") === 1L)
      assert(r.getAs[Long]("n_days") >= 1L &&
        r.getAs[Long]("n_days") <= 7L)
    }
  }

  test("q261 write-path audit: the files on disk carry the raw " +
    "VARIANT column plus the typed shred, one row per event, and " +
    "the operator's identity bits all pin at group size") {
    val (path, report) = Relational.variantShredWriteCore(spark, sf)
    val rep = report.collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val n = r.getAs[Long]("n")
      Seq("n_match_uid", "n_match_value", "n_match_code",
        "n_match_tag2", "n_match_note", "n_match_schema").foreach { c =>
        assert(r.getAs[Long](c) === n,
          s"$c != n for schema ${r.getString(0)}")
      }
      assert(r.getAs[Long]("sum_uid_stored") ===
        r.getAs[Long]("sum_uid_reparsed"))
    }
    // Independent file read: schema contract + row conservation.
    val stored = spark.read.parquet(path)
    assert(stored.schema("v").dataType === VariantType)
    assert(stored.schema("uid").dataType === LongType)
    val nEvents = Corpus.read(spark, sf, "events").count()
    assert(stored.count() === nEvents,
      "shredded table must carry exactly one row per event")
    assert(rep.map(_.getAs[Long]("n")).sum === nEvents,
      "schema census must partition the corpus")
  }

  test("TIME ± INTERVAL is STRICT (no midnight wrap — DATETIME_OVERFLOW), " +
    "in-range arithmetic and time_diff agree with integer µs twins") {
    val ss = spark
    // In-range arithmetic: values match pure integer µs math.
    val r = ss.sql(
      "SELECT TIME'12:00:00.5' + INTERVAL '0 01:02:03.25' DAY TO SECOND AS a, " +
        "TIME'12:00:00.5' - INTERVAL '45' MINUTE AS s, " +
        "time_diff('MINUTE', TIME'12:00:00', TIME'13:30:00') AS d")
      .collect()(0)
    assert(r.getAs[java.time.LocalTime]("a") ===
      java.time.LocalTime.ofNanoOfDay(
        ((12L * 3600 + 3723) * 1000000L + 750000L) * 1000))
    assert(r.getAs[java.time.LocalTime]("s") ===
      java.time.LocalTime.of(11, 15, 0, 500000000))
    assert(r.getAs[Long]("d") === 90L)
    // The boundary CONTRACT: Spark's TIME is a strict time-of-day —
    // crossing midnight in either direction raises rather than
    // wrapping (unlike PG, which wraps modulo 24 h; any delegation
    // parity must therefore stay in-range).
    Seq("SELECT TIME'23:30:00' + INTERVAL '45' MINUTE",
      "SELECT TIME'00:30:00' - INTERVAL '45' MINUTE").foreach { q =>
      val e = intercept[Exception](ss.sql(q).collect())
      assert(e.getMessage.contains("DATETIME_OVERFLOW"),
        s"expected strict overflow for: $q")
    }
  }

  test("qS12 stream == batch: the streamed TIME profiling equals the " +
    "shared projection run in batch, row for row") {
    val streamed = graft.streaming.EventStreams
      .timeProfiledFinalized(spark, sf).collect()
    val batch = Events.timeOfDayProjection(
      spark.read.parquet(s"$sf/events.parquet")
        .select(col("event_id"),
          col("ts").cast("timestamp_ntz").as("ts")))
      .orderBy(col("event_id")).collect()
    assert(streamed.length === batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.toSeq === b.toSeq,
        s"row drift at event ${s.get(0)}")
    }
    // The streamed files really carry TIME(6) columns.
    val first = streamed.head
    assert(first.getAs[java.time.LocalTime]("t") != null ||
      first.isNullAt(first.fieldIndex("t")))
  }

  test("q263 physical audit: the default-write files carry the Parquet " +
    "variant-shredding layout (typed_value), the binary twin doesn't, " +
    "variant_get over the shredded table scans a TYPED schema, and " +
    "every census pair agrees") {
    val (plain, shred, report) =
      Relational.variantNativeShredCore(spark, sf)
    val rep = report.collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      Seq("n", "sum_uid", "n_value", "sum_value", "n_code_str",
        "n_tag2", "n_note_null").foreach { c =>
        // Raw-object compare: sum over an all-null group is NULL on
        // both sides (the absent-value schema), and getAs[Long]
        // would unbox it asymmetrically.
        val sh = r.get(r.fieldIndex(s"${c}_sh"))
        val pl = r.get(r.fieldIndex(s"${c}_pl"))
        assert(sh === pl,
          s"$c drifted between layouts for schema ${r.getString(0)}")
      }
    }
    // Physical proof: the shredded footer names typed_value columns
    // (the public Parquet variant-shredding layout); the binary twin
    // must not. (pyarrow cannot parse the new logical type — byte
    // inspection is the honest check.)
    def hasTypedValue(dir: String): Boolean =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).exists { f =>
          new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.ISO_8859_1)
            .contains("typed_value")
        }
    assert(hasTypedValue(shred), "shredded leg wrote no typed_value " +
      "subcolumns — native shredding silently off?")
    assert(!hasTypedValue(plain), "binary twin unexpectedly shredded")
    // Plan proof: pushVariantIntoScan rewrites the extraction into a
    // typed subcolumn read — the scan schema is a STRUCT, not the
    // full binary variant.
    val pushed = spark.read.parquet(shred)
      .selectExpr("variant_get(v, '$.user.uid', 'bigint') AS uid")
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<v:struct"),
      s"variant_get not pushed into the scan:\n${plan.take(600)}")
  }

  test("q262 native TIME gate: TIME-typed output schema, and every " +
    "native-vs-twin pin holds row-for-row") {
    val df = Events.timeOfDayProfile(spark, sf)
    assert(df.schema("hour_t").dataType === TimeType(6))
    assert(df.schema("min_t").dataType === TimeType(6))
    assert(df.schema("max_t").dataType === TimeType(6))
    val out = df.collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("min_us_nat") === r.getAs[Long]("min_us"),
        "TIME->DECIMAL micros drifted from the integer twin")
      assert(r.getAs[Long]("sec_us_nat") === r.getAs[Long]("sec_us"),
        "extract(SECOND) micros drifted from the integer twin")
      assert(r.getAs[Long]("n_recon") === r.getAs[Long]("n"),
        "make_time reconstruction failed for some row")
      // The truncated hour bucket really is the floor of min_t.
      val hour = r.getAs[java.time.LocalTime]("hour_t")
      val mn = r.getAs[java.time.LocalTime]("min_t")
      val mx = r.getAs[java.time.LocalTime]("max_t")
      assert(hour.getMinute === 0 && hour.getSecond === 0)
      assert(!mn.isBefore(hour) && !mx.isBefore(mn))
      assert(mn.getHour === hour.getHour && mx.getHour === hour.getHour)
    }
  }
}
