package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-18 breadth: the VARIANT semi-structured census (q259). */
class Breadth18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q259 variant census: schema groups partition the corpus and " +
    "every typed aggregate replays from the drift arithmetic") {
    val out = Relational.variantShred(spark, sf).collect()
    val ev = graft.sources.Corpus.read(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(out.map(_.getLong(1)).sum === ev.length.toLong)
    // In-JVM replay of the drift branches → expected census.
    case class Agg(var n: Long = 0, var sumUid: Long = 0,
      var nValue: Long = 0, var sumValue: Long = 0, var nCodeStr: Long = 0,
      var nTag2: Long = 0, var nNoteNull: Long = 0,
      var firstTag: Option[String] = None)
    val exp = collection.mutable.Map.empty[String, Agg]
    ev.foreach { case (eid, uid, tpe, v) =>
      val noValue = eid % 7 == 0
      val codeStr = eid % 5 == 0
      val hasTags = eid % 3 == 0
      val hasNote = eid % 4 == 0
      val schema = "OBJECT<code: " + (if (codeStr) "STRING" else "BIGINT") +
        ", id: BIGINT" + (if (hasNote) ", note: VOID" else "") +
        (if (hasTags) ", tags: ARRAY<STRING>" else "") +
        ", user: OBJECT<tier: STRING, uid: BIGINT>" +
        (if (noValue) "" else ", value: BIGINT") + ">"
      val a = exp.getOrElseUpdate(schema, Agg())
      a.n += 1
      a.sumUid += uid
      if (!noValue) {
        a.nValue += 1
        a.sumValue += math.round(v * 100)
      }
      if (codeStr) a.nCodeStr += 1
      if (hasTags) {
        a.nTag2 += 1
        val t0 = tpe
        a.firstTag = Some(a.firstTag.fold(t0)(x => if (x <= t0) x else t0))
      }
      if (hasNote) a.nNoteNull += 1
    }
    assert(out.length === exp.size, "schema group count drifted")
    out.foreach { r =>
      val a = exp(r.getString(0))
      assert(r.getLong(1) === a.n, s"n in ${r.getString(0)}")
      assert(r.getLong(2) === a.sumUid, s"sum_uid in ${r.getString(0)}")
      assert(r.getLong(3) === a.nValue)
      assert((if (r.isNullAt(4)) 0L else r.getLong(4)) === a.sumValue)
      assert(r.getLong(5) === a.nCodeStr)
      assert(r.getLong(6) === a.nTag2)
      assert(r.getLong(7) === a.nNoteNull)
      assert(Option(r.getString(8)) === a.firstTag)
    }
    // Drift axes all live: some group with tags, some without; a
    // string-code group and a numeric-code one; a missing-value
    // group; an explicit-null group.
    assert(out.exists(_.getString(0).contains("tags")))
    assert(out.exists(!_.getString(0).contains("tags")))
    assert(out.exists(_.getString(0).contains("code: STRING")))
    assert(out.exists(_.getString(0).contains("code: BIGINT")))
    assert(out.exists(!_.getString(0).contains("value")))
    assert(out.exists(_.getString(0).contains("note: VOID")))
  }

  test("qS11 stream == batch: the streamed variant shredding equals " +
    "the shared projection run in batch, row for row") {
    val streamed = graft.streaming.EventStreams
      .variantShreddedFinalized(spark, sf).collect()
    val batch = Relational.variantShredProjection(
        graft.sources.Corpus.read(spark, sf, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value")))
      .orderBy(col("event_id")).collect()
    assert(streamed.length === batch.length && streamed.nonEmpty)
    streamed.zip(batch).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, s"row drift at ${a.get(0)}")
    }
    // The census (q259) is exactly the downstream aggregate of this
    // row grain: group counts agree.
    val censusN = Relational.variantShred(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val fromRows = streamed.groupBy(_.getString(1))
      .view.mapValues(_.length.toLong).toMap
    assert(fromRows === censusN)
  }
}
