package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant specs for the round-7 breadth gates (DISTINCT ON,
  * ordered string aggregation, first-occurrence token dedup, linear
  * interpolation, JSON functions, Zipf histogram). The value-level
  * gate is the DuckDB oracle; these pin what the oracle can't state:
  * local independent replays, plan shapes, and cross-path agreement.
  */
class Breadth7Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("distinct-on keeps exactly the max-(ts,event_id) row per user") {
    val events = graft.sources.Corpus.read(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val want = events.groupBy(_._1).view.mapValues(
      _.maxBy(e => (e._2, e._3))).toMap
    val got = Relational.distinctOnLatest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.length === want.size)
    got.foreach { case (uid, ts, et, v) =>
      val w = want(uid)
      assert((ts, et, v) === ((w._2, w._4, w._5)), s"user $uid")
    }
  }

  test("distinct-on plans as a k=1 TopKRows heap, not a window sort") {
    val optimized = Relational.distinctOnLatest(spark, sf)
      .queryExecution.optimizedPlan
    val hasWindow = optimized.collectFirst {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isDefined
    assert(!hasWindow, s"rank-limit window survived:\n$optimized")
    val hasTopK = optimized.expressions.exists(_.exists {
      case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[graft.functions.TopKRows]
      case _ => false
    }) || optimized.collectFirst {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.aggregateExpressions.exists(_.exists {
            case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
              ae.aggregateFunction.isInstanceOf[graft.functions.TopKRows]
            case _ => false
          }) => a
    }.isDefined
    assert(hasTopK, s"TopKRows aggregate missing:\n$optimized")
  }

  test("ordered string_agg emits sorted distinct CSVs consistent with counts") {
    val rows = Relational.orderedStringAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    var customers = 0L
    rows.foreach { r =>
      val csv = r.getString(1).split(",").toSeq
      assert(csv === csv.sorted, s"${r.getString(0)}: not ordered")
      assert(csv.distinct === csv, s"${r.getString(0)}: duplicates")
      assert(csv.length.toLong === r.getLong(2), s"${r.getString(0)}: count")
      customers += r.getLong(3)
    }
    val nCustomers =
      graft.sources.Corpus.read(spark, sf, "customer").count()
    assert(customers === nCustomers)
  }

  test("token dedup reproduces a local first-occurrence replay") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = TextAnalysis.tokenDedup(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = docs(r.getLong(0)).split("\\s+").filter(_.nonEmpty).toSeq
      val dedup = toks.distinct // Scala distinct = first occurrence
      assert(r.getLong(1) === toks.length.toLong)
      assert(r.getLong(2) === dedup.length.toLong)
      assert(r.getString(4) === md5hex(dedup.mkString(" ")), s"doc ${r.getLong(0)}")
    }
  }

  test("interpolation is exact-rational and collinear between brackets") {
    val rows = Temporal.interpolateHourly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.exists(_._3 == "gap"), "fixture has no gaps to interpolate")
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, urows) =>
      val sorted = urows.sortBy(_._2)
      // Grid endpoints observed by construction.
      assert(sorted.head._3 === "obs")
      assert(sorted.last._3 === "obs")
      val obs = sorted.filter(_._3 == "obs")
      sorted.filter(_._3 == "gap").foreach { case (_, h, _, num, den, micro) =>
        val (hp, vp) = obs.filter(_._2 < h).maxBy(_._2) match {
          case o => (o._2, o._4)
        }
        val (hn, vn) = obs.filter(_._2 > h).minBy(_._2) match {
          case o => (o._2, o._4)
        }
        assert(den === hn - hp, s"h=$h")
        assert(num === vp * (hn - h) + vn * (h - hp), s"h=$h")
        assert(micro === num * 10000L / den, s"h=$h")
      }
      obs.foreach { case (_, h, _, num, den, micro) =>
        assert(den === 1L, s"h=$h")
        assert(micro === num * 10000L, s"h=$h")
      }
    }
  }

  test("json funcs: both parse paths agree and to_json bytes replay locally") {
    val events = graft.sources.Corpus.read(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("props"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
    val got = Relational.jsonFuncs(spark, sf).collect()
    assert(got.length === events.size)
    got.foreach { r =>
      val (uid, et, props) = events(r.getLong(0))
      val k = """"k":\s*(\d+)""".r.findFirstMatchIn(props).get.group(1).toLong
      assert(r.getLong(1) === k)
      assert(r.getLong(2) === 0L, s"parse paths disagree on ${r.getLong(0)}")
      val wantJson = s"""{"uid":$uid,"et":"$et","k":$k}"""
      assert(r.getString(3) === md5hex(wantJson), s"event ${r.getLong(0)}")
    }
  }

  test("zipf histogram partitions the vocabulary exactly by floor(log2)") {
    val counts = graft.sources.Corpus.read(spark, sf, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy(col("t")).count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val wantBuckets = counts.groupBy { case (_, c) =>
      63 - java.lang.Long.numberOfLeadingZeros(c)
    }.map { case (b, ts) =>
      b.toLong -> ((ts.length.toLong, ts.map(_._2).sum))
    }
    val got = TextAnalysis.zipfHistogram(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === wantBuckets)
    assert(got.values.map(_._2).sum === counts.map(_._2).sum)
  }
}
