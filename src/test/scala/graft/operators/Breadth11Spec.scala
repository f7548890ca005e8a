package graft.operators

import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant specs for the round-11 breadth gates (QUALIFY, keyset
  * pagination, gaps-and-islands streaks, PG age() arithmetic,
  * temperature mixture, kNN join, to_char, phrase search). The
  * value-level gate is the DuckDB oracle; these pin independent
  * local replays and the plan shapes the 100 TB contract needs.
  */
class Breadth11Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("qualify keeps exactly the rows above their group mean (local replay)") {
    val rows = graft.sources.Corpus.read(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCust = rows.groupBy(_._1)
    val want = rows.filter { case (c, _, cents) =>
      val g = byCust(c)
      cents * g.length > g.map(_._3).sum
    }.map(_._2).toSet
    val got = Relational.qualifyAboveAvg(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("keyset page is the exact next page of the total order, via top-k not window") {
    val all = graft.sources.Corpus.read(spark, sf, "orders")
      .select(col("o_orderdate").cast("string"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val want = all.filter(p => p._1 > Relational.KeysetDate ||
      (p._1 == Relational.KeysetDate && p._2 > Relational.KeysetKey))
      .take(Relational.KeysetPageSize).map(_._2)
    val df = Relational.keysetPage(spark, sf)
    assert(df.collect().map(_.getLong(0)).toSeq === want.toSeq)
    // Scale shape: a predicate + global top-k — no rank window, no
    // full-sort exchange; OFFSET pagination would scan the prefix.
    assert(!df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LWindow]))
    assert(df.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "keyset page should plan as TakeOrderedAndProject")
  }

  test("longest streak matches a brute-force run scan (local replay)") {
    val days = graft.sources.Corpus.read(spark, sf, "events")
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Events.longestStreak(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === days.keySet)
    for ((u, ds) <- days) {
      // brute force: split into consecutive runs
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.nonEmpty && d == h.head + 1 =>
          (d :: h) :: t
        case (acc, d) => List(d) :: acc
      }.map(r => (r.length.toLong, r.min))
      val bestLen = runs.map(_._1).max
      val bestStart = runs.filter(_._1 == bestLen).map(_._2).min
      assert(got(u) === ((bestLen, bestStart)), s"user $u")
    }
  }

  test("age breakdown: bounds, day-count consistency, independent java.time replay") {
    val rows = Temporal.ageBreakdown(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2) = (r.getDate(2).toLocalDate, r.getDate(3).toLocalDate)
      val (y, m, d) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(y >= 0 && m >= 0 && m <= 11 && d >= 0 && d <= 30)
      assert(r.getLong(7) ===
        java.time.temporal.ChronoUnit.DAYS.between(t1, t2))
      // Independent replay of the PG field-diff + single-borrow
      // algorithm with java.time calendar data.
      var dd = t2.getDayOfMonth - t1.getDayOfMonth
      var borrow = 0
      if (dd < 0) { dd += t1.lengthOfMonth(); borrow = 1 }
      val mtot = (t2.getYear - t1.getYear) * 12 +
        (t2.getMonthValue - t1.getMonthValue) - borrow
      assert((y, m, d) === ((mtot / 12).toLong, (mtot % 12).toLong,
        dd.toLong), s"cust ${r.getLong(0)} $t1 -> $t2")
    }
  }

  test("temperature mixture: exact local replay of rates and kept set") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ratio = counts.view.mapValues(c => math.sqrt(c.toDouble) / c).toMap
    val rmax = ratio.values.max
    val want = docs.groupBy(_._2).map { case (l, ds) =>
      val rate = ratio(l) / rmax
      val kept = ds.filter { case (id, _) =>
        java.lang.Long.parseLong(md5hex(s"temp:$id").take(5), 16) <
          math.floor(rate * 1048576.0).toLong
      }
      l -> (ds.length.toLong, kept.length.toLong, kept.map(_._1).sum)
    }
    val got = Curation.temperatureMixture(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
    // α = 1/2 upweights small languages: the smallest language's
    // rate is 1 (keeps its whole bucket space).
    val smallest = counts.minBy(_._2)._1
    assert(math.floor((ratio(smallest) / rmax) * 1048576.0) === 1048576.0)
  }

  test("knn join: per-query top-k over exactly the probed-cell candidates") {
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val vecs = e.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0d
      else math.rint(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
    }
    val cents = e.filter(_._1 < 16)
    def ranked(v: Array[Double]) = cents
      .map { case (cid, ce) => (cid, cos(v, ce)) }
      .sortBy { case (cid, s) => (-s, cid) }
    val home = e.map { case (id, v) => id -> ranked(v).head._1 }.toMap
    val probes = e.map { case (id, v) =>
      id -> ranked(v).take(2).map(_._1).toSet
    }.toMap
    val got = Similarity.knnJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3)
      // candidates = vectors whose home cell is probed by q
      val cand = e.map(_._1)
        .filter(v => v != q && probes(q).contains(home(v)))
      val want = cand.map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, s) => (-s, v) }.take(3)
      assert(rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq === want.toSeq,
        s"query $q")
    }
    // the rank-limit rewrite must plan both ranks as TopKRows heaps:
    // no Window node anywhere in the optimized plan.
    val plan = Similarity.knnJoin(spark, sf).queryExecution.optimizedPlan
    assert(!plan.exists(_.isInstanceOf[LWindow]),
      "knnJoin rank should plan as TopKRows, not a Window")
    val hasTopK = plan.exists {
      case a: Aggregate => a.aggregateExpressions.exists(_.exists {
        case ae: AggregateExpression =>
          ae.aggregateFunction.isInstanceOf[graft.functions.TopKRows]
        case _ => false
      })
      case _ => false
    }
    assert(hasTopK, s"TopKRows aggregate missing:\n$plan")
  }

  test("to_char strings reconstruct their cents exactly") {
    Relational.numberFormatBattery(spark, sf).collect().foreach { r =>
      val cents = r.getLong(1)
      def digits(s: String) = s.replaceAll("[^0-9]", "").toLong
      assert(digits(r.getString(2)) === cents, "grouped")
      assert(digits(r.getString(3)) === cents, "currency")
      assert(digits(r.getString(4)) === cents, "signed")
      assert(r.getString(4).trim.startsWith("+"), "sign anchored")
      assert(digits(r.getString(5)) === cents, "zero_padded")
      assert(r.getString(5).length === 12)
      assert(r.getString(2).length === 14)
      assert(r.getString(3).length === 15)
      assert(r.getString(4).length === 15)
    }
  }

  test("phrase search counts adjacent pairs exactly (local replay)") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def count(toks: Array[String], a: String, b: String) =
      toks.sliding(2).count(p => p.length == 2 && p(0) == a && p(1) == b)
        .toLong
    val want = docs.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val na = count(toks, TextAnalysis.PhraseA._1, TextAnalysis.PhraseA._2)
      val nb = count(toks, TextAnalysis.PhraseB._1, TextAnalysis.PhraseB._2)
      (id, na, nb)
    }.filter(t => t._2 + t._3 > 0).map(t => t._1 -> ((t._2, t._3))).toMap
    val got = TextAnalysis.phraseSearch(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture phrases must match at this SF")
  }
}
