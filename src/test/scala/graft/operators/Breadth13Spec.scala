package graft.operators

import org.apache.spark.sql.functions.{col, expr, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant specs for the round-13 breadth gates. The value-level
  * gate is the DuckDB oracle; these pin independent local replays and
  * the policy discriminations.
  */
class Breadth13Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("bm25: engine top-k matches an independent in-JVM replay and " +
    "length normalization genuinely reorders tf-idf") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val terms = TextAnalysis.SearchTerms
    def toks(s: String): Array[String] =
      "\\S+".r.findAllIn(s).toArray
    val profile = docs.map { case (id, text) =>
      val t = toks(text)
      (id, terms.map(q => t.count(_ == q).toLong), t.length.toLong)
    }
    val n = profile.length.toDouble
    val dfv = terms.indices.map(i => profile.count(_._2(i) > 0).toDouble)
    val avgdl = profile.map(_._3).sum.toDouble / n
    val k1 = 1.2; val b = 0.75
    def score(tfs: Seq[Long], dl: Long): Double =
      terms.indices.map { i =>
        val tf = tfs(i).toDouble
        val idf = math.log(1.0 + (n - dfv(i) + 0.5) / (dfv(i) + 0.5))
        idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))
      }.sum
    val expected = profile
      .filter(_._2.sum > 0)
      .map { case (id, tfs, dl) => (id, score(tfs, dl)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(10)

    val out = TextAnalysis.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(5)))
    assert(out.map(_._1).toSeq === expected.map(_._1).toSeq)
    out.zip(expected).foreach { case ((_, got), (_, exp)) =>
      assert(math.abs(got - exp) < 1e-6)
    }

    // Discrimination: the dl term must do real work — BM25's ranking
    // differs from plain tf-idf's (q130) on this corpus, otherwise the
    // gate would not distinguish the scoring functions.
    val tfidf = TextAnalysis.rankedSearch(spark, sf).collect()
      .map(_.getLong(0)).toSeq
    assert(out.map(_._1).toSeq !== tfidf,
      "BM25 and tf-idf ranked identically — fixture does not " +
        "exercise length normalization")
  }

  test("sq ann: full in-JVM replay of quantize/dot/rerank and " +
    "candidate recall vs the exact brute force") {
    val vecs = graft.sources.Corpus.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val quant = vecs.map { case (id, v) =>
      val scale = v.map(x => math.abs(x)).max.toDouble / 127.0
      val codes =
        if (scale == 0) v.map(_ => 0L)
        else v.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
      (id, v, scale, codes)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val queries = quant.filter(_._1 < 20)
    val expected = queries.flatMap { case (qid, qv, qs, qc) =>
      val cands = quant.filter(_._1 != qid).map { case (id, dv, ds, dc) =>
        val qdot = qc.zip(dc).map { case (x, y) => x * y }.sum
        (id, dv, qdot, r6(qdot.toDouble * qs * ds))
      }.sortBy { case (id, _, _, ap) => (-ap, id) }.take(20)
      cands.map { case (id, dv, qdot, ap) =>
        (qid, id, qdot, ap, r6(cos(qv, dv)))
      }.sortBy { case (_, id, _, _, sim) => (-sim, id) }.take(5)
        .zipWithIndex
        .map { case ((q, id, qdot, ap, sim), i) =>
          (q, (i + 1).toLong, id, qdot, ap, sim) }
    }.sortBy(t => (t._1, t._2))
    val out = Similarity.sqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (got, exp) =>
      assert(got._1 === exp._1); assert(got._2 === exp._2)
      assert(got._3 === exp._3, s"neighbor mismatch at ${got._1}/${got._2}")
      assert(got._4 === exp._4, "integer code dot mismatch")
      assert(math.abs(got._5 - exp._5) < 2e-6)
      assert(math.abs(got._6 - exp._6) < 2e-6)
    }

    // Quality claim: exact re-rank over int8-scanned candidates
    // recovers (nearly) the float-exact top-5 — candidate loss is the
    // only error source, and 20 candidates for k=5 absorb it.
    val brute = Similarity.bruteTopK(spark, sf, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sq = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      sq(q).intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"SQ8 candidate recall fell to $mean")
  }

  test("sliding sketch actives: exact twin replays in-JVM and the " +
    "windowed union is lossless vs a one-pass window sketch") {
    import java.sql.Date
    val ev = graft.sources.Corpus.events(spark, sf)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val byDay = ev.toSet
    val days = byDay.map(_._1).toSeq.sorted
    val out = Events.slidingSketchActives(spark, sf).collect()
    assert(out.map(_.getDate(0).toLocalDate).toSeq === days)
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val inWin = byDay.filter { case (dd, _) =>
        !dd.isBefore(d.minusDays(6)) && !dd.isAfter(d) }
      val exactUsers = inWin.map(_._2).toSet.size.toLong
      assert(r.getLong(1) === inWin.map(_._1).toSet.size.toLong, s"n_days at $d")
      assert(r.getLong(2) === exactUsers, s"exact_users at $d")
      val slack = exactUsers * 5 / 100 + 1
      assert(r.getLong(3) === exactUsers - slack)
      assert(r.getLong(4) === exactUsers + slack)
      assert(r.getLong(5) === 1L, s"sketch left the ±5% band at $d")
    }

    // Losslessness of re-aggregation on the WINDOWED path (the q166
    // union≡one-pass pin, per trailing window): unioning the daily
    // sketches of a window gives the bit-identical estimate to one
    // sketch built directly over the window's raw events.
    val s = spark
    graft.sources.Corpus.events(s, sf)
      .selectExpr("CAST(ts AS DATE) AS day", "user_id")
      .createOrReplaceTempView("sk_ev")
    val viaDaily = s.sql(
      """SELECT d.d AS day,
        |  hll_sketch_estimate(hll_union_agg(sk)) AS est
        |FROM (SELECT day, hll_sketch_agg(user_id, 12) AS sk
        |      FROM sk_ev GROUP BY day) daily
        |JOIN (SELECT DISTINCT day AS d FROM sk_ev) d
        |  ON daily.day BETWEEN d.d - 6 AND d.d
        |GROUP BY d.d""".stripMargin).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val onePass = s.sql(
      """SELECT d.d AS day,
        |  hll_sketch_estimate(hll_sketch_agg(user_id, 12)) AS est
        |FROM sk_ev JOIN (SELECT DISTINCT day AS d FROM sk_ev) d
        |  ON sk_ev.day BETWEEN d.d - 6 AND d.d
        |GROUP BY d.d""".stripMargin).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    assert(viaDaily === onePass,
      "daily-sketch union diverged from the one-pass window sketch")
  }

  test("unicode battery: flags hold, kernels agree across eval/SQL " +
    "paths, and non-decomposable letters pass through the fold") {
    val out = Relational.unicodeBattery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + 6,
        "exactly the 6 combining marks must compose away")
      assert(r.getLong(3) === 1L, "NFC(decomposed) != precomposed")
      assert(r.getLong(6) === 1L, "accent fold missed")
    }

    // Kernel contracts via the SQL front door (the injected
    // registrations), plus the java.text.Normalizer edge semantics:
    // idempotence, and NON-decomposable letterforms passing through
    // the fold unchanged (o-slash, l-stroke have no canonical
    // decomposition — both engines keep them).
    val row = spark.sql(
      """SELECT nfc_normalize('Café') AS c,
        |  nfc_normalize(nfc_normalize('Café')) AS c2,
        |  strip_accents('ø ł Müller') AS f
        |""".stripMargin).collect().head
    assert(row.getString(0) === "Café")
    assert(row.getString(1) === "Café")
    assert(row.getString(2) === "ø ł Muller")
  }

  test("cluster topics: lift ranking replays in-JVM over the " +
    "engine's own cell assignment") {
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
    val cells = Similarity.cellAssignmentsFor(e,
      Similarity.trainedCentroids(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docTerms = docs.flatMap { case (id, text) =>
      "\\S+".r.findAllIn(text).toSet[String].map(t => (id, t))
    }
    val nd = docs.length.toLong
    val cCorp = docTerms.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nCell = cells.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = docTerms
      .flatMap { case (id, t) => cells.get(id).map(c => (c, t)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .collect { case ((c, t), cCell)
          if cCell >= Similarity.TopicMinSupport =>
        (c, t, cCell, nCell(c), cCorp(t),
          cCell * nd * 1000000L / (nCell(c) * cCorp(t)))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, t, _, _, _, lift) => (-lift, t) }.take(3)
          .zipWithIndex.map { case ((c, t, cc, ncl, ccp, lift), i) =>
            (c, (i + 1).toLong, t, cc, ncl, ccp, lift) }
      }.sortBy(t => (t._1, t._2))
    val out = Similarity.clusterTopicTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(out === expected)
    // Real signal: at least one cell's top term is above corpus rate.
    assert(out.exists(_._7 > 1000000L),
      "no cell had a term above its corpus rate — labeling is vacuous")
  }

  test("similar-to: translation rules, escape literalness, and every " +
    "flag discriminates on the corpus") {
    assert(Relational.similarToRegex("a%b_c") === "^(?:a.*b.c)$")
    assert(Relational.similarToRegex("x[%_]y") === "^(?:x[%_]y)$",
      "wildcards inside a character class must stay literal")
    assert(Relational.similarToRegex("\\s%") === "^(?:\\Qs\\E.*)$",
      "escaped regex-class letters must be literal, not classes")
    assert(Relational.similarToRegex("(a|b){2}%") === "^(?:(a|b){2}.*)$")
    assert("sales".matches(Relational.similarToRegex("\\s%")))
    assert(!" ales".matches(Relational.similarToRegex("\\s%")),
      "\\s must mean literal 's', not whitespace")

    // JVM truth replay of one pattern over the corpus + all flags live.
    val out = Relational.similarToBattery(spark, sf).collect()
    val names = graft.sources.Corpus.read(spark, sf, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val re = Relational.similarToRegex("%r_d%")
    out.foreach { r =>
      assert(r.getLong(2) === (if (names(r.getLong(0)).matches(re)) 1L
        else 0L))
    }
    (1 to 5).foreach { i =>
      val vals = out.map(_.getLong(i)).toSet
      assert(vals === Set(0L, 1L), s"flag $i not discriminating: $vals")
    }
  }

  test("char quality: full in-JVM replay; collision entropy flags " +
    "padding and orders real text sensibly") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = docs.map { case (id, text) =>
      val counts = text.groupBy(identity).view.mapValues(_.length.toLong)
      val n = text.length.toLong
      val sumSq = counts.values.map(c => c * c).sum
      val top = counts.values.max
      (id, n, counts.size.toLong, top, top * 1000000L / n, sumSq,
        r6(math.log(n.toDouble * n / sumSq) / math.log(2.0)))
    }.sortBy(_._1)
    val out = TextAnalysis.charQuality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (got, exp) =>
      assert(got._1 === exp._1)
      assert(got._2 === exp._2, s"n_chars at doc ${got._1}")
      assert(got._3 === exp._3, s"alphabet at doc ${got._1}")
      assert(got._4 === exp._4); assert(got._5 === exp._5)
      assert(got._6 === exp._6, s"sum_sq at doc ${got._1}")
      assert(math.abs(got._7 - exp._7) < 1e-6)
    }
    // The signal does its job: single-character padding has zero
    // collision entropy, real corpus text sits well above it.
    assert(r6(math.log(1.0) / math.log(2.0)) === 0.0)
    assert(out.forall(_._7 > 1.0),
      "corpus text scored like padding — the filter would drop it")
  }

  test("source cap: report replays from the scored docs and the kept " +
    "set dominates the dropped set in quality per source") {
    val scored = TextAnalysis.docQuality(spark, sf)
      .select("doc_id", "source", "quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val cap = Curation.SourceCapK
    val bySource = scored.groupBy(_._2)
    val out = Curation.sourceCap(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq === bySource.keys.toSeq.sorted)
    out.foreach { r =>
      val src = r.getString(0)
      val docs = bySource(src).sortBy { case (id, _, q) => (-q, id) }
      val (kept, dropped) = docs.splitAt(cap)
      assert(r.getLong(1) === docs.length.toLong)
      assert(r.getLong(2) === kept.length.toLong)
      assert(r.getLong(3) === dropped.length.toLong)
      assert(r.getLong(3) > 0L, s"$src did not overflow the cap — vacuous")
      assert(r.getLong(4) === kept.map(_._1).sum, s"kept set at $src")
      assert(r.getDouble(5) === kept.map(_._3).min)
      // The policy invariant: no dropped doc outscores a kept one.
      assert(dropped.forall(_._3 <= kept.map(_._3).min),
        s"quality inversion at $src")
    }
  }

  test("hybrid rrf: full in-JVM replay of both lists and the fusion; " +
    "fusion genuinely reorders both inputs") {
    // Text list replay (the BM25 spec's machinery, ranked to depth).
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val terms = TextAnalysis.SearchTerms
    val profile = docs.map { case (id, text) =>
      val t = "\\S+".r.findAllIn(text).toArray
      (id, terms.map(q => t.count(_ == q).toLong), t.length.toLong)
    }
    val n = profile.length.toDouble
    val dfv = terms.indices.map(i => profile.count(_._2(i) > 0).toDouble)
    val avgdl = profile.map(_._3).sum.toDouble / n
    def bm25(tfs: Seq[Long], dl: Long): Double =
      terms.indices.map { i =>
        val tf = tfs(i).toDouble
        math.log(1.0 + (n - dfv(i) + 0.5) / (dfv(i) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      }.sum
    val textRanks = profile.filter(_._2.sum > 0)
      .map { case (id, tfs, dl) => (id, bm25(tfs, dl)) }
      .sortBy { case (id, s) => (-s, id) }.take(Similarity.RrfDepth)
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }.toMap
    // Vector list replay: cosine vs vec 0, rounded at 6 like the engine.
    val vecs = graft.sources.Corpus.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q0 = vecs.find(_._1 == 0L).get._2
    val vecRanks = vecs.filter(_._1 != 0L)
      .map { case (id, v) => (id, r6(cos(q0, v))) }
      .sortBy { case (id, s) => (-s, id) }.take(Similarity.RrfDepth)
      .zipWithIndex.map { case ((id, _), i) => (id, (i + 1).toLong) }.toMap
    val expected = (textRanks.keySet ++ vecRanks.keySet).toSeq
      .map { id =>
        val rrf = textRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          vecRanks.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (id, rrf)
      }.sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s), i) =>
        (i + 1L, id, textRanks.get(id), vecRanks.get(id)) }
    val out = Similarity.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq === expected)
    // Fusion does real work: the fused order equals neither input's
    // own top-10 (both modalities contribute).
    val textTop = textRanks.toSeq.sortBy(_._2).take(10).map(_._1)
    val vecTop = vecRanks.toSeq.sortBy(_._2).take(10).map(_._1)
    val fused = out.map(_._2).toSeq
    assert(fused !== textTop, "fusion degenerate: equals the text list")
    assert(fused !== vecTop, "fusion degenerate: equals the vector list")
  }

  test("binary ann: packed-long hamming replays in-JVM and candidate " +
    "recall beats the random floor") {
    val vecs = graft.sources.Corpus.read(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.indices.count(i => (a(i) > 0) != (b(i) > 0)).toLong
    val queries = vecs.filter(_._1 < 20)
    val expected = queries.flatMap { case (qid, qv) =>
      val cand = vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, v, ham(qv, v)) }
        .sortBy { case (id, _, h) => (h, id) }.take(Similarity.BqCandidates)
      cand.map { case (id, v, h) => (id, h, r6(cos(qv, v))) }
        .sortBy { case (id, _, s) => (-s, id) }.take(5)
        .zipWithIndex.map { case ((id, h, s), i) =>
          (qid, (i + 1).toLong, id, h, s) }
    }.sortBy(t => (t._1, t._2))
    val out = Similarity.binaryTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.length === expected.length)
    out.zip(expected).foreach { case (got, exp) =>
      assert(got._1 === exp._1); assert(got._2 === exp._2)
      assert(got._3 === exp._3,
        s"neighbor mismatch at ${got._1}/${got._2}")
      assert(got._4 === exp._4, "hamming mismatch — bit packing broken")
      assert(math.abs(got._5 - exp._5) < 2e-6)
    }

    // Quality: sign-bit Hamming must carry real angular signal —
    // candidate recall of the exact top-5 well above the random
    // baseline (30 random candidates of ~n would catch ~30/n ≈ 6%).
    val brute = Similarity.bruteTopK(spark, sf, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = out.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val recalls = brute.keys.toSeq.sorted.map { q =>
      got(q).intersect(brute(q)).size.toDouble / brute(q).size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.3, s"binary candidate recall fell to $mean")
  }

  test("phash near-dup: kernel replays in-JVM and banding is lossless " +
    "vs the brute-force threshold set") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hashes = docs.map { case (id, text) =>
      (id, graft.functions.AvgHashKernel.avgHash64(text.getBytes("UTF-8")))
    }
    // Replay the hot-band cap: band values of each hash, bucket
    // census, saturated buckets dropped from candidate generation.
    def bands(h: Long): Seq[(Int, Long)] =
      (0 until 4).map(j => (j, (h >>> (48 - 16 * j)) & 0xffffL))
    val census = hashes.flatMap { case (_, h) => bands(h) }
      .groupBy(identity).view.mapValues(_.length).toMap
    def liveBands(h: Long): Set[(Int, Long)] =
      bands(h).filter(b => census(b) <= Multimodal.PHashMaxBandDocs).toSet
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      if liveBands(ha).intersect(liveBands(hb)).nonEmpty
      ham = java.lang.Long.bitCount(ha ^ hb)
      if ham <= Multimodal.PHashMaxHam
    } yield (a, b, ham.toLong)).sortBy(t => (t._1, t._2)).toSeq
    val out = Multimodal.phashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === brute,
      "banded join diverged from the capped-band pHash threshold set")
    assert(out.nonEmpty, "no perceptual near-dups on a corpus with " +
      "known near-dup families — fingerprint is not doing its job")
  }

  test("like-quantified flags replay in-JVM and discriminate; " +
    "having-subquery keeps exactly the above-average groups") {
    val names = graft.sources.Corpus.read(spark, sf, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def likeToRegex(p: String) =
      ("\\Q" + p.replace("%", "\\E.*\\Q").replace("_", "\\E.\\Q") + "\\E").r
    val out = Relational.likeQuantified(spark, sf).collect()
    out.foreach { r =>
      val nm = names(r.getLong(0))
      val any = Relational.LikeAnyPatterns
        .exists(p => likeToRegex(p).matches(nm))
      val all = Relational.LikeAllPatterns
        .forall(p => likeToRegex(p).matches(nm))
      val none = Relational.NotLikeAllPatterns
        .forall(p => !likeToRegex(p).matches(nm))
      assert(r.getLong(1) === (if (any) 1L else 0L))
      assert(r.getLong(2) === (if (all) 1L else 0L))
      assert(r.getLong(3) === (if (none) 1L else 0L))
    }
    (1 to 3).foreach { i =>
      assert(out.map(_.getLong(i)).toSet === Set(0L, 1L),
        s"quantified flag $i vacuous")
    }

    // q183: exactly the segments whose cents exceed the all-segment
    // mean survive HAVING.
    val segs = graft.sources.Corpus.read(spark, sf, "customer")
      .join(graft.sources.Corpus.read(spark, sf, "orders"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = segs.map(_._2).sum
    val expected = segs
      .filter { case (_, c) => c * segs.length > total }
      .map(_._1).sorted.toSeq
    val got = graft.Flaco.sql(spark, sf,
      """SELECT c_mktsegment AS seg,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |HAVING sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |    * (SELECT count(DISTINCT c_mktsegment) FROM customer)
        |  > (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |     FROM orders)
        |ORDER BY seg""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.length < segs.length,
      "HAVING filter vacuous — every or no segment survived")
  }

  test("asof tolerance: JVM replay; matched, horizon-nulled and " +
    "never-clicked populations all non-empty") {
    val ev = graft.sources.Corpus.events(spark, sf)
      .selectExpr("event_id", "user_id",
        "unix_micros(cast(ts as timestamp)) AS us",
        "CAST(round(value * 100) AS BIGINT) AS x", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val clicks: Map[Long, Seq[(Long, Long, Long, Long, String)]] =
      ev.filter(_._5 == "click").toSeq
        .groupBy(_._2).view.mapValues(_.sortBy(e => (e._3, e._1))).toMap
    val out = Temporal.asofTolerance(spark, sf).collect()
    var matched = 0; var horizonNulled = 0; var never = 0
    out.foreach { r =>
      val (eid, uid, us) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val prev = clicks.getOrElse(uid, Seq.empty)
        .filter(c => c._3 < us || (c._3 == us && c._1 < eid))
      val best = prev.lastOption
      best match {
        case Some(c) if c._3 >= us - Temporal.AsofTolUs =>
          assert(!r.isNullAt(3) && r.getLong(3) === c._1,
            s"wrong asof match at purchase $eid")
          assert(r.getLong(4) === c._4)
          matched += 1
        case Some(_) =>
          assert(r.isNullAt(3),
            s"beyond-horizon click leaked at purchase $eid")
          horizonNulled += 1
        case None =>
          assert(r.isNullAt(3)); never += 1
      }
    }
    assert(matched > 0 && horizonNulled > 0 && never > 0,
      s"contract populations degenerate: $matched/$horizonNulled/$never")
  }

  test("effective size: stage monotonicity, both stages bite, and " +
    "ppm arithmetic is exact") {
    val out = TextAnalysis.effectiveSize(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dr, tr) = (r.getLong(1), r.getLong(2))
      val (de, te) = (r.getLong(3), r.getLong(4))
      val (dn, tn) = (r.getLong(5), r.getLong(6))
      assert(dr >= de && de >= dn, s"doc counts not monotone at ${r.get(0)}")
      assert(tr >= te && te >= tn, s"token counts not monotone")
      assert(r.getLong(7) === (tr - tn) * 1000000L / tr)
    }
    val totalRaw = out.map(_.getLong(1)).sum
    val totalExact = out.map(_.getLong(3)).sum
    val totalEff = out.map(_.getLong(5)).sum
    // The fixture has no byte-identical texts (its duplication is all
    // NEAR-dup), so the exact stage passes through — its semantics
    // are gated by q26 on its own fixture; here the near-dup stage
    // must do the real work.
    assert(totalExact <= totalRaw)
    assert(totalEff < totalExact, "near-dup stage removed nothing")
  }

  test("range algebra: JVM replay of the half-open definitions and " +
    "the PG merge/intersection contracts") {
    val out = Relational.rangeBattery(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getLong(0)
      val (aLo, aHi) = (k % 97, k % 97 + 1 + k % 13)
      val (bLo, bHi) = (k % 89, k % 89 + 1 + k % 17)
      val x = k % 100
      assert(r.getLong(1) === aLo && r.getLong(2) === aHi)
      assert(r.getLong(3) === bLo && r.getLong(4) === bHi)
      val overlaps = aLo < bHi && bLo < aHi
      val adjacent = aHi == bLo || bHi == aLo
      assert(r.getLong(5) === (if (aLo <= bLo && bHi <= aHi) 1L else 0L))
      assert(r.getLong(6) === (if (aLo <= x && x < aHi) 1L else 0L))
      assert(r.getLong(7) === (if (overlaps) 1L else 0L))
      assert(r.getLong(8) === (if (adjacent) 1L else 0L))
      // PG contracts: intersection non-empty iff overlap; merge
      // defined iff the ranges touch (overlap or adjacency).
      assert(!r.isNullAt(9) === overlaps, s"intersection vs overlap at $k")
      assert(!r.isNullAt(11) === (overlaps || adjacent), s"merge at $k")
      if (overlaps) {
        assert(r.getLong(9) === math.max(aLo, bLo))
        assert(r.getLong(10) === math.min(aHi, bHi))
      }
      if (overlaps || adjacent) {
        assert(r.getLong(11) === math.min(aLo, bLo))
        assert(r.getLong(12) === math.max(aHi, bHi))
      }
    }
    (5 to 8).foreach { i =>
      assert(out.map(_.getLong(i)).toSet === Set(0L, 1L),
        s"range flag $i vacuous")
    }
  }

  test("oov report: full in-JVM replay against the corpus vocabulary") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def toks(s: String) = "\\S+".r.findAllIn(s).toSeq
    val langTerm = docs.flatMap { case (lang, text) =>
      toks(text).groupBy(identity).map { case (t, xs) =>
        ((lang, t), xs.length.toLong) }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val global = langTerm.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val vocab = global.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(TextAnalysis.OovVocabV)
      .map(_._1).toSet
    val oov = langTerm.filter { case ((_, t), _) => !vocab.contains(t) }
    val out = TextAnalysis.oovReport(spark, sf).collect()
    assert(out.nonEmpty, "vocab swallowed the corpus — OOV vacuous")
    out.foreach { r =>
      val lang = r.getString(0)
      val mine = oov.collect { case ((l, t), c) if l == lang => (t, c) }
      val total = docs.filter(_._1 == lang).map(d => toks(d._2).length).sum
      assert(r.getLong(1) === total.toLong)
      assert(r.getLong(2) === mine.size.toLong, s"oov types at $lang")
      assert(r.getLong(3) === mine.values.sum, s"oov mass at $lang")
      assert(r.getLong(4) === mine.values.sum * 1000000L / total)
      val top = mine.toSeq.sortBy { case (t, c) => (-c, t) }.head
      assert(r.getString(5) === top._1 && r.getLong(6) === top._2)
    }
  }

  test("textrank: integer power iteration replays in-JVM and " +
    "centrality separates hub terms from peripheral ones") {
    val (_, pairsDf) = TextAnalysis.cooccurPairs(spark, sf)
    val pairs = pairsDf.select("term_a", "term_b", "c_ab").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val edges = pairs.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val wsum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = deg.size.toLong
    val s = Dedup.PrScale
    var pr: Map[String, Long] = deg.keys.map(v => v -> s / n).toMap
    for (_ <- 1 to Dedup.PrIters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _, w) => pr(u) * w / wsum(u) }.sum).toMap
      pr = pr.keys.map(v =>
        v -> ((s * 15 / 100) / n + inflow(v) * 85 / 100)).toMap
    }
    val expected = pr.toSeq.map { case (v, p) => (v, deg(v), p) }
      .sortBy { case (v, _, p) => (-p, v) }
    val out = TextAnalysis.textRank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === expected)
    // Centrality must do real work: on this corpus the vocab clique
    // is degree-uniform, so WEIGHTS are the whole signal — unequal
    // masses prove the weighted contributions flow (unweighted PR
    // would return uniform mass here).
    assert(out.map(_._3).distinct.length > 1,
      "weighted ranks all equal — weights are not flowing")
  }

  test("cohort matrix: JVM replay; triangle structure and decay are " +
    "value-visible") {
    val uw = graft.sources.Corpus.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id",
        "unix_micros(cast(ts as timestamp)) div 604800000000 AS wk")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cohort = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = uw.map { case (u, w) => (cohort(u), w - cohort(u)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = cohort.values.toSeq.distinct.sorted.map { cw =>
      (cw, (0 to 4).map(o => cells.getOrElse((cw, o.toLong), 0L)))
    }
    val out = Events.cohortMatrix(spark, sf).collect()
      .map(r => (r.getLong(0), (1 to 5).map(r.getLong(_))))
    assert(out.toSeq === expected)
    // Later cohorts cannot reach offsets past the observation window
    // (the triangle), and somewhere retention genuinely dips below
    // the cohort size — otherwise the matrix says nothing.
    assert(out.exists { case (_, row) => row.exists(v => v > 0 &&
      v < row.head) }, "no cohort decays — matrix vacuous")
    assert(out.last._2.last === 0L,
      "latest cohort reached the full offset range — no triangle")
  }

  test("dup spans: positional coverage replays in-JVM and the mass " +
    "measure discriminates documents") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), "\\S+".r.findAllIn(r.getString(1)).toArray))
    def grams(t: Array[String]): Seq[(String, Int)] =
      (0 to t.length - 3).map(i =>
        (s"${t(i)} ${t(i + 1)} ${t(i + 2)}", i))
    val df = docs.flatMap { case (id, t) =>
      grams(t).map(_._1).distinct.map(g => (g, id)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    val shared = df.filter(_._2 >= 2).keySet
    val expected = docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      grams(t).foreach { case (g, i) =>
        if (shared(g)) { covered(i) = true; covered(i + 1) = true
          covered(i + 2) = true } }
      val c = covered.count(identity).toLong
      (id, t.length.toLong, c, c * 1000000L / math.max(t.length, 1))
    }.sortBy(_._1).toSeq
    val out = Dedup.dupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(out === expected)
    assert(out.map(_._4).distinct.length > 10,
      "duplicated-span mass near-constant — measure not discriminating")
  }

  test("top paths and ks distance replay in-JVM") {
    // q191: path trigram counts from a local sequential replay.
    val ev = graft.sources.Corpus.events(spark, sf)
      .selectExpr("user_id", "event_id",
        "unix_micros(cast(ts as timestamp)) AS us", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expectedPaths = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._3, e._2)).map(_._4)
      seq.sliding(3).filter(_.length == 3).map(_.mkString(">"))
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(15)
    val gotPaths = Events.topPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(gotPaths === expectedPaths)

    // q192: the exact KS statistic for one pair, denominators cleared.
    val out = Events.ksDistance(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val types = ev.map(_._4).distinct
    assert(out.length === types.length * (types.length - 1) / 2)
    val (ta, tb) = (out.head._1, out.head._2)
    def cents(v: Double) = math.round(v * 100)
    val vals = graft.sources.Corpus.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val xa = vals.filter(_._1 == ta).map(_._2).sorted
    val xb = vals.filter(_._1 == tb).map(_._2).sorted
    val axis = (xa ++ xb).distinct.sorted
    val (na, nb) = (xa.length.toLong, xb.length.toLong)
    val d = axis.map { x =>
      math.abs(xa.count(_ <= x) * nb - xb.count(_ <= x) * na)
    }.max
    assert(out.head._3 === na && out.head._4 === nb)
    assert(out.head._5 === d * 1000000L / (na * nb))
    assert(out.map(_._5).forall(p => p > 0 && p < 1000000L))
  }

  test("lsh diagnostics: bounds hold and the report agrees with the " +
    "q28 pair relation it tunes") {
    val out = Dedup.lshBandDiagnostics(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    out.foreach { case (b, nc, nv, ppm) =>
      assert(nv <= nc, s"band $b verified more than its candidates")
      assert(ppm === nv * 1000000L / nc)
    }
    // Every q28 near-dup pair must be reachable through at least one
    // band (that is WHY banding works), so per-band verified counts
    // are each bounded by the full pair-relation size, and at least
    // one band attains it only if that band alone found everything —
    // the cross-check: max per-band verified <= total pairs, and the
    // SUM over bands >= total pairs (each pair counted once per
    // generating band).
    val total = Dedup.minhashLshPairs(spark, sf).count()
    assert(out.map(_._3).max <= total)
    assert(out.map(_._3).sum >= total,
      "bands together attribute fewer pairs than q28 verifies")
  }

  test("growth accounting: the decomposition and delta identities " +
    "hold on every day, and all four classes are live") {
    val out = Events.growthAccounting(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (d, active, nw, ret, res, _) =>
      assert(active === nw + ret + res,
        s"active decomposition broken on day $d")
    }
    out.sliding(2).foreach {
      case Array((d0, a0, _, _, _, _), (d1, a1, nw, _, res, ch))
          if d1 == d0 + 1 =>
        assert(a1 - a0 === nw + res - ch,
          s"growth identity broken at day $d1")
      case _ =>
    }
    assert(out.map(_._3).sum > 0 && out.map(_._4).sum > 0 &&
      out.map(_._5).sum > 0 && out.map(_._6).sum > 0,
      "a growth class is vacuous on this fixture")
  }

  test("stored ivf: results identical to the in-memory search and " +
    "the probe predicate prunes partitions in the plan") {
    val stored = Similarity.storedIvfTopK(spark, sf)
    val mem = Similarity.ivfTopK(spark, sf).collect().map(_.toSeq).toSeq
    assert(stored.collect().map(_.toSeq).toSeq === mem,
      "stored layout changed search RESULTS — it may only change I/O")
    // Plan pin: the probed-cell IN-list must reach the stored scan as
    // a PARTITION filter (pruned directories), not a post-scan filter.
    val plan = stored.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cid"))
    assert(scanLine.isDefined,
      "no PartitionFilters on cid — probes are scanning every cell")
    assert(scanLine.get.contains("cid#") || scanLine.get.contains("cid IN")
      || scanLine.get.toLowerCase.contains("in(cid"),
      s"unexpected partition filter shape: ${scanLine.get.take(200)}")
  }

  test("embedding health: JVM replay per dimension and the report " +
    "would catch a dead dimension") {
    val vecs = graft.sources.Corpus.read(spark, sf, "embeddings")
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = Similarity.embeddingHealth(spark, sf).collect()
    assert(out.length === 64)
    out.foreach { row =>
      val d = row.getLong(0).toInt - 1
      val xs = vecs.map(_(d).toDouble)
      assert(row.getLong(1) === xs.length.toLong)
      val mean = xs.sum / xs.length
      assert(math.abs(row.getDouble(2) - r(mean, 6)) <= 1e-6)
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum /
        (xs.length - 1))
      assert(math.abs(row.getDouble(3) - r(sd, 4)) <= 1e-4)
      assert(row.getDouble(4) === xs.min && row.getDouble(5) === xs.max)
      assert(row.getLong(6) === xs.count(_ == 0.0).toLong)
      // Live dimensions on this fixture — sd = 0 would flag dead.
      assert(row.getDouble(3) > 0.0)
    }
  }

  test("transition matrix rows sum to ~1e6 ppm; lang confusion " +
    "tallies the q22 predictions exactly") {
    val tm = Events.transitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    tm.groupBy(_._1).foreach { case (from, rows) =>
      val s = rows.map(_._4).sum
      // div truncation loses < #targets ppm per row.
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"row $from rates sum to $s")
    }
    val preds = TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expected = preds.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((l, p), n) => (l, p, n) }.sortBy(t => (t._1, t._2))
    val cm = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(cm === expected)
  }

  test("window-over-aggregate: region totals equal the sum of their " +
    "nation rows and the share denominators are consistent") {
    val out = graft.Flaco.sql(spark, sf,
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS cents,
        |  CAST(sum(sum(CAST(round(o_totalprice * 100) AS BIGINT)))
        |    OVER (PARTITION BY r_name) AS BIGINT) AS region_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(count(*)) OVER (PARTITION BY r_name) AS BIGINT)
        |    AS region_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (region, rows) =>
      assert(rows.map(_._2).sum === rows.head._3,
        s"region_cents != sum of nation cents in $region")
      assert(rows.map(_._4).sum === rows.head._5,
        s"region_orders != sum of nation orders in $region")
      assert(rows.map(_._3).toSet.size === 1 &&
        rows.map(_._5).toSet.size === 1,
        s"window denominator not constant within $region")
    }
  }
}
