package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.TestSpark

/** Invariant specs for the round-15 breadth gates (q240–q241, DSIR).
  * The value-level gate is the DuckDB oracle; these pin the
  * properties the oracle compare cannot state: that the weights
  * actually discriminate the target domain, that the resample is
  * weight-biased, and that the scoring stage keeps its no-join /
  * no-explode plan shape (the broadcast-map-literal design).
  */
class Breadth15Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("dsir weights discriminate the target domain and are " +
    "deterministic") {
    val w = TextAnalysis.dsirWeights(spark, sf)
    val rows = w.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val langs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Every scored doc exists and has at least one bigram.
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0))
    // The point of DSIR: per-bigram log importance (w_micro/n_grams)
    // is higher for target-domain (en) docs than for the rest.
    def meanPerGram(p: ((Long, Long, Long)) => Boolean): Double = {
      val s = rows.filter(p)
      s.map(r => r._3.toDouble / r._2).sum / s.length
    }
    val en = meanPerGram(r => langs(r._1) == "en")
    val rest = meanPerGram(r => langs(r._1) != "en")
    assert(en > 0 && rest < 0,
      s"per-gram weight means: en=$en rest=$rest — DSIR should score " +
        "target-domain docs positive and off-domain docs negative")
    // Deterministic: the bounded bucket-table collect and the map
    // literal reproduce exactly across runs.
    val again = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("dsir scoring stage plans with no join and no explode " +
    "(broadcast map literal, single codegen pass)") {
    val plan = TextAnalysis.dsirWeights(spark, sf)
      .queryExecution.optimizedPlan
    plan.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        fail(s"scoring stage re-joined the weight table: $j")
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        fail(s"scoring stage exploded the bucket array: $g")
      case _ =>
    }
  }

  test("dsir resample is a weight-biased k-subset of the scored docs") {
    val w = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val s = TextAnalysis.dsirResample(spark, sf, k = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.length === 100)
    assert(s.map(_._1).distinct.length === 100)
    // Subset with consistent weights.
    s.foreach { case (id, wm, _) => assert(w(id) === wm) }
    // key = weight + Gumbel ⇒ keys are sorted desc and each key ≥ its
    // own weight is NOT guaranteed (noise can be negative), but the
    // SELECTED set must be weight-biased: its mean weight beats the
    // corpus mean by a wide margin.
    val meanSel = s.map(_._2).sum.toDouble / s.length
    val meanAll = w.values.sum.toDouble / w.size
    assert(meanSel > meanAll,
      s"selected mean $meanSel should exceed corpus mean $meanAll")
    assert(s.map(_._3).toSeq === s.map(_._3).sortBy(-_).toSeq)
    // Deterministic (seeded noise): a second draw is identical.
    val again = TextAnalysis.dsirResample(spark, sf, k = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.toSeq === again.toSeq)
  }

  test("z-order layout prunes BOTH dimensions; linear only its " +
    "sort key (q242 balanced-pruning invariant)") {
    val rows = graft.sources.Layout.zorderHealth(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap
    val (zf, zr, zx, zy) = rows("zorder")
    val (lf, lr, lx, ly) = rows("linear")
    assert(zr === lr)                       // same rows, two layouts
    assert(zf === 16L && lf === 16L)        // both fully materialized
    // Linear: perfect on the sort key, useless on the other.
    assert(lx <= 2, s"linear should prune x to ≤2 files, hit $lx")
    assert(ly === lf, "linear prunes nothing on the non-sort dim")
    // Z-order: BOTH probes bounded by ~√nFiles tiles — the property
    // that justifies OPTIMIZE ZORDER; worst-dimension pruning is
    // strictly better than linear's.
    assert(zx <= 4 && zy <= 4,
      s"zorder probe hit ($zx, $zy) files — expected ≤4 tiles each")
    assert(math.max(zx, zy) < math.max(lx, ly))
  }

  test("symspell fuzzy join (q243) has FULL recall on the deletion " +
    "fixture — the guarantee the q234 trigram cap cannot make") {
    val rows = TextAnalysis.symspellFuzzyJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    // Every dirty name is one deletion from its original, and the
    // deletion-neighborhood condition is NECESSARY for dist ≤ 2 —
    // so every row must match, at exactly distance 1 (all clean
    // names share one length; a 1-shorter dirty name can never be
    // at distance 0).
    rows.foreach { r =>
      assert(!r.isNullAt(2), s"unmatched dirty name: ${r.getString(1)}")
      assert(r.getLong(4) === 1L)
    }
    // And it must dominate q234's recall (the capped trigram index
    // may drop names; the neighborhood index may not).
    val trgmMatched = TextAnalysis.fuzzyJoinCustomers(spark, sf)
      .filter(col("matched_id").isNotNull).count()
    assert(rows.length.toLong >= trgmMatched)
  }

  test("streaming DSIR scorer (qS04) emits exactly the batch " +
    "scoring of the same corpus") {
    val streamed = graft.streaming.DocumentStreams
      .dsirScoredFinalized(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq === batch.toSeq)
  }

  test("FastSS lemma (q243's recall guarantee): strings within " +
    "edit distance 2 ALWAYS share a depth-2 deletion variant") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def nbhd(s: String): Set[String] = {
      val d1 = (0 until s.length).map(i =>
        s.substring(0, i) + s.substring(i + 1)).toSet + s
      d1 ++ d1.flatMap(t => (0 until t.length).map(i =>
        t.substring(0, i) + t.substring(i + 1)))
    }
    val strGen = Gen.chooseNum(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'e') ++ ('0' to '3'))).map(_.mkString))
    // Apply up to 2 random edits (insert/delete/substitute).
    def oneEdit(cur: String): Gen[String] = {
      val subG = Gen.zip(Gen.chooseNum(0, math.max(cur.length - 1, 0)),
        Gen.oneOf('a' to 'e')).map { case (i, c) =>
        if (cur.isEmpty) c.toString
        else cur.substring(0, i) + c + cur.substring(i + 1) }
      val insG = Gen.zip(Gen.chooseNum(0, cur.length),
        Gen.oneOf('a' to 'e')).map { case (i, c) =>
        cur.substring(0, i) + c + cur.substring(i) }
      if (cur.length > 1) {
        val delG = Gen.chooseNum(0, cur.length - 1).map(i =>
          cur.substring(0, i) + cur.substring(i + 1))
        Gen.oneOf(subG, insG, delG)
      } else Gen.oneOf(subG, insG)
    }
    val editGen: Gen[(String, String)] = for {
      s <- strGen
      k <- Gen.chooseNum(0, 2)
      t <- (0 until k).foldLeft(Gen.const(s))((g, _) => g.flatMap(oneEdit))
    } yield (s, t)
    val prop = Prop.forAll(editGen) { st =>
      nbhd(st._1).intersect(nbhd(st._2)).nonEmpty
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500),
      prop).passed)
  }

  test("bpe training (q244) equals a from-scratch single-threaded " +
    "replay of Sennrich's algorithm") {
    val engine = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // Brute-force replay in plain Scala: word counts, then R rounds
    // of (pair-count argmax, greedy left-to-right non-overlapping
    // merge) over symbol vectors — no SQL, no replace() semantics to
    // share, ties broken identically ((count desc, pair asc)).
    val wc = scala.collection.mutable.Map.empty[List[String], Long]
    graft.sources.Corpus.read(spark, sf, "documents")
      .select("text").collect().foreach { r =>
      r.getString(0).split("\\s+").filter(_.nonEmpty).foreach { w =>
        val syms = w.map(_.toString).toList
        wc(syms) = wc.getOrElse(syms, 0L) + 1L
      }
    }
    var words = wc.toMap
    val expected = (1 to TextAnalysis.BpeMerges).map { rank =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach { p =>
          pairs(p) = pairs.getOrElse(p, 0L) + c
        }
      }
      val ((a, b), pc) = pairs.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      def merge(s: List[String]): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: merge(rest)
        case x :: rest => x :: merge(rest)
        case Nil => Nil
      }
      words = words.groupBy { case (syms, _) => merge(syms) }
        .map { case (m, g) => m -> g.values.sum }
      (rank.toLong, a, b, pc)
    }
    assert(engine.toSeq === expected)
  }

  test("snapshot diff (q246) classes partition both snapshots and " +
    "re-derive from the modular fixture") {
    val rep = Relational.snapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = graft.sources.Corpus.read(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val nBase = ids.length.toLong
    val del = ids.count(_ % 11 == 0).toLong
    val upd = ids.count(i => i % 7 == 0 && i % 11 != 0).toLong
    val ins = ids.count(_ % 13 == 0).toLong
    assert(rep("delete") === del)
    assert(rep("update") === upd)
    assert(rep("insert") === ins)
    assert(rep("unchanged") === nBase - del - upd)
    // Partition identities: every base key classified exactly once,
    // every snapshot key likewise.
    assert(rep("delete") + rep("update") + rep("unchanged") === nBase)
    assert(rep("insert") + rep("update") + rep("unchanged") ===
      (nBase - del) + ins)
  }

  test("bpe application (q245) reconciles with the corpus and with " +
    "training: every merge strictly compresses") {
    val rep = TextAnalysis.bpeApply(spark, sf).collect()
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("lang"),
        org.apache.spark.sql.functions.explode(
          TextAnalysis.tokens(col("text"))).as("w"))
    val occ = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = docs.selectExpr("lang", "length(w) AS c")
      .groupBy("lang").sum("c").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rep.foreach { r =>
      val lang = r.getString(0)
      // Word occurrences and char mass re-derive from the raw corpus.
      assert(r.getLong(2) === occ(lang))
      assert(r.getLong(3) === chars(lang))
      // BpeMerges merges applied ⇒ strictly fewer subwords than chars, and
      // at least one subword per word.
      assert(r.getLong(4) < r.getLong(3))
      assert(r.getLong(4) >= r.getLong(2))
      // permilles reconcile exactly (integer arithmetic)
      assert(r.getLong(5) === r.getLong(4) * 1000 / r.getLong(2))
      assert(r.getLong(6) === r.getLong(3) * 1000 / r.getLong(4))
    }
  }
}
