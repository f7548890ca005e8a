package graft.operators

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
}
