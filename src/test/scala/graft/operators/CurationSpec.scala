package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Boundary semantics of the curation operators — the edges a
  * value-level oracle run can miss when the corpus happens not to hit
  * them: the strict `bucket < rate` keep decision of the mixture
  * sampler (both edges), and the exact-tie case of the token-budget
  * threshold (cum == budget is KEPT). Plus the select/apply identity:
  * the applied selection must keep exactly the documents the audit
  * counted.
  */
class CurationSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Plain-Scala twin of Curation.sampleBucket: first md5 byte of
    * "mix:<id>" — an independent implementation, not the engine's.
    */
  private def bucketOf(id: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (md.digest(s"mix:$id".getBytes("UTF-8"))(0)) & 0xff
  }

  private def idWithBucket(b: Int): Long =
    (0L to 100000L).find(bucketOf(_) == b)
      .getOrElse(fail(s"no doc_id with bucket $b in 0..100000"))

  test("mixture keep boundary is strict: bucket rate-1 kept, rate dropped") {
    val s = spark
    import s.implicits._
    // en rate = 64: bucket 63 is the last kept, 64 the first dropped.
    val kept = idWithBucket(63)
    val dropped = idWithBucket(64)
    val docs = Seq(
      (kept, "en", "three token text"),
      (dropped, "en", "two tokens")).toDF("doc_id", "lang", "text")
    val row = Curation.mixtureSampleOf(docs).collect()
    assert(row.length === 1)
    assert(row(0).getString(0) === "en")
    assert(row(0).getLong(1) === 2L)      // n_in
    assert(row(0).getLong(2) === 1L)      // n_kept: only bucket 63
    assert(row(0).getLong(3) === 3L)      // tokens of the kept doc
  }

  test("rate 256 keeps bucket 255; unlisted language keeps nothing") {
    val s = spark
    import s.implicits._
    val worst = idWithBucket(255)
    val docs = Seq(
      (worst, "zh", "a b"),               // zh rate 256: everything kept
      (worst, "xx", "c d e f")).toDF("doc_id", "lang", "text")
    val got = Curation.mixtureSampleOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got("zh") === ((1L, 2L)))
    assert(got("xx") === ((0L, 0L)))
  }

  /** quality q puts a doc in bucket floor(q*20): 0.125→2, 0.075→1,
    * 0.025→0 (midpoints, safely away from floor boundaries).
    */
  private def scored(rows: Seq[(Long, String, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "n_tokens", "quality")
  }

  test("budget threshold keeps the exact-tie bucket") {
    // en total = 10 tokens, budget 6/10 → keep while cum ≤ 6.
    // Best bucket alone holds exactly 6: the tie must be KEPT.
    val df = scored(Seq(
      (1L, "en", 6L, 0.125),   // bucket 2, cum 6  → kept (tie)
      (2L, "en", 1L, 0.075),   // bucket 1, cum 7  → dropped
      (3L, "en", 3L, 0.025)))  // bucket 0, cum 10 → dropped
    val got = Curation.tokenBudgetSelectOf(df).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getString(0) === "en")
    assert(r.getLong(1) === 2L)   // threshold_bucket
    assert(r.getLong(2) === 1L)   // n_kept
    assert(r.getLong(3) === 6L)   // tokens_kept
  }

  test("language whose best bucket exceeds the budget is absent") {
    // de total = 10, best bucket holds 7 > 6: no affordable bucket.
    val df = scored(Seq(
      (1L, "de", 7L, 0.125),
      (2L, "de", 3L, 0.025),
      (3L, "en", 6L, 0.125),
      (4L, "en", 4L, 0.025)))
    val got = Curation.tokenBudgetSelectOf(df).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("en"))
  }

  test("applied selection keeps exactly the audited documents") {
    val df = scored(Seq(
      (10L, "en", 6L, 0.125),
      (11L, "en", 1L, 0.075),
      (12L, "en", 3L, 0.025),
      (20L, "de", 4L, 0.175),   // bucket 3, cum 4 ≤ 6·10/10 → kept
      (21L, "de", 6L, 0.025)))  // bucket 0, cum 10 → dropped
    // Audit says: en keeps doc 10 (6 tokens), de keeps doc 20 (4).
    val applied = Curation.tokenBudgetApplyOf(df).collect()
    assert(applied.map(_.getLong(1)).sum === 2L)        // two docs survive
    assert(applied.map(_.getLong(2)).sum === 10L)       // 6 + 4 tokens
    assert(applied.map(_.getLong(3)).sum === 30L)       // doc ids 10 + 20
  }

  test("stratified sample draws exactly k per stratum, deterministically") {
    val a = Curation.stratifiedSample(spark, TestSpark.sf, k = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    val b = Curation.stratifiedSample(spark, TestSpark.sf, k = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(a.toSeq === b.toSeq)            // same draw every run
    a.foreach { case (lang, n, _) =>
      assert(n === 7L, s"stratum $lang drew $n docs, wanted exactly 7")
    }
    // A different k draws a superset-ordered prefix: the k=7 docid
    // sum can never exceed the k=8 one (hash order is a fixed list).
    val bigger = Curation.stratifiedSample(spark, TestSpark.sf, k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    a.foreach { case (lang, _, ds) => assert(ds <= bigger(lang)) }
  }

  test("select and apply agree on the kept token volume (corpus)") {
    val sel = Curation.tokenBudgetSelect(spark, TestSpark.sf).collect()
      .map(_.getLong(3)).sum
    val app = Curation.tokenBudgetApply(spark, TestSpark.sf).collect()
      .map(_.getLong(2)).sum
    assert(sel === app)
  }

  test("TABLESAMPLE gate holds its own contract and plans a Sample node") {
    val row = Curation.sampleGate(spark, TestSpark.sf).collect()
    assert(row.length === 1)
    val r = row(0)
    assert(r.getLong(0) > 0, "n_source")
    assert(r.getLong(1) === 0L, "sample invented rows not in the source")
    assert(r.getLong(2) === 0L, "REPEATABLE seed is not set-deterministic")
    assert(r.getLong(3) === 1L, "sample size outside the 6-sigma binomial band")
    // The sampling itself must plan as Spark's native Sample operator
    // (partition-local, no shuffle, no rand()-filter rewrite) — the
    // shape that stays one narrow pass at any scale.
    val plan = graft.Flaco.sql(spark, TestSpark.sf,
      s"SELECT doc_id FROM documents TABLESAMPLE (${Curation.SamplePct} " +
        s"PERCENT) REPEATABLE (${Curation.SampleSeed})")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Sample"), s"no Sample node in:\n$plan")
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
  }
}
