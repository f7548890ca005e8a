package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.ChunkTokens

/** Specs for the round-6 gates: the ChunkTokens Generator (q72), the
  * TF-IDF scorer (q73), and the oracle-gated bucketed join (q74). The
  * value-level gate is the DuckDB oracle; these pin the generator
  * semantics against a declarative twin, the edge cases the corpus
  * can't produce, the SQL registration path, and the plan shapes the
  * scale argument depends on.
  */
class ChunkSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  /** Declarative twin of the generator: materialize every chunk as an
    * array element (sequence of starts -> slice -> array_join), then
    * posexplode. Identical semantics, the memory shape the Generator
    * exists to avoid — which makes it the right independent check.
    */
  private def declarativeChunks(chunk: Int, stride: Int) =
    graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(toks) / $stride.0D) AS INT) - 1),
           |  i -> struct(
           |    CAST(least(i * $stride + $chunk, size(toks)) - i * $stride AS BIGINT)
           |      AS n_chunk_toks,
           |    array_join(slice(toks, i * $stride + 1,
           |      least($chunk, size(toks) - i * $stride)), ' ') AS chunk_text))"""
          .stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.n_chunk_toks").as("n_chunk_toks"),
        md5(col("col.chunk_text")).as("chunk_fp"))

  test("generator chunks equal the declarative explode twin on the corpus") {
    val got = TextAnalysis.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = declarativeChunks(TextAnalysis.ChunkSize, TextAnalysis.ChunkStride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("generator edge cases: short doc, exact window, empty, null") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("toks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Seq("a", "b")),              // < one window
      org.apache.spark.sql.Row(2L, Seq("a", "b", "c", "d")),    // exact window
      org.apache.spark.sql.Row(3L, (1 to 7).map(i => s"t$i")),  // overlap + tail
      org.apache.spark.sql.Row(4L, Seq.empty[String]),          // no rows
      org.apache.spark.sql.Row(5L, null))                       // no rows
    val df = spark.createDataFrame(rows.asJava, schema)
      .select(col("id"), ChunkTokens.chunkTokens(col("toks"), 4, 3))
      .select(col("id"), col("chunk_idx"), col("n_chunk_toks"), col("chunk_text"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val want = Seq(
      (1L, 0L, 2L, "a b"),
      (2L, 0L, 4L, "a b c d"),
      (2L, 1L, 1L, "d"),         // window starts inside, short tail
      (3L, 0L, 4L, "t1 t2 t3 t4"),
      (3L, 1L, 4L, "t4 t5 t6 t7"),
      (3L, 2L, 1L, "t7"))
    assert(got.toSeq === want)
  }

  test("chunk_tokens is callable from SQL with literal window args") {
    graft.sources.Corpus.registerAll(spark, sf)
    // Spark SQL string literals process backslash escapes, so the
    // regex needs \\S in the SQL text (triple-quoted Scala passes
    // backslashes through verbatim).
    val got = spark.sql(
      """SELECT doc_id, chunk_idx, n_chunk_toks
        |FROM (SELECT doc_id,
        |  chunk_tokens(regexp_extract_all(text, '\\S+', 0), 8, 6)
        |  FROM documents) WHERE doc_id = 0 ORDER BY chunk_idx""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.length > 1)
    assert(got.map(_._1).toSeq === got.indices.map(_.toLong))
    // Bad arity / non-literal args fail with the typed message (the
    // analyzer may wrap the FlacoSparkException).
    val e = intercept[Exception] {
      spark.sql("SELECT chunk_tokens(array('a'), 4)").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("chunk_tokens expects")),
      s"unexpected error: $e")
  }

  test("tfidf ranks are dense 1..k per doc with non-increasing scores") {
    val rows = TextAnalysis.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq === (1L to byRank.length).toSeq, s"doc $doc")
      assert(byRank.length <= TextAnalysis.TfidfTopK, s"doc $doc")
      // Scores are non-increasing down the ranking (rounding can tie).
      byRank.map(_._5).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b, s"doc $doc: $a < $b")
        case _ =>
      }
      // A term in every doc has ln(N/N)=0: score 0, never negative.
      rs.foreach { case (_, _, tf, df, score) =>
        assert(tf >= 1L && df >= 1L)
        assert(score >= 0.0)
      }
    }
  }

  test("tfidf plans a TopKRows heap and never shuffles the tf rows") {
    val df = TextAnalysis.tfidfTopTerms(spark, sf)
    val optimized = df.queryExecution.optimizedPlan
    assert(!optimized.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Window]),
      s"Window survived:\n$optimized")
    val hasTopK = optimized.exists {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.aggregateExpressions.exists(_.exists {
          case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
            ae.aggregateFunction.isInstanceOf[graft.functions.TopKRows]
          case _ => false
        })
      case _ => false
    }
    assert(hasTopK, s"TopKRows aggregate missing:\n$optimized")
    // Exchange audit (AQE off so the static executedPlan is the
    // shape): exactly two hash exchanges — the partially-counted DF
    // rows (vocabulary-sized) and the bounded TopKRows heaps keyed by
    // doc_id. The corpus-derived tf rows reach the scoring join with
    // no exchange of their own (the DF table broadcasts).
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val executed =
        TextAnalysis.tfidfTopTerms(spark, sf).queryExecution.executedPlan
      val hashExchanges = executed.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning
              .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] =>
          e.outputPartitioning
            .asInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning]
            .expressions.map(_.sql).mkString(",")
      }
      assert(hashExchanges.length === 2,
        s"expected 2 hash exchanges (DF partial count + topk heaps), " +
          s"got $hashExchanges:\n$executed")
      assert(hashExchanges.exists(_.contains("term")), s"$hashExchanges")
      assert(hashExchanges.exists(_.contains("doc_id")), s"$hashExchanges")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("bucketed revenue equals the plain-join formulation") {
    val got = graft.sources.Layout.bucketedRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = graft.sources.Corpus.read(spark, sf, "orders")
      .join(graft.sources.Corpus.read(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy(col("c_mktsegment"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }
}
