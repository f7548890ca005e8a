package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** In-JVM invariants for the round-12 operators, beyond what the
  * DuckDB hash gate can express: ladder-leg equality, allocation
  * arithmetic, linkage totality, recall self-consistency.
  */
class Round12Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("excision ladder legs are row-identical (q231 == q231b)") {
    val a = Dedup.exciseSpans(spark, sf).collect().map(_.toSeq)
    val b = Dedup.exciseSpansBloom(spark, sf).collect().map(_.toSeq)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    // And the signal ladder too, while we're here.
    val c = Dedup.dupSpans(spark, sf).collect().map(_.toSeq)
    val d = Dedup.dupSpansBloom(spark, sf).collect().map(_.toSeq)
    assert(c.length == d.length)
    c.zip(d).foreach { case (x, y) => assert(x == y) }
  }

  test("water-fill allocation obeys the optimality arithmetic (q232)") {
    val rows = Curation.mixtureWaterfill(spark, sf).collect()
    val tot = rows.map(_.getAs[Long]("avail_tokens")).sum
    val budget = tot * 3 / 4
    val wsum = rows.map(_.getAs[Long]("weight")).sum
    val satA = rows.filter(_.getAs[Long]("saturated") == 1L)
      .map(_.getAs[Long]("avail_tokens")).sum
    val satW = rows.filter(_.getAs[Long]("saturated") == 1L)
      .map(_.getAs[Long]("weight")).sum
    rows.foreach { r =>
      val (avail, w, sat, alloc) = (r.getAs[Long]("avail_tokens"),
        r.getAs[Long]("weight"), r.getAs[Long]("saturated"),
        r.getAs[Long]("alloc_tokens"))
      assert(alloc <= avail, s"${r.getString(0)}: alloc over availability")
      if (sat == 1L) assert(alloc == avail)
      else assert(alloc == math.max(budget - satA, 0L) * w / (wsum - satW))
    }
    val total = rows.map(_.getAs[Long]("alloc_tokens")).sum
    // Floor division leaks at most one token per unsaturated language.
    assert(total <= budget)
    assert(budget - total <= rows.count(_.getAs[Long]("saturated") == 0L)
      .toLong + 0L, s"water level left ${budget - total} tokens unspent")
  }

  test("fuzzy join is total over dirty names and exact on the base " +
    "fixture (q234)") {
    val rows = TextAnalysis.fuzzyJoinCustomers(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(rows.length == n, "a dirty name vanished from the report")
    assert(rows.forall(!_.isNullAt(2)),
      "unmatched dirty names on the clean fixture")
    assert(rows.forall(_.getAs[Long]("dist") <= 2L))
    val self = rows.count(r => r.getAs[Long]("did") ==
      r.getAs[Long]("matched_id"))
    assert(self * 10 >= rows.length * 8,
      s"only $self/${rows.length} self-matches — blocking recall broke")
  }

  test("MRL recall is monotone in dimension and exact at full (q235)") {
    val rows = Similarity.mrlRecall(spark, sf).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("recall_permille"))
      .sortBy(_._1)
    assert(rows.last._2 == 1000L, "full-dim self-consistency broke")
    assert(rows.map(_._2).sliding(2).forall(p => p.head <= p.last),
      s"recall not monotone in dim: ${rows.mkString(", ")}")
  }

  test("table profile matches the relation it profiles (q236)") {
    val rows = Relational.tableProfile(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    assert(rows.length == orders.schema.fields.length)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    assert(byCol("o_orderkey").getAs[Long]("n_distinct") == orders.count())
    rows.foreach(r => assert(r.getAs[Long]("n_rows") == orders.count()))
  }
}
