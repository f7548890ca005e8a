package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.LateralJoin
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** The two delegated-SQL-surface gates added in round 8: Spark's own
  * recursive-CTE execution (q108) and LATERAL correlated table
  * subqueries (q109). Beyond the DuckDB oracles, this spec pins the
  * properties the oracle can't see: the recursion really iterates
  * (depth matches ⌊log₂ max(key)⌋), a recursive closure agrees with
  * the pointer-jumping CC operator on the SAME pair graph, and the
  * lateral subquery DECORRELATES — no per-customer re-scan of orders
  * survives planning.
  */
class RecursiveSqlSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("recursive ancestor closure has log-depth and one chain per node") {
    val rows = SparkEntry.queries("q108_recursive_cte")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxKey = rows.map(_._1).max
    val wantDepth = (63 - java.lang.Long.numberOfLeadingZeros(maxKey)).toLong
    assert(rows.map(_._3).max === wantDepth,
      s"recursion depth != floor(log2($maxKey))")
    // Each node's chain is exactly the halving walk to the root —
    // an independent per-node replay of what the fixpoint computed.
    rows.groupBy(_._1).foreach { case (node, chain) =>
      // Base row at depth 0, then halve while the current ancestor
      // exceeds 1 (key 0 exists in this corpus: its chain is itself).
      val want = scala.collection.mutable.Set((node, 0L))
      var a = node
      var d = 0L
      while (a > 1) { a /= 2; d += 1; want += ((a, d)) }
      assert(chain.map(c => (c._2, c._3)).toSet === want,
        s"ancestor chain for $node diverges from the halving walk")
    }
  }

  test("recursive closure agrees with pointer-jumping CC on the same pair graph") {
    val pairs = Dedup.minhashLshPairs(spark, sf)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    pairs.createOrReplaceTempView("pair_graph")
    // Spark's recursive CTEs accept only UNION ALL
    // (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), which diverges on a
    // cyclic (undirected) graph — so the closure is depth-bounded
    // with an external dedup. Sound whenever the bound exceeds every
    // component's diameter; walk fanout is degree^depth, so pin the
    // degree precondition explicitly before paying it. The q43
    // oracle's DuckDB recursion over this same graph uses UNION
    // (distinct) — together the triangle closes: engine CC == engine
    // recursion == oracle recursion.
    val maxDegree = pairs.select(col("a").as("n"))
      .union(pairs.select(col("b").as("n")))
      .groupBy(col("n")).count().agg(max(col("count"))).head().getLong(0)
    assert(maxDegree <= 4, s"fixture degree $maxDegree makes walk closure too costly")
    val viaRecursion = spark.sql(
      """WITH RECURSIVE edges AS (
        |  SELECT a, b FROM pair_graph
        |  UNION SELECT b AS a, a AS b FROM pair_graph),
        |reach AS (
        |  SELECT a AS n, b AS m, 0 AS d FROM edges
        |  UNION ALL
        |  SELECT r.n, e.b AS m, r.d + 1 AS d
        |  FROM reach r JOIN edges e ON r.m = e.a WHERE r.d < 8)
        |SELECT n AS doc_id, least(n, min(m)) AS cluster_rep
        |FROM reach GROUP BY n""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCc = Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaRecursion === viaCc)
    assert(viaRecursion.nonEmpty)
  }

  test("lateral subquery decorrelates to a join, matches the window formulation") {
    val df = SparkEntry.queries("q109_lateral_join")(spark, sf)
    // The 100 TB contract: Catalyst must rewrite the correlated
    // LIMIT subquery to rank-over-partition + join. A surviving
    // LateralJoin, nested-loop or cartesian physical join would mean
    // a per-customer re-scan of orders.
    assert(!df.queryExecution.optimizedPlan.exists(_.isInstanceOf[LateralJoin]),
      "LateralJoin survived optimization")
    val phys = df.queryExecution.executedPlan
    assert(!phys.exists(p => p.isInstanceOf[BroadcastNestedLoopJoinExec]
        || p.isInstanceOf[CartesianProductExec]),
      s"non-equi physical join in:\n$phys")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = graft.sources.Corpus.read(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
