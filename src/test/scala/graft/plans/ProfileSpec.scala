package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Relational

/** Pins the plan shape of the PRODUCTION profiler
  * ([[Relational.tableProfileApproxDetail]], q239) — the 100 TB
  * contract its scaladoc states:
  *
  *   - NO exact distinct aggregate anywhere in the optimized plan
  *     (an `AggregateExpression(isDistinct = true)` forces either a
  *     per-column shuffle or an Expand multiplier);
  *   - NO Expand node (multi-distinct planning rewrites the scan to
  *     |distinct columns|+1 copies of every input row — a width-times
  *     read amplifier that must never enter the production shape);
  *   - the HLL++ sketch IS present (`approx_count_distinct` plans as
  *     [[HyperLogLogPlusPlus]]) — fixed-size mergeable state per
  *     column, so one pass and bounded memory at any cardinality.
  *
  * The gated twin [[Relational.tableProfileApprox]] (q238) deliberately
  * carries BOTH the exact and the sketch aggregate — that is what
  * makes the sketch's ±3·rsd band oracle-hashable — so the same spec
  * pins the gate-vs-path split: the twin MUST contain the exact
  * distinct the production shape must not.
  */
class ProfileSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def distinctAggs(plan: LogicalPlan): Seq[AggregateExpression] =
    plan.collect { case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression if ae.isDistinct => ae
      })
    }.flatten

  private def hllAggs(plan: LogicalPlan): Seq[HyperLogLogPlusPlus] =
    plan.collect { case a: Aggregate =>
      a.aggregateExpressions.flatMap(_.collect {
        case h: HyperLogLogPlusPlus => h
      })
    }.flatten

  test("q239 production profile: no Expand, no exact distinct, " +
    "HLL++ sketch per profiled column") {
    val df = Relational.tableProfileApproxDetail(spark, TestSpark.sf)
    val plan = df.queryExecution.optimizedPlan

    val expands = plan.collect { case e: Expand => e }
    assert(expands.isEmpty,
      s"production profile plans an Expand (input re-read multiplier):\n" +
        expands.map(_.simpleString(3)).mkString("\n"))

    val exact = distinctAggs(plan)
    assert(exact.isEmpty,
      s"production profile contains exact distinct aggregates:\n" +
        exact.map(_.sql).mkString("\n"))

    val sketches = hllAggs(plan)
    assert(sketches.size == Relational.ProfileColumns.size,
      s"expected one HLL++ sketch per profiled column " +
        s"(${Relational.ProfileColumns.size}), found ${sketches.size}")
  }

  test("q239 production profile: one row per profiled column, " +
    "sketch within the q238-gated band") {
    val rows = Relational.tableProfileApproxDetail(spark, TestSpark.sf)
      .collect()
    assert(rows.length == Relational.ProfileColumns.size)
    // The accuracy CONTRACT is q238's oracle (in_band = 1 hashed by
    // DuckDB); here we cross-check the production shape returns the
    // same sketch values the gated twin banded, keyed by column.
    val gated = Relational.tableProfileApprox(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5))).toMap // (lo_distinct, hi_distinct)
    rows.foreach { r =>
      val colName = r.getString(0)
      val ad = r.getLong(3)
      val (lo, hi) = gated(colName)
      assert(ad >= lo && ad <= hi,
        s"$colName: sketch $ad outside the gated band [$lo, $hi]")
      assert(r.getLong(1) > 0L, s"$colName: n_rows not positive")
      assert(!r.isNullAt(4) && !r.isNullAt(5),
        s"$colName: min/max missing")
    }
  }

  test("q238 gated twin: carries the exact distinct the production " +
    "shape bans (the gate-vs-path split)") {
    val plan = Relational.tableProfileApprox(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    // Multi-column exact distinct shows up in the optimized plan as
    // either unrewritten isDistinct aggregates or (the usual case)
    // RewriteDistinctAggregates' Expand — the very row multiplier
    // the production shape must never plan. Either signature proves
    // the twin still computes the exact count its ±3·rsd band needs.
    val exactSignature = distinctAggs(plan).nonEmpty ||
      plan.collectFirst { case e: Expand => e }.nonEmpty
    assert(exactSignature,
      "the gated twin no longer computes the exact distinct — its " +
        "±3·rsd band would be self-referential")
    assert(hllAggs(plan).size == Relational.ProfileColumns.size)
  }
}
