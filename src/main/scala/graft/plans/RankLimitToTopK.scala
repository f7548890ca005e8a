package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

import graft.functions.TopKRows

/** Rewrites the rank-limit idiom
  *
  * {{{ Filter(rn <= k, Window(rn = row_number() OVER (PARTITION BY p ORDER BY o), ...)) }}}
  *
  * into a bounded top-k aggregate:
  *
  * {{{ Project(payload + rank, Generate(posexplode(topk), Aggregate(p, TopKRows(struct(o, payload), k)))) }}}
  *
  * Why: the window plan shuffles EVERY candidate row on the partition
  * key and sorts each group (Spark's own WindowGroupLimit prunes to k
  * per group, but only after a full local sort of each map partition,
  * and the per-group sort + window evaluation remain). The aggregate
  * form is a streaming O(n log k) heap per (group, map partition) —
  * map-side combined, bounded memory, no sort, no spill — and the
  * exchange carries at most k rows per group per partition. This is
  * exactly the ANN top-k shape (q30/q31): 20 query groups over a
  * corpus-sized candidate stream, where a 20-partition window sort
  * serializes on the handful of groups.
  *
  * Fires only when the rewrite is exactly equivalent: a single
  * row_number window expression with the default row frame, a
  * deterministic non-empty ordering, and a limit predicate on the
  * rank (optionally under an integral-widening cast, optionally
  * conjoined with rank-free residual predicates, which are preserved
  * on top). Ties under a non-total ordering were nondeterministic in
  * the window form and remain so here — same contract as Spark's own
  * WindowGroupLimit. k is capped so the per-group buffer stays
  * trivially memory-bounded.
  */
object RankLimitToTopK extends Rule[LogicalPlan] {

  /** Buffers hold k rows per group per partition; beyond this a sort
    * is the honest plan.
    */
  val MaxK = 1024

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          _, _, child, _))
        if !f.isStreaming && order.nonEmpty &&
          order.forall(_.child.deterministic) &&
          part.forall(_.deterministic) =>
      val rankAttr = alias.toAttribute
      val conjuncts = splitConjuncts(cond)
      val (limits, residual) = conjuncts.partition(c => extractLimit(c, rankAttr).isDefined)
      if (limits.size == 1 && residual.forall(!_.references.contains(rankAttr))) {
        val k = extractLimit(limits.head, rankAttr).get
        if (k >= 1 && k <= MaxK) {
          val rewritten = rewrite(child, part, order, alias, k.toInt)
          if (residual.isEmpty) rewritten
          else Filter(residual.reduce(And), rewritten)
        } else f
      } else f
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** `rn <= lit` in any of its spellings (rank possibly under an
    * integral-widening cast), as the max rank kept.
    */
  private def extractLimit(e: Expression, rank: Attribute): Option[Long] = {
    def isRank(x: Expression): Boolean = x match {
      case a: Attribute => a.exprId == rank.exprId
      case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
        isRank(c.child)
      case _ => false
    }
    def lit(x: Expression): Option[Long] = x match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
    e match {
      case LessThanOrEqual(a, l) if isRank(a) => lit(l)
      case LessThan(a, l) if isRank(a) => lit(l).map(_ - 1)
      case EqualTo(a, l) if isRank(a) => lit(l).filter(_ == 1L)
      case GreaterThanOrEqual(l, a) if isRank(a) => lit(l)
      case GreaterThan(l, a) if isRank(a) => lit(l).map(_ - 1)
      case _ => None
    }
  }

  private def rewrite(
      child: LogicalPlan,
      part: Seq[Expression],
      order: Seq[SortOrder],
      rankAlias: Alias,
      k: Int): LogicalPlan = {
    val payload = child.output
    val m = order.length
    // Unique synthesized field names: an ordering column that is also
    // a payload column would otherwise duplicate its name inside the
    // struct, and downstream optimizations (GeneratorNestedColumnAliasing)
    // resolve struct fields by NAME — an ambiguous name fails analysis.
    val structExpr = CreateNamedStruct(
      (order.map(_.child) ++ payload).zipWithIndex.flatMap {
        case (e, i) => Seq(Literal(s"f$i"), e)
      })
    val directions = order.map(so =>
      (so.direction == Ascending, so.nullOrdering == NullsFirst))
    val agg = TopKRows(structExpr, directions, k)
    val aggAlias = Alias(
      AggregateExpression(agg, Complete, isDistinct = false), "graft_topk")()
    val aggregate0 = Aggregate(part, Seq(aggAlias), child)
    val elemType = structExpr.dataType.asInstanceOf[StructType]
    val pos = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val elem = AttributeReference("graft_elem", elemType, nullable = false)()
    val generate = Generate(PosExplode(aggAlias.toAttribute),
      unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
      generatorOutput = Seq(pos, elem), child = aggregate0)
    val projList = payload.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(elem, m + i, Some(s"f${m + i}")), a.name)(
        exprId = a.exprId, qualifier = a.qualifier,
        explicitMetadata = Some(a.metadata))
    } :+ Alias(Add(pos, Literal(1)), rankAlias.name)(
      exprId = rankAlias.exprId, qualifier = rankAlias.qualifier,
      explicitMetadata = Some(rankAlias.metadata))
    Project(projList, generate)
  }
}
