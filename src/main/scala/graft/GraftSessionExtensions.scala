package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct}
import graft.plans.RankLimitToTopK

/** Session-extension hook (`spark.sql.extensions=graft.GraftSessionExtensions`):
  * injects the native vector expressions into every new session's
  * function registry, so plain SQL — including sessions created by
  * `newSession()` or thrift/connect fronts — can call `cosine_sim` /
  * `dot_product` without imperative registration; and injects the
  * [[graft.plans.RankLimitToTopK]] optimizer rule so every rank-limit
  * window (the ANN top-k shape) plans as a bounded top-k aggregate.
  * This is the deployment-grade twin of
  * [[graft.functions.VectorFunctions.register]] (which mutates one
  * session's registry at runtime).
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {

  private def binary(name: String, f: (Expression, Expression) => Expression)(
      es: Seq[Expression]): Expression = es match {
    case Seq(a, b) => f(a, b)
    case _ => throw new FlacoSparkException(
      s"$name expects exactly 2 arguments, got ${es.length}")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      binary("cosine_sim", CosineSimilarity.apply) _))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      binary("dot_product", DotProduct.apply) _))
    ext.injectOptimizerRule(_ => RankLimitToTopK)
  }
}
