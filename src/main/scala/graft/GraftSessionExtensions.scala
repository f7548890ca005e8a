package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{CosineSimilarity, DotProduct}

/** Session-extension hook (`spark.sql.extensions=graft.GraftSessionExtensions`):
  * injects the native vector expressions into every new session's
  * function registry, so plain SQL — including sessions created by
  * `newSession()` or thrift/connect fronts — can call `cosine_sim` /
  * `dot_product` without imperative registration. This is the
  * deployment-grade twin of [[graft.functions.VectorFunctions.register]]
  * (which mutates one session's registry at runtime).
  */
class GraftSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(es.head, es(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(es.head, es(1))))
  }
}
