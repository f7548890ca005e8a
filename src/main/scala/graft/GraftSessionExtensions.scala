package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ChunkTokens, CosineSimilarity, DotProduct, MinHashSignature, NfcNormalize, ShingleJaccard, SignBits64, SimHash32, SortedShingles, StripAccents, TopGramCount, WidthBucket}
import graft.plans.RankLimitToTopK

/** Arity-validating function builders — ONE definition shared by the
  * extension-injection path ([[GraftSessionExtensions]]) and the
  * runtime registration path ([[graft.functions.VectorFunctions
  * .register]], which OVERRIDES the injected builders via
  * createOrReplace), so the two can never diverge on how a
  * wrong-argument-count call fails.
  */
private[graft] object FunctionBuilders {

  def unary(name: String, f: Expression => Expression)(
      es: Seq[Expression]): Expression = es match {
    case Seq(a) => f(a)
    case _ => throw new FlacoSparkException(
      s"$name expects exactly 1 argument, got ${es.length}")
  }

  def binary(name: String, f: (Expression, Expression) => Expression)(
      es: Seq[Expression]): Expression = es match {
    case Seq(a, b) => f(a, b)
    case _ => throw new FlacoSparkException(
      s"$name expects exactly 2 arguments, got ${es.length}")
  }
}

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
  import FunctionBuilders.{binary, unary}

  private def inject(ext: SparkSessionExtensions, name: String,
      clazz: Class[_], builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "cosine_sim", classOf[CosineSimilarity],
      binary("cosine_sim", CosineSimilarity.apply))
    inject(ext, "dot_product", classOf[DotProduct],
      binary("dot_product", DotProduct.apply))
    inject(ext, "minhash_signature", classOf[MinHashSignature],
      unary("minhash_signature", MinHashSignature.apply))
    inject(ext, "simhash32", classOf[SimHash32],
      unary("simhash32", SimHash32.apply))
    inject(ext, "sorted_shingles", classOf[SortedShingles],
      unary("sorted_shingles", SortedShingles.apply))
    inject(ext, "shingle_jaccard", classOf[ShingleJaccard],
      binary("shingle_jaccard", ShingleJaccard.apply))
    // top_gram_count(tokens, n) — n must be a literal positive int.
    inject(ext, "top_gram_count", classOf[TopGramCount], {
      case Seq(a, org.apache.spark.sql.catalyst.expressions.Literal(n: Int,
          org.apache.spark.sql.types.IntegerType)) if n >= 1 =>
        TopGramCount(a, n)
      case es => throw new FlacoSparkException(
        "top_gram_count expects (tokensArray, literal int n >= 1); got " +
          (if (es.length == 2) s"second argument ${es(1).sql}"
           else s"${es.length} arguments"))
    })
    // chunk_tokens(tokens, chunk, stride) — the chunking UDTF; window
    // and stride must be literal positive ints (they shape the output
    // schema's semantics, not per-row data).
    inject(ext, "chunk_tokens", classOf[ChunkTokens], {
      case Seq(a,
          org.apache.spark.sql.catalyst.expressions.Literal(c: Int,
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.catalyst.expressions.Literal(s: Int,
            org.apache.spark.sql.types.IntegerType)) if c >= 1 && s >= 1 =>
        ChunkTokens(a, c, s)
      case es if es.length != 3 => throw new FlacoSparkException(
        "chunk_tokens expects (tokensArray, literal int chunk >= 1, " +
          s"literal int stride >= 1); got ${es.length} arguments")
      case es => throw new FlacoSparkException(
        "chunk_tokens expects chunk and stride to be literal positive " +
          s"integers; got chunk=${es(1).sql}, stride=${es(2).sql}")
    })
    inject(ext, "sign_bits64", classOf[SignBits64],
      unary("sign_bits64", SignBits64.apply))
    inject(ext, "nfc_normalize", classOf[NfcNormalize],
      unary("nfc_normalize", NfcNormalize.apply))
    inject(ext, "strip_accents", classOf[StripAccents],
      unary("strip_accents", StripAccents.apply))
    // width_bucket(operand, b1, b2, count) — PG's histogram bucketing.
    inject(ext, "width_bucket", classOf[WidthBucket], {
      case Seq(a, b, c, d) => WidthBucket(a, b, c, d)
      case es => throw new FlacoSparkException(
        s"width_bucket expects exactly 4 arguments, got ${es.length}")
    })
    ext.injectOptimizerRule(_ => RankLimitToTopK)
  }
}
