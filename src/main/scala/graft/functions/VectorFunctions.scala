package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Embedding math for the similarity-search / near-dup operators
  * (SURVEY.md §7.6). The reference has no vector ops at all (its only
  * compute is the type switch at `src/lib.rs:199-386`); these are
  * north-star extensions. Implemented as native Catalyst expressions
  * with `doGenCode` so the O(n·k·d) similarity hot loop stays inside
  * whole-stage codegen — a Scala UDF here would box every float of
  * every pair.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** dot(a, b); mismatched lengths use the common prefix. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}Acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (|a|·|b|); 0.0 when either norm is zero
  * (deterministic, avoids NaN propagation into top-k ordering).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Kernel for [[SignBits64]]. */
object SignBitsKernel {
  /** Bit (63−i) set iff element i > 0, over the first 64 elements —
    * the 1-bit (binary) quantization signature (q180). One tight loop
    * per vector; the declarative 64-term CASE chain this replaces
    * blew the whole-stage-codegen method limit and pushed the scan to
    * interpreted mode (measured 5× on the 10× sweep).
    */
  def signBits64(v: ArrayData): Long = {
    val n = math.min(v.numElements(), 64)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (v.getFloat(i) > 0f) acc |= 1L << (63 - i)
      i += 1
    }
    acc
  }
}

/** `sign_bits64(embedding)` → the packed 1-bit quantization signature
  * as a long ([[SignBitsKernel.signBits64]]).
  */
case class SignBits64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    org.apache.spark.sql.types.LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    SignBitsKernel.signBits64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignBitsKernel.signBits64($c);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorFunctions {
  import GraftSqlBridge.{column, expression}
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def sign_bits64(a: Column): Column =
    column(SignBits64(expression(a)))

  /** SQL registration: `SELECT cosine_sim(a.embedding, b.embedding)`.
    * Arity-validated exactly like the extension-injected builders —
    * this path OVERRIDES them in the registry (createOrReplace), so a
    * lax builder here would silently replace a strict one and turn a
    * clear wrong-argument-count error back into an index exception.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.FunctionBuilders.binary
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", binary("cosine_sim", CosineSimilarity.apply), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", binary("dot_product", DotProduct.apply), "built-in")
  }
}
