package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** PG's `width_bucket(operand, b1, b2, count)` — equi-width histogram
  * bucketing, the reporting primitive PG users reach for before any
  * charting layer. The reference delegates every scalar to PostgreSQL
  * (`/root/reference/src/lib.rs:46` ships raw SQL to the server), so
  * PG's contract — not a lookalike — is the surface to match
  * (published semantics, PostgreSQL docs 9.3 "Mathematical
  * Functions"):
  *
  *   - ascending bounds (b1 < b2): operand < b1 → 0 (underflow
  *     bucket), operand >= b2 → count+1 (overflow bucket), else
  *     `floor(count · (operand − b1) / (b2 − b1)) + 1`;
  *   - descending bounds (b1 > b2): the mirror — operand > b1 → 0,
  *     operand <= b2 → count+1, else
  *     `floor(count · (b1 − operand) / (b1 − b2)) + 1`;
  *   - NULL operand → NULL; count <= 0 or b1 = b2 → error (typed,
  *     per the repo's error-surface contract — PG raises SQLSTATE
  *     2201G here, the reference's abort-on-error becomes a
  *     catchable exception).
  *
  * This DuckDB build has no `width_bucket`, so the oracle encodes
  * the same contract from first principles (CASE + floor arithmetic,
  * multiply-before-divide in the same association so the IEEE
  * doubles agree bit-for-bit) — independent encodings, the q46
  * pattern. Codegen'd: the bucketing runs inside whole-stage codegen
  * in the scan projection, per-row, no shuffle.
  */
case class WidthBucket(operand: Expression, b1: Expression,
    b2: Expression, count: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {
  override def first: Expression = operand
  override def second: Expression = b1
  override def third: Expression = b2
  override def fourth: Expression = count
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, lo: Any, hi: Any, n: Any): Any =
    WidthBucket.bucket(x.asInstanceOf[Double], lo.asInstanceOf[Double],
      hi.asInstanceOf[Double], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, lo, hi, n) => {
      val cls = WidthBucket.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.bucket($x, $lo, $hi, $n);"
    })

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(operand = a, b1 = b, b2 = c, count = d)
}

object WidthBucket {
  /** The shared eval/codegen kernel (static call from generated
    * Java). Argument errors surface per-row like PG's 2201G — the
    * bounds are foldable literals in every sane call, so the check
    * costs one branch.
    */
  def bucket(x: Double, lo: Double, hi: Double, n: Int): Long = {
    if (n <= 0)
      throw new IllegalArgumentException(
        s"width_bucket: count must be positive, got $n")
    if (lo == hi)
      throw new IllegalArgumentException(
        "width_bucket: lower and upper bounds must differ")
    if (lo < hi) {
      if (x < lo) 0L
      else if (x >= hi) n + 1L
      else math.floor(n * (x - lo) / (hi - lo)).toLong + 1L
    } else {
      if (x > lo) 0L
      else if (x <= hi) n + 1L
      else math.floor(n * (lo - x) / (lo - hi)).toLong + 1L
    }
  }
}

object WidthBucketFunctions {
  import GraftSqlBridge.{column, expression}
  def width_bucket(x: Column, lo: Column, hi: Column, n: Column): Column =
    column(WidthBucket(expression(x), expression(lo), expression(hi),
      expression(n)))

  /** SQL registration: `SELECT width_bucket(v, 0, 100, 10)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "width_bucket",
      (args: Seq[Expression]) => {
        if (args.length != 4)
          throw new IllegalArgumentException(
            s"width_bucket expects 4 arguments, got ${args.length}")
        WidthBucket(args(0), args(1), args(2), args(3))
      },
      "built-in")
  }
}
