package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels — the canonicalization step every
  * web-scale dedup/fingerprint pipeline runs BEFORE hashing: the same
  * visible text can arrive precomposed (é = U+00E9) or decomposed
  * (e + U+0301) depending on the source encoder, and md5/MinHash/
  * SimHash treat those as different documents unless the corpus is
  * normalized first. Spark has no normalization builtin; these are
  * codegen'd scan-projection expressions over `java.text.Normalizer`
  * (ICU-equivalent for the canonical forms), mirrored in the DuckDB
  * oracle by its utf8proc-backed `nfc_normalize`/`strip_accents`.
  */
object UnicodeKernel {

  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // Fast path: Normalizer.isNormalized is a cheap scan and almost
    // all real text is already NFC — skip the rewrite allocation.
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose, then drop every combining mark (\\p{M}) — the
    * standard accent-fold (café→cafe, Müller→Muller). Agrees with
    * DuckDB's utf8proc `strip_accents` on canonically decomposable
    * letters; non-decomposable letterforms (ø, ł) pass through on
    * both engines.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    UTF8String.fromString(Marks.matcher(nfd).replaceAll(""))
  }
}

/** `nfc_normalize(str)` → the NFC canonical composition. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeKernel.nfc($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `strip_accents(str)` → NFD-decompose + drop combining marks. */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeKernel.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeKernel.stripAccents($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeFunctions {
  import GraftSqlBridge.{column, expression}
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def strip_accents(c: Column): Column = column(StripAccents(expression(c)))
}
