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

/** One-pass per-document character census for q177 — counts by
  * CODEPOINT (matching DuckDB's `string_split(text, '')` units):
  * total chars, alphabet size, top-character count, Σcount². The
  * declarative higher-order formulation (array_distinct + a count
  * lambda per distinct char) is O(alphabet × chars) per row and
  * materializes the char array; this is O(chars) with a single
  * hash-map (the [[graft.functions.SignBits64]] lesson applied
  * pre-emptively — measured 5.7 s → sub-second at sf0.1).
  */
object CharStatsKernel {
  def census(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(Integer.valueOf(cp), 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var top = 0L
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      sumSq += c * c
    }
    org.apache.spark.sql.catalyst.InternalRow(n, counts.size.toLong,
      top, sumSq)
  }
}

/** `char_census(str)` → struct(n_chars, alphabet, top_cnt, sum_sq). */
case class CharCensus(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("alphabet", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    CharStatsKernel.census(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharStatsKernel.census($c);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeFunctions {
  import GraftSqlBridge.{column, expression}
  def nfc_normalize(c: Column): Column = column(NfcNormalize(expression(c)))
  def strip_accents(c: Column): Column = column(StripAccents(expression(c)))
  def char_census(c: Column): Column = column(CharCensus(expression(c)))
}
