package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic Bloom filter over shingle strings — the
  * decontamination PREFILTER for when the eval-set shingle universe
  * outgrows an executor-resident exact HashSet: the bit array is
  * ~12 bits per element regardless of shingle length, so it ships to
  * every executor at a fraction of the exact set's size, and the
  * exact verification that follows joins against the DISTRIBUTED
  * eval shingle table — no broadcast of the full universe anywhere.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (index_i =
  * h1 + i·h2 over k probes) with h1/h2 taken from the two 64-bit
  * halves of md5(shingle) — deterministic, seed-free, identical at
  * build (driver) and probe (executor) time. No RNG, no
  * engine-specific hash: rebuildable bit-identically anywhere.
  */
object BloomKernel {

  val ProbesK = 7

  /** Bits sized at ~12 per element (FP ≈ 0.3% at k=7), rounded up to
    * whole 64-bit words; at least one word so an empty build still
    * probes safely. Long arithmetic throughout — an Int bit-count
    * would wrap at ~180M elements and silently collapse the filter
    * to one word.
    */
  def wordsFor(n: Long): Int = {
    val MaxWords = Int.MaxValue - 8L    // HotSpot's array-size ceiling
    val words = (n * 12 + 63) / 64
    if (words > MaxWords)
      System.err.println(s"[BloomKernel] $n elements exceeds the max " +
        "addressable bit array — FP rate degrades below the " +
        "12-bits/element design; shard the filter before trusting it")
    math.max(1L, math.min(words, MaxWords)).toInt
  }

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def h64(d: Array[Byte], off: Int): Long = {
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(off + i) & 0xffL); i += 1 }
    h
  }

  private def setBit(words: Array[Long], idx: Long): Unit = {
    val m = words.length.toLong * 64
    val b = java.lang.Long.remainderUnsigned(idx, m)
    words((b >>> 6).toInt) |= 1L << (b & 63)
  }

  private def testBit(words: Array[Long], idx: Long): Boolean = {
    val m = words.length.toLong * 64
    val b = java.lang.Long.remainderUnsigned(idx, m)
    (words((b >>> 6).toInt) & (1L << (b & 63))) != 0
  }

  def add(words: Array[Long], s: UTF8String): Unit = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val h1 = h64(d, 0); val h2 = h64(d, 8)
    var i = 0
    while (i < ProbesK) { setBit(words, h1 + i * h2); i += 1 }
  }

  def mightContain(words: Array[Long], s: UTF8String): Boolean = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val h1 = h64(d, 0); val h2 = h64(d, 8)
    var i = 0
    while (i < ProbesK) {
      if (!testBit(words, h1 + i * h2)) return false
      i += 1
    }
    true
  }

  /** Count of DISTINCT word-3-gram shingles of the token array that
    * bloom-test positive — an upper bound on the exact hit count
    * (no false negatives), used to prefilter the corpus to candidate
    * documents before exact verification. The shingle iteration is
    * [[MinHashKernel.countMatchingShingles]] — ONE definition of the
    * 3-gram walk shared with the exact-set kernel, so the two
    * decontamination paths cannot drift.
    */
  def shingleBloomHits(tokens: ArrayData, words: Array[Long]): Long =
    MinHashKernel.countMatchingShingles(tokens, s => mightContain(words, s))

  private val SpaceUtf8 = UTF8String.fromString(" ")

  /** Every token POSITION whose word-3-gram bloom-tests positive, as
    * (pos, shingle) structs — the POSITIONAL prefilter of the q190b
    * span-coverage ladder. Unlike [[shingleBloomHits]] (distinct
    * count), positions repeat when a shingle recurs in a doc: span
    * coverage needs every occurrence. Shingle strings materialize
    * ONLY for bloom-positive positions, so the explode that follows
    * is bounded by true shared shingles + the ~0.3% FP tail (removed
    * by the exact verification join), never by the corpus.
    */
  def bloomHitShingles(tokens: ArrayData, words: Array[Long]): ArrayData = {
    val n = tokens.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
        tokens.getUTF8String(i + 1), SpaceUtf8, tokens.getUTF8String(i + 2))
      if (mightContain(words, sh))
        out += org.apache.spark.sql.catalyst.InternalRow(i.toLong, sh)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** `shingle_bloom_hits(tokensArray)` → count of the doc's distinct
  * shingles that bloom-test positive against a broadcast bit array —
  * the same scan-kernel shape as [[ShingleHitsInSet]], with only the
  * compact bits riding the broadcast.
  */
case class ShingleBloomHits(child: Expression,
    bits: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    BloomKernel.shingleBloomHits(input.asInstanceOf[ArrayData], bits.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBits", bits,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val wordsVar = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomKernel.shingleBloomHits($c, $wordsVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `bloom_hit_shingles(tokensArray)` → array<struct<pos,shingle>> of
  * bloom-positive 3-gram positions ([[BloomKernel.bloomHitShingles]])
  * — the same broadcast-bits plumbing as [[ShingleBloomHits]], feeding
  * an explode bounded by bloom-positive positions only.
  */
case class BloomHitShingles(child: Expression,
    bits: org.apache.spark.broadcast.Broadcast[Array[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("shingle", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    BloomKernel.bloomHitShingles(input.asInstanceOf[ArrayData], bits.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBits", bits,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val wordsVar = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomKernel.bloomHitShingles($c, $wordsVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BloomFunctions {
  import GraftSqlBridge.{column, expression}

  def shingle_bloom_hits(tokens: Column,
      bits: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    column(ShingleBloomHits(expression(tokens), bits))

  def bloom_hit_shingles(tokens: Column,
      bits: org.apache.spark.broadcast.Broadcast[Array[Long]]): Column =
    column(BloomHitShingles(expression(tokens), bits))
}
