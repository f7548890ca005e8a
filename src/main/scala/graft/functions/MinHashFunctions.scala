package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document MinHash signature kernel.
  *
  * The declarative formulation (explode shingles → project 8 hash
  * columns → groupBy(doc).agg(min×8)) shuffles one row per shingle
  * occurrence — at 100 TB that is a corpus-token-sized exchange whose
  * only purpose is computing 8 per-document minimums. This kernel
  * computes the signature inside the scan projection instead: one
  * tight loop per document, zero extra rows, zero shuffle (the round-2
  * profile showed the explode+aggregate costing more than all the md5
  * arithmetic). Values are bit-identical to the declarative form, so
  * the DuckDB oracle keeps the explode formulation and still
  * hash-matches.
  *
  * Signature definition (mirrored in SparkEntry.minhashCtes): over
  * word 3-gram shingles s = tok[i]+' '+tok[i+1]+' '+tok[i+2],
  * value j (0-based) is the lexicographic min over shingles of the
  * 8-hex-char window (j%4)*8 of md5(s) for j<4, of md5('x'+s) for
  * j≥4. Two digests per shingle, eight 32-bit windows — windows
  * within one digest are independent md5 bits; the second digest
  * decorrelates the two rows of each LSH band.
  */
object MinHashKernel {

  private val HexDigits = "0123456789abcdef".toCharArray
  private val Space = Array[Byte](' ')
  private val XPrefix = Array[Byte]('x')

  // MessageDigest.getInstance walks the JCA provider list — once per
  // thread, not once per row of a corpus-sized scan.
  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** 8 min-window values over the doc's shingles, or null when the
    * doc has fewer than 3 tokens (no shingles — same absence the
    * explode formulation produces).
    *
    * An 8-hex-char window of the digest is 4 digest bytes, and
    * lexicographic order on lowercase hex equals unsigned order on
    * those 4 bytes — so the mins are tracked as unsigned ints (no
    * per-shingle string allocation) and formatted as hex once at the
    * end.
    */
  def signature(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val md = Md5.get()
    val digest = new Array[Byte](16)
    // Unsigned comparison via the +Long.MinValue trick folded in: track
    // xor-flipped values and compare signed.
    val mins = Array.fill(8)(Long.MaxValue)
    val tokBytes = new Array[Array[Byte]](n)
    var t = 0
    while (t < n) { tokBytes(t) = tokens.getUTF8String(t).getBytes; t += 1 }
    var i = 0
    while (i <= n - 3) {
      var d = 0
      while (d < 2) {
        md.reset()
        if (d == 1) md.update(XPrefix)
        md.update(tokBytes(i)); md.update(Space)
        md.update(tokBytes(i + 1)); md.update(Space)
        md.update(tokBytes(i + 2))
        md.digest(digest, 0, 16)
        var w = 0
        while (w < 4) {
          val j = d * 4 + w
          val win = ((digest(4 * w) & 0xffL) << 24) |
            ((digest(4 * w + 1) & 0xffL) << 16) |
            ((digest(4 * w + 2) & 0xffL) << 8) |
            (digest(4 * w + 3) & 0xffL)
          if (win < mins(j)) mins(j) = win
          w += 1
        }
        d += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](8)
    var j = 0
    while (j < 8) {
      val hex = new Array[Char](8)
      var k = 0
      while (k < 8) {
        hex(k) = HexDigits(((mins(j) >> (28 - 4 * k)) & 0xf).toInt)
        k += 1
      }
      out(j) = UTF8String.fromString(new String(hex))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[signature]] computed from a document's DISTINCT shingle array
    * ([[sortedShingles]]' output) instead of its token array — the
    * r22 shared-pass form: when a query already materializes the
    * per-doc shingle arrays (q226's truth side does), the signature
    * can be derived from them without re-tokenizing. BIT-IDENTICAL
    * to `signature(tokens)`: each mins slot is a minimum over the
    * doc's shingles, and a minimum is invariant under deduplication,
    * so hashing the distinct set yields the same 8 windows the
    * positional walk yields (MinHashSpec pins the equality). Null on
    * an empty array — exactly the `< 3 tokens` absence
    * `signature` encodes, since [[sortedShingles]] emits an empty
    * array for those docs.
    */
  def signatureFromShingles(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val md = Md5.get()
    val digest = new Array[Byte](16)
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i).getBytes
      var d = 0
      while (d < 2) {
        md.reset()
        if (d == 1) md.update(XPrefix)
        md.update(sh)
        md.digest(digest, 0, 16)
        var w = 0
        while (w < 4) {
          val j = d * 4 + w
          val win = ((digest(4 * w) & 0xffL) << 24) |
            ((digest(4 * w + 1) & 0xffL) << 16) |
            ((digest(4 * w + 2) & 0xffL) << 8) |
            (digest(4 * w + 3) & 0xffL)
          if (win < mins(j)) mins(j) = win
          w += 1
        }
        d += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](8)
    var j = 0
    while (j < 8) {
      val hex = new Array[Char](8)
      var k = 0
      while (k < 8) {
        hex(k) = HexDigits(((mins(j) >> (28 - 4 * k)) & 0xf).toInt)
        k += 1
      }
      out(j) = UTF8String.fromString(new String(hex))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** DSIR bigram feature buckets: per adjacent token pair, the first
    * 12 bits of md5(tok[i] + ' ' + tok[i+1]) modulo `buckets` —
    * BIT-IDENTICAL to the declarative
    * `cast(conv(substring(md5(concat(t, ' ', next)), 1, 3), 16, 10)
    * as int) % B` (the first 3 hex chars of a digest ARE its first
    * 12 bits), so the q240/qS04 DuckDB oracle keeps its strpos-decode
    * formulation and still hash-matches. One tight loop per document
    * with a reused digest — the declarative form paid a fresh
    * MessageDigest, a hex-string round trip and a base-16 string
    * parse per bigram (the q240 fit+score profile was dominated by
    * exactly that churn).
    */
  def dsirBuckets(tokens: ArrayData, buckets: Int): ArrayData = {
    val n = tokens.numElements()
    val m = math.max(n - 1, 0)
    val out = new Array[Int](m)
    val md = Md5.get()
    var i = 0
    while (i < m) {
      md.reset()
      md.update(tokens.getUTF8String(i).getBytes)
      md.update(Space)
      md.update(tokens.getUTF8String(i + 1).getBytes)
      val d = md.digest()
      val h12 = ((d(0) & 0xff) << 4) | ((d(1) & 0xff) >>> 4)
      out(i) = h12 % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash over the token multiset, bit-identical to the
    * explode formulation (and the DuckDB oracle): vote p (1-based
    * hex-digit position of md5(token)) is +1 when the digit ≥ 8 else
    * −1; bit p of the result is set when the vote sum is positive,
    * weighted 2^(32−p). Null for an empty token array — the explode
    * formulation emits no row for such docs.
    */
  def simhash32(tokens: ArrayData): Any = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = Md5.get()
    val votes = new Array[Int](32)
    var t = 0
    while (t < n) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(t).getBytes)
      var p = 0
      while (p < 32) {
        val b = digest(p >> 1)
        val nib = if ((p & 1) == 0) (b >> 4) & 0xf else b & 0xf
        votes(p) += (if ((nib & 8) != 0) 1 else -1)
        p += 1
      }
      t += 1
    }
    var acc = 0L
    var p = 0
    while (p < 32) { if (votes(p) > 0) acc |= 1L << (31 - p); p += 1 }
    java.lang.Long.valueOf(acc)
  }

  /** 64-bit SimHash — vote p (0-based over the first 64 BITS of
    * md5(token), MSB-first) is +1 when that bit is set else −1; bit
    * (63−p) of the result is set when the sum is positive. The
    * production width (Manku et al. use 64): 16-bit bands keep
    * blocking buckets sparse where the 32-bit hash's 8-bit bands
    * saturate by the birthday bound (measured: exponent 1.79 at 10×
    * sf0.1 for 32-bit banding). Null for an empty token array.
    */
  def simhash64(tokens: ArrayData): Any = {
    val n = tokens.numElements()
    if (n == 0) return null
    val md = Md5.get()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(t).getBytes)
      var p = 0
      while (p < 64) {
        val bit = (digest(p >> 3) >> (7 - (p & 7))) & 1
        votes(p) += (if (bit != 0) 1 else -1)
        p += 1
      }
      t += 1
    }
    var acc = 0L
    var p = 0
    while (p < 64) { if (votes(p) > 0) acc |= 1L << (63 - p); p += 1 }
    java.lang.Long.valueOf(acc)
  }

  private val SpaceUtf8 = UTF8String.fromString(" ")

  /** Distinct word-3-gram shingles of a token array, sorted (binary
    * UTF8 order) — the per-document half of pair verification,
    * computed ONCE per doc so a hub document in m candidate pairs is
    * not re-shingled m times. Empty array below 3 tokens.
    */
  def sortedShingles(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i <= n - 3) {
      set.add(UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
        tokens.getUTF8String(i + 1), SpaceUtf8, tokens.getUTF8String(i + 2)))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Occurrence count of the most frequent word n-gram in the token
    * array (n consecutive tokens joined by one space), or null when
    * the doc has fewer than n tokens. One hash-map pass per document —
    * the Gopher-style repetition signal without a per-gram explode.
    */
  def topGramCount(tokens: ArrayData, n: Int): Any = {
    val t = tokens.numElements()
    if (t < n) return null
    val counts = new java.util.HashMap[String, Integer]()
    var max = 0
    var i = 0
    while (i <= t - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens.getUTF8String(i + j).toString)
        j += 1
      }
      val c = counts.merge(sb.toString, Integer.valueOf(1), (a, b) =>
        Integer.valueOf(a.intValue() + b.intValue()))
      if (c.intValue() > max) max = c.intValue()
      i += 1
    }
    java.lang.Long.valueOf(max.toLong)
  }

  /** Count of the doc's DISTINCT word-3-gram shingles satisfying
    * `test` — the ONE definition of the decontamination shingle walk,
    * shared by the exact-set kernel ([[shingleHits]]) and the Bloom
    * prefilter ([[BloomKernel.shingleBloomHits]]) so the two paths
    * cannot drift. The local hit-set dedups a doc's repeated
    * shingles; it holds matches only, so its size is bounded by the
    * matching universe, not by document length.
    */
  def countMatchingShingles(tokens: ArrayData,
      test: UTF8String => Boolean): Long = {
    val n = tokens.numElements()
    if (n < 3) return 0L
    val hits = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
        tokens.getUTF8String(i + 1), SpaceUtf8, tokens.getUTF8String(i + 2))
      if (test(sh)) hits.add(sh)
      i += 1
    }
    hits.size.toLong
  }

  /** Count of DISTINCT word-3-gram shingles of the token array that
    * are members of `set` — the corpus side of benchmark
    * decontamination as one per-document pass: no shingle explode, no
    * per-shingle rows into any exchange (the declarative twin — the
    * oracle formulation — explodes every corpus shingle only to
    * semi-join a broadcast set and count).
    */
  def shingleHits(tokens: ArrayData,
      set: java.util.HashSet[UTF8String]): Long =
    if (set.isEmpty) 0L
    else countMatchingShingles(tokens, set.contains)

  /** Count of token POSITIONS covered by any word-3-gram present in
    * `set` — the duplicated-span mass kernel (q190): a hit at
    * position i covers i, i+1, i+2; overlapping hits count each
    * position once. One pass + a boolean array per document — the
    * positional sibling of [[shingleHits]] (which counts distinct
    * matching shingles, not covered text).
    */
  def coveredTokens(tokens: ArrayData,
      set: java.util.HashSet[UTF8String]): Long = {
    val n = tokens.numElements()
    if (n < 3 || set.isEmpty) return 0L
    val covered = new Array[Boolean](n)
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
        tokens.getUTF8String(i + 1), SpaceUtf8, tokens.getUTF8String(i + 2))
      if (set.contains(sh)) {
        covered(i) = true; covered(i + 1) = true; covered(i + 2) = true
      }
      i += 1
    }
    var c = 0L
    var j = 0
    while (j < n) { if (covered(j)) c += 1; j += 1 }
    c
  }

  /** The kept text after SPAN EXCISION (q231) — [[coveredTokens]]'
    * fix-step sibling (Lee et al. 2022's remedy, not just its
    * signal): drop every token position covered by a `set` 3-gram,
    * rejoin the survivors with single spaces. Same one-pass boolean
    * mark as the counter, then one concat — no per-token rows. A doc
    * below 3 tokens (or an empty set) rejoins unchanged; a fully
    * covered doc returns the empty string.
    */
  def exciseShared(tokens: ArrayData,
      set: java.util.HashSet[UTF8String]): UTF8String = {
    val n = tokens.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val covered = new Array[Boolean](n)
    if (n >= 3 && !set.isEmpty) {
      var i = 0
      while (i <= n - 3) {
        val sh = UTF8String.concat(tokens.getUTF8String(i), SpaceUtf8,
          tokens.getUTF8String(i + 1), SpaceUtf8, tokens.getUTF8String(i + 2))
        if (set.contains(sh)) {
          covered(i) = true; covered(i + 1) = true; covered(i + 2) = true
        }
        i += 1
      }
    }
    joinKept(tokens, covered)
  }

  /** [[exciseShared]] given EXPLICIT covered positions (q231b — the
    * Bloom-ladder leg computes positions via a distributed verified
    * join and hands them to the scan): same one-pass cut, identical
    * rejoin, so the two legs cannot drift in the string they build.
    */
  def exciseAt(tokens: ArrayData, positions: ArrayData): UTF8String = {
    val n = tokens.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val covered = new Array[Boolean](n)
    val m = positions.numElements()
    var i = 0
    while (i < m) {
      val p = positions.getLong(i)
      if (p >= 0 && p < n) covered(p.toInt) = true
      i += 1
    }
    joinKept(tokens, covered)
  }

  private def joinKept(tokens: ArrayData,
      covered: Array[Boolean]): UTF8String = {
    val n = tokens.numElements()
    var kept = 0
    var j = 0
    while (j < n) { if (!covered(j)) kept += 1; j += 1 }
    if (kept == 0) return UTF8String.EMPTY_UTF8
    val parts = new Array[UTF8String](kept)
    var k = 0
    j = 0
    while (j < n) {
      if (!covered(j)) { parts(k) = tokens.getUTF8String(j); k += 1 }
      j += 1
    }
    UTF8String.concatWs(SpaceUtf8, parts: _*)
  }

  /** Exact Jaccard similarity of two SORTED DISTINCT shingle arrays
    * (as produced by [[sortedShingles]]): one merge pass, no per-pair
    * set construction. Unrounded — callers apply the engine's round
    * so both engines round identically. 0.0 when either side is empty.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0.0
    var i = 0
    var j = 0
    var common = 0
    while (i < n && j < m) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common.toDouble / (n + m - common)
  }
}

/** `simhash32(tokensArray)` → the 32-bit SimHash as a long (null for
  * docs with no tokens). Like [[MinHashSignature]], a per-document
  * scan-projection kernel replacing a token explode + 32-vote
  * aggregation — zero extra rows, zero shuffle; the declarative twin
  * remains the oracle formulation.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.simhash32(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.MinHashKernel.simhash32($c);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `simhash64(tokensArray)` → the 64-bit SimHash as a long (null for
  * docs with no tokens) — [[SimHash32]]'s production-width sibling
  * for banded near-dup blocking (q161).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.MinHashKernel.simhash64($c);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `top_gram_count(tokensArray)` → occurrence count of the doc's most
  * frequent word n-gram as a long (null below n tokens); the same
  * per-document scan-kernel shape as [[SimHash32]].
  */
case class TopGramCount(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"top_gram_count: n must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.topGramCount(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.MinHashKernel.topGramCount($c, $n);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Long) $boxed).longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `dsir_buckets(tokensArray, B)` → the doc's bigram feature buckets
  * (one int per adjacent token pair), [[MinHashKernel.dsirBuckets]].
  * `buckets` must not exceed 4096 — the kernel draws 12 digest bits.
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(buckets >= 1 && buckets <= 4096,
    s"dsir_buckets: buckets must be in [1, 4096], got $buckets")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.dsirBuckets(input.asInstanceOf[ArrayData], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.dsirBuckets($c, $buckets)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `sorted_shingles(tokensArray)` → the doc's distinct word 3-gram
  * shingles as a sorted array — computed once per document so pair
  * verification never re-shingles a hub document per pair.
  */
case class SortedShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sortedShingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.sortedShingles($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_jaccard(shinglesA, shinglesB)` → exact Jaccard of two
  * [[SortedShingles]] arrays, one merge pass per row. The declarative
  * twin (explode both shingle sets, join on the shared shingle, count,
  * join sizes) costs five exchanges; for VERIFICATION of an
  * LSH-candidate pair — where both shingle arrays are already on the
  * row — the per-row kernel is the right shape at any scale.
  */
case class ShingleJaccard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashKernel.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MinHashKernel.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `shingle_hits_in_set(tokensArray)` → count of the doc's distinct
  * word-3-gram shingles present in a broadcast shingle universe — the
  * decontamination probe as a scan-projection kernel. The set rides a
  * Spark `Broadcast` (shipped once per executor, fetched lazily), not
  * a literal (which would serialize the universe into every task
  * binary and bloat the plan string). Codegen unwraps the broadcast
  * once per operator instance into a mutable member, so the per-row
  * call touches only the local HashSet.
  */
case class ShingleHitsInSet(child: Expression,
    bench: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleHits(input.asInstanceOf[ArrayData], bench.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("benchShingles", bench,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val setVar = ctx.addMutableState("java.util.HashSet", "benchSet",
      v => s"$v = (java.util.HashSet) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.shingleHits($c, $setVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_coverage(tokensArray)` → token positions covered by any
  * broadcast-set 3-gram ([[MinHashKernel.coveredTokens]]); the same
  * broadcast plumbing as [[ShingleHitsInSet]].
  */
case class ShingleCoverage(child: Expression,
    shared: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.coveredTokens(input.asInstanceOf[ArrayData], shared.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sharedShingles", shared,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val setVar = ctx.addMutableState("java.util.HashSet", "sharedSet",
      v => s"$v = (java.util.HashSet) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.coveredTokens($c, $setVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `excise_shared(tokensArray)` → the kept text after removing every
  * token covered by a broadcast-set 3-gram
  * ([[MinHashKernel.exciseShared]]); the [[ShingleCoverage]] plumbing
  * with a STRING result — the excision twin of the coverage counter.
  */
case class ExciseShared(child: Expression,
    shared: org.apache.spark.broadcast.Broadcast[java.util.HashSet[UTF8String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.exciseShared(input.asInstanceOf[ArrayData], shared.value)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sharedShingles", shared,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val setVar = ctx.addMutableState("java.util.HashSet", "sharedSet",
      v => s"$v = (java.util.HashSet) $bcRef.value();")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.exciseShared($c, $setVar)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `excise_at(tokensArray, positionsArray)` → the kept text after
  * removing the listed token positions
  * ([[MinHashKernel.exciseAt]]) — q231b's scan-side cut, fed by the
  * distributed verified-coverage join instead of a broadcast set.
  */
case class ExciseAt(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(LongType))
  override def dataType: DataType = StringType

  override def nullSafeEval(toks: Any, pos: Any): Any =
    MinHashKernel.exciseAt(toks.asInstanceOf[ArrayData],
      pos.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"graft.functions.MinHashKernel.exciseAt($t, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `minhash_signature(tokensArray)` → array of 8 hex-window strings
  * (null for docs with no shingles). Codegen'd via a static kernel
  * call so the projection stays inside whole-stage codegen.
  */
case class MinHashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.signature($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** [[MinHashSignature]] over a precomputed distinct-shingle array —
  * see [[MinHashKernel.signatureFromShingles]] for the equality
  * argument.
  */
case class MinHashSignatureFromShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.signatureFromShingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.signatureFromShingles($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashFunctions {
  import GraftSqlBridge.{column, expression}

  def minhash_signature(tokens: Column): Column =
    column(MinHashSignature(expression(tokens)))

  def minhash_signature_from_shingles(shingles: Column): Column =
    column(MinHashSignatureFromShingles(expression(shingles)))

  def sorted_shingles(tokens: Column): Column =
    column(SortedShingles(expression(tokens)))

  def shingle_jaccard(a: Column, b: Column): Column =
    column(ShingleJaccard(expression(a), expression(b)))

  def simhash32(tokens: Column): Column =
    column(SimHash32(expression(tokens)))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  def shingle_hits_in_set(tokens: Column,
      bench: org.apache.spark.broadcast.Broadcast[java.util.HashSet[
        org.apache.spark.unsafe.types.UTF8String]]): Column =
    column(ShingleHitsInSet(expression(tokens), bench))

  def top_gram_count(tokens: Column, n: Int): Column =
    column(TopGramCount(expression(tokens), n))

  def dsir_buckets(tokens: Column, buckets: Int): Column =
    column(DsirBuckets(expression(tokens), buckets))

  def shingle_coverage(tokens: Column,
      shared: org.apache.spark.broadcast.Broadcast[java.util.HashSet[
        org.apache.spark.unsafe.types.UTF8String]]): Column =
    column(ShingleCoverage(expression(tokens), shared))

  def excise_shared(tokens: Column,
      shared: org.apache.spark.broadcast.Broadcast[java.util.HashSet[
        org.apache.spark.unsafe.types.UTF8String]]): Column =
    column(ExciseShared(expression(tokens), shared))

  def excise_at(tokens: Column, positions: Column): Column =
    column(ExciseAt(expression(tokens), expression(positions)))
}
