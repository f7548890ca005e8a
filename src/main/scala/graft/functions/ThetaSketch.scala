package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV/Theta distinct-count sketch with NATIVE set algebra — the
  * r17 verdict's #5: q169 documents that HLL intersection via
  * inclusion–exclusion carries error scaling with |A∪B| ("production
  * intersects Theta sketches natively; Spark 4 ships only HLL").
  * This is that production sketch, Spark-expressible as a typed
  * UDAF over PRE-HASHED values (the hash — `xxhash64 & Long.Max` —
  * stays in whole-stage codegen; the aggregator only maintains the
  * bottom-k order statistics).
  *
  * Model (Beyer et al. KMV / the DataSketches Theta family): hash
  * values are uniform positions in [0, 2^63); a sketch keeps the k
  * smallest DISTINCT positions. θ = the k-th smallest position
  * (2^63, i.e. 1.0, while unsaturated); the RETAINED set is the
  * positions strictly below θ (k−1 when saturated — all of them
  * before that), each a uniform sample of the distinct universe at
  * rate θ. Hence:
  *   estimate(X)   = |R_X| / θ_X            (exact while unsaturated)
  *   A ∩ B         = |R_A ∩ R_B below θ| / θ,  θ = min(θ_A, θ_B)
  *   A \ B         = |R_A \ R_B below θ| / θ
  *   union(A, B)   = a KMV sketch again (merge, keep bottom k)
  * The intersection's relative error scales with the number of
  * RETAINED MATCHES (≈1/√c), i.e. with the intersection itself —
  * the property inclusion–exclusion lacks and the reason Theta is
  * the warehouse set-ops sketch. Mergeability makes it
  * re-aggregatable exactly like the q166/q173 HLL warehouse.
  *
  * Sketches are plain `array<bigint>` columns (sorted ascending) —
  * transparent to both engines; the DuckDB gate replays the exact
  * twin and pins the in-band bit (the q20/q169 idiom). The set-op
  * functions are Scala UDFs BY DESIGN: they run on dimension-sized
  * sketch relations (one row per event type/day), never the corpus —
  * the corpus-side work is the codegen'd hash + this aggregate.
  */
object ThetaSketch {

  /** Default sketch size: rsd ≈ 1/√(k−1) ≈ 3.1% at 1024. */
  val DefaultK = 1024

  /** 2^63 as a double — positions live in [0, 2^63). */
  private val PosRange = 9.223372036854775808e18

  /** Insert one position, keeping the k smallest distinct. */
  def insert(buf: Seq[Long], v: Long, k: Int): Seq[Long] = {
    val a = buf.toIndexedSeq
    val i = lowerBound(a, v)
    if (i < a.length && a(i) == v) buf
    else if (a.length < k) (a.take(i) :+ v) ++ a.drop(i)
    else if (v >= a.last) buf
    else ((a.take(i) :+ v) ++ a.drop(i)).dropRight(1)
  }

  /** Merge two sketches (set union of positions, keep bottom k). */
  def merge(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    if (a.isEmpty) b.take(k)
    else if (b.isEmpty) a.take(k)
    else (a ++ b).distinct.sorted.take(k)

  private def lowerBound(a: IndexedSeq[Long], v: Long): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** θ in the position domain: the k-th smallest position while
    * saturated, 2^63 (= sampling rate 1.0) before that.
    */
  private[functions] def thetaValue(sk: Seq[Long], k: Int): Long =
    if (sk.length < k) Long.MaxValue else sk.last

  /** Retained-below-θ count (θ given in the position domain). */
  private[functions] def countBelow(sk: Seq[Long], theta: Long): Int = {
    var n = 0
    val it = sk.iterator
    var go = true
    while (go && it.hasNext) {
      if (it.next() < theta) n += 1 else go = false
    }
    n
  }

  private def rate(theta: Long): Double =
    if (theta == Long.MaxValue) 1.0 else theta.toDouble / PosRange

  /** Distinct estimate — exact while the sketch is unsaturated. */
  def estimateOf(sk: Seq[Long], k: Int): Double = {
    val t = thetaValue(sk, k)
    countBelow(sk, t) / rate(t)
  }

  /** Retained matches below min-θ — the integer the intersection
    * estimate divides by the sampling rate (exposed for the exact
    * identity tests: intersect + aNotB counts = A's below-θ count).
    */
  private[functions] def intersectCount(a: Seq[Long], b: Seq[Long],
      k: Int): (Int, Long) = {
    val t = math.min(thetaValue(a, k), thetaValue(b, k))
    val bs = b.toIndexedSeq
    var n = 0
    a.foreach { v =>
      if (v < t) {
        val i = lowerBound(bs, v)
        if (i < bs.length && bs(i) == v) n += 1
      }
    }
    (n, t)
  }

  private[functions] def aNotBCount(a: Seq[Long], b: Seq[Long],
      k: Int): (Int, Long) = {
    val t = math.min(thetaValue(a, k), thetaValue(b, k))
    val bs = b.toIndexedSeq
    var n = 0
    a.foreach { v =>
      if (v < t) {
        val i = lowerBound(bs, v)
        if (i >= bs.length || bs(i) != v) n += 1
      }
    }
    (n, t)
  }

  /** |A ∩ B| estimate — error scales with the intersection sample,
    * not the union (exact when both sketches are unsaturated).
    */
  def intersectEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val (n, t) = intersectCount(a, b, k)
    n / rate(t)
  }

  /** |A \ B| estimate (exact when both sketches are unsaturated). */
  def aNotBEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val (n, t) = aNotBCount(a, b, k)
    n / rate(t)
  }

  // ---- Column surface ----

  /** Build a sketch from a pre-hashed NON-NEGATIVE position column
    * (`xxhash64(x) & 9223372036854775807` — keep the hash in
    * codegen; see [[positionOf]]).
    */
  def theta_sketch_agg(hashedPos: Column, k: Int = DefaultK): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong).apply(hashedPos)

  /** The position expression for a raw column — SQL-text shared so
    * every call site hashes identically.
    */
  def positionOf(c: Column): Column = {
    import org.apache.spark.sql.functions.{expr => e}
    org.apache.spark.sql.functions.xxhash64(c)
      .bitwiseAND(e("9223372036854775807L"))
  }

  def theta_estimate(sk: Column, k: Int = DefaultK): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (s: Seq[Long]) => estimateOf(s, k))
    f(sk)
  }

  def theta_union(a: Column, b: Column, k: Int = DefaultK): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (x: Seq[Long], y: Seq[Long]) => merge(x, y, k))
    f(a, b)
  }

  def theta_intersect_estimate(a: Column, b: Column,
      k: Int = DefaultK): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (x: Seq[Long], y: Seq[Long]) => intersectEstimate(x, y, k))
    f(a, b)
  }

  def theta_anotb_estimate(a: Column, b: Column,
      k: Int = DefaultK): Column = {
    val f = org.apache.spark.sql.functions.udf(
      (x: Seq[Long], y: Seq[Long]) => aNotBEstimate(x, y, k))
    f(a, b)
  }
}

/** The bottom-k aggregator: map-side partials are bounded buffers
  * (≤ 4k longs per group per partition), merged losslessly — the
  * same scale contract as hll_sketch_agg.
  *
  * Buffer discipline: a per-row sorted-insert copies O(k) elements
  * per input (the r18 bench measured it), so the buffer is an
  * UNSORTED append log (Vector `:+` is effectively O(1)) compacted
  * to the sorted distinct bottom-k whenever it reaches 2k —
  * amortized O(log k) per row, ≤ 2k longs shipped per partial, and
  * sound by construction (nothing is ever dropped except by a
  * compaction, which keeps the exact bottom-k of everything
  * retained). Deliberately NO per-row threshold skip: a buffer's
  * length says nothing about whether it is a compacted prefix or an
  * unsorted duplicate-bearing tail, so any "v ≥ buf(k−1) can't
  * qualify" shortcut mis-fires — a duplicate-heavy stream drove
  * buf(k−1) to a repeat of the minimum and dropped genuinely-new
  * distinct values (the spec's duplicate-stream test pins the
  * failure).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private def compact(b: Seq[Long]): Seq[Long] =
    b.distinct.sorted.take(k)
  override def zero: Seq[Long] = Vector.empty
  override def reduce(buf: Seq[Long], v: Long): Seq[Long] = {
    val b = buf :+ v
    if (b.length >= 2 * k) compact(b) else b
  }
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    compact(a ++ b)
  override def finish(buf: Seq[Long]): Seq[Long] = compact(buf)
  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
