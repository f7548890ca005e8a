package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The KMV/Theta sketch contract (q257): bottom-k maintenance,
  * exactness while unsaturated, the native-intersection identity,
  * lossless mergeability (the property that makes it a warehouse
  * sketch), and estimation accuracy in the saturated regime.
  */
class ThetaSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def pos(x: Any): Long =
    // Any deterministic uniform-ish 63-bit hash works for the unit
    // tests; the query side uses codegen'd xxhash64.
    scala.util.hashing.MurmurHash3.stringHash(x.toString).toLong
      .*(2654435761L) & Long.MaxValue

  test("insert/merge keep the k smallest distinct positions (vs " +
    "brute force, randomized)") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val k = 1 + rnd.nextInt(12)
      val xs = Seq.fill(200)(rnd.nextInt(60).toLong * 977L)
      val sk = xs.foldLeft(Seq.empty[Long])(ThetaSketch.insert(_, _, k))
      val brute = xs.distinct.sorted.take(k)
      assert(sk === brute)
      // Merge of random splits equals the sketch of the whole — KMV
      // union is LOSSLESS (bottom-k of a union is derivable from the
      // two bottom-ks).
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length))
      val a = l.foldLeft(Seq.empty[Long])(ThetaSketch.insert(_, _, k))
      val b = r.foldLeft(Seq.empty[Long])(ThetaSketch.insert(_, _, k))
      assert(ThetaSketch.merge(a, b, k) === brute)
      assert(ThetaSketch.merge(b, a, k) === brute)
    }
  }

  test("aggregator buffer (append log + compaction) finishes to the " +
    "exact bottom-k on duplicate-heavy streams") {
    val rnd = new scala.util.Random(23)
    (1 to 20).foreach { _ =>
      val k = 1 + rnd.nextInt(20)
      val agg = new KmvAgg(k)
      // Duplicate-heavy, adversarially ordered: repeats of the
      // minimum pad the unsorted tail — the shape that made an r18
      // draft's per-row threshold skip drop genuinely-new distinct
      // values (caught by this test before it ever reached a gate).
      val xs = Seq.fill(500)(rnd.nextInt(40).toLong) ++
        Seq.fill(100)(0L) ++ Seq.fill(50)(rnd.nextInt(1000).toLong)
      val shuffled = rnd.shuffle(xs)
      val direct = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(direct) === xs.distinct.sorted.take(k))
      // Partition splits merge to the same sketch.
      val (l, r) = shuffled.splitAt(rnd.nextInt(shuffled.length))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === xs.distinct.sorted.take(k))
    }
  }

  test("q260 SQL bottom-k roll-up (slice∘sort∘distinct∘flatten∘" +
    "collect_list) equals the directly-built coarser sketch — " +
    "merge ≡ rebuild at both regimes") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val rows = for { d <- 0 until 14; _ <- 0 until 200 }
      yield (d / 7, d, rnd.nextInt(500).toLong)
    val df = rows.toDF("week", "day", "user_id")
    // k=16 saturated (500 distinct ≫ 16), k=4096 unsaturated: the
    // pure-SQL merge must be EXACTLY the sketch a single pass over
    // the week would build, in both regimes (KMV union losslessness
    // carried into the q260 aggregate expression).
    for (k <- Seq(16, 4096)) {
      val daily = df.groupBy($"week", $"day")
        .agg(ThetaSketch.theta_sketch_agg(
          ThetaSketch.positionOf($"user_id"), k).as("sk"))
      val rolled = daily.groupBy($"week")
        .agg(expr("slice(array_sort(array_distinct(flatten(" +
          s"collect_list(sk)))), 1, $k)").as("sk_w"))
      val direct = df.groupBy($"week")
        .agg(ThetaSketch.theta_sketch_agg(
          ThetaSketch.positionOf($"user_id"), k).as("sk_d"))
      rolled.join(direct, "week").collect().foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"week ${r.get(0)} k=$k: rolled sketch != rebuilt sketch")
      }
    }
  }

  test("unsaturated sketches are exact for estimate, intersect, " +
    "a-not-b, and union") {
    val rnd = new scala.util.Random(11)
    val k = 4096
    (1 to 10).foreach { _ =>
      val ua = (1 to 300).map(_ => rnd.nextInt(500)).distinct
      val ub = (1 to 300).map(_ => rnd.nextInt(500)).distinct
      val sa = ua.map(pos).foldLeft(Seq.empty[Long])(
        ThetaSketch.insert(_, _, k))
      val sb = ub.map(pos).foldLeft(Seq.empty[Long])(
        ThetaSketch.insert(_, _, k))
      assert(ThetaSketch.estimateOf(sa, k) === ua.size.toDouble)
      assert(ThetaSketch.intersectEstimate(sa, sb, k) ===
        ua.toSet.intersect(ub.toSet).size.toDouble)
      assert(ThetaSketch.aNotBEstimate(sa, sb, k) ===
        ua.toSet.diff(ub.toSet).size.toDouble)
      assert(ThetaSketch.estimateOf(ThetaSketch.merge(sa, sb, k), k) ===
        ua.toSet.union(ub.toSet).size.toDouble)
    }
  }

  test("native-intersection identity: intersect + aNotB counts = " +
    "A's retained-below-minθ count, exactly, saturated or not") {
    val rnd = new scala.util.Random(13)
    (1 to 10).foreach { _ =>
      val k = 64
      val sa = (1 to 5000).map(i => pos(rnd.nextInt(3000)))
        .foldLeft(Seq.empty[Long])(ThetaSketch.insert(_, _, k))
      val sb = (1 to 5000).map(i => pos(rnd.nextInt(3000) + 1500))
        .foldLeft(Seq.empty[Long])(ThetaSketch.insert(_, _, k))
      val (ni, ti) = ThetaSketch.intersectCount(sa, sb, k)
      val (nd, td) = ThetaSketch.aNotBCount(sa, sb, k)
      assert(ti === td)
      assert(ni + nd === ThetaSketch.countBelow(sa, ti))
    }
  }

  test("saturated regime: estimate and native intersection land " +
    "within 5 sigma on a randomized universe") {
    val rnd = new scala.util.Random(17)
    val k = 256
    (1 to 5).foreach { round =>
      val n = 5000 + rnd.nextInt(20000)
      val overlap = n / (2 + rnd.nextInt(3))
      val ua = (0 until n).map(i => s"a$round-$i")
      val ub = (0 until overlap).map(i => s"a$round-$i") ++
        (0 until n).map(i => s"b$round-$i")
      val sa = ua.map(pos).foldLeft(Seq.empty[Long])(
        ThetaSketch.insert(_, _, k))
      val sb = ub.map(pos).foldLeft(Seq.empty[Long])(
        ThetaSketch.insert(_, _, k))
      val estA = ThetaSketch.estimateOf(sa, k)
      val sigmaA = ua.size / math.sqrt(k - 1)
      assert(math.abs(estA - ua.size) <= 5 * sigmaA,
        s"estimate ${estA} vs ${ua.size}")
      val (c, t) = ThetaSketch.intersectCount(sa, sb, k)
      val estI = ThetaSketch.intersectEstimate(sa, sb, k)
      // Error scales with the RETAINED MATCH count c (≈est/√c) — the
      // property q169's inclusion–exclusion lacks.
      val sigmaI = if (c > 0) estI / math.sqrt(c) else overlap.toDouble
      assert(math.abs(estI - overlap) <= 5 * sigmaI + 1,
        s"intersection $estI vs $overlap (c=$c)")
    }
  }

  test("q257 on the corpus: unsaturated estimates equal the exact " +
    "twin; saturated bands hold") {
    val out = graft.operators.Events.thetaIntersections(spark, sf)
      .collect()
    assert(out.length >= 5, "expected consecutive-day pairs")
    // The day fixture must exercise PARTIAL overlap — a degenerate
    // complete-overlap pairing (A\B = 0 everywhere) would leave the
    // difference leg untested.
    assert(out.exists(_.getLong(3) > 0), "no pair with a non-empty A\\B")
    out.foreach { r =>
      assert(r.getLong(5) === r.getLong(2),
        s"hi_inter != exact_inter in $r")
      assert(r.getLong(6) === r.getLong(3),
        s"hi_anotb != exact_anotb in $r")
      assert(r.getLong(7) === r.getLong(4),
        s"hi_union != exact_union in $r")
      // Spark 4.1's native DataSketches Theta leg (lgk=12, exact
      // mode at this cardinality) must agree with the exact twin too.
      assert(r.getLong(8) === r.getLong(2),
        s"nat_inter != exact_inter in $r")
      assert(r.getLong(9) === r.getLong(3),
        s"nat_anotb != exact_anotb in $r")
      assert(r.getLong(10) === r.getLong(4),
        s"nat_union != exact_union in $r")
      assert(r.getLong(11) === 1L, s"lo_inter out of band in $r")
      assert(r.getLong(12) === 1L, s"lo_union out of band in $r")
    }
  }
}
