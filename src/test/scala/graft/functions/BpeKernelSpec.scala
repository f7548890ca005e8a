package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** Pins the production-BPE kernel (r16 verdict #1): the local
  * dictionary trainer, the two chain-apply kernels (scan and heap),
  * and the flat-in-merge-count apply cost. The cross-ENGINE legs live
  * in the q244/q245/q253/q254/qS07 DuckDB gates; this spec pins the
  * in-process identities those gates build on.
  */
class BpeKernelSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  /** Literal per-rank replace chain — the oracle's semantics, the
    * reference implementation both kernels must reproduce.
    */
  private def chainReplay(unit: String,
      merges: Seq[(Long, String, String, Long)]): Array[String] =
    merges.sortBy(_._1).foldLeft(BpeKernel.splitSymbols(unit)) {
      (s, m) => BpeKernel.mergePass(s, m._2, m._3)
    }

  test("local trainer selects exactly the Spark loop's 64 rules") {
    val fast = TextAnalysis.bpeTrainFast(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val loop = TextAnalysis.bpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(fast.toSeq === loop.toSeq)
  }

  test("scan kernel ≡ heap kernel ≡ replace chain on every corpus " +
    "unit at 1024 sequence-level rules") {
    val merges = TextAnalysis.bpeSeqMergesFor(spark, sf)
    assert(merges.length === TextAnalysis.BpeSeqMerges,
      s"corpus must support ${TextAnalysis.BpeSeqMerges} merges")
    val table = BpeRankTable.fromMerges(merges)
    val units = graft.sources.Corpus.read(spark, sf, "documents")
      .select("text").distinct().collect().map(_.getString(0))
    assert(units.length > 100)
    units.foreach { u =>
      val syms = BpeKernel.splitSymbols(u)
      val scan = BpeKernel.segmentScan(syms, table)
      val heap = BpeKernel.segmentHeap(syms, table)
      val chain = chainReplay(u, merges)
      assert(scan.toSeq === chain.toSeq, s"scan vs chain on: $u")
      assert(heap.toSeq === chain.toSeq, s"heap vs chain on: $u")
      assert(BpeKernel.segment(u, table).length === chain.length)
    }
  }

  test("randomized: scan ≡ heap ≡ replace chain on adversarial " +
    "alphabets (chained runs, re-created pairs, floor rule)") {
    val rnd = new scala.util.Random(1234)
    (1 to 40).foreach { round =>
      // Tiny alphabets maximize overlapping runs ('aaaa') and
      // later-rule re-creation of earlier pairs — the cases where
      // chain and naive priority order DIFFER, so they exercise the
      // floor rule hardest.
      val alpha = "ab" + ("cde".take(rnd.nextInt(3)))
      val units = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(60)
        (Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString,
          1L + rnd.nextInt(5))
      }
      val merges = BpeKernel.trainLocal(units, 40)
      val table = BpeRankTable.fromMerges(merges)
      units.foreach { case (u, _) =>
        val syms = BpeKernel.splitSymbols(u)
        val chain = chainReplay(u, merges)
        assert(BpeKernel.segmentScan(syms, table).toSeq === chain.toSeq,
          s"scan vs chain on '$u' round $round")
        assert(BpeKernel.segmentHeap(syms, table).toSeq === chain.toSeq,
          s"heap vs chain on '$u' round $round")
      }
      // And on UNSEEN units (apply is deployed against live data).
      (1 to 30).foreach { _ =>
        val u = Seq.fill(1 + rnd.nextInt(120))(
          alpha(rnd.nextInt(alpha.length))).mkString
        val syms = BpeKernel.splitSymbols(u)
        val chain = chainReplay(u, merges)
        assert(BpeKernel.segmentScan(syms, table).toSeq === chain.toSeq)
        assert(BpeKernel.segmentHeap(syms, table).toSeq === chain.toSeq)
      }
    }
  }

  test("doc subword count = sum of per-word counts under the " +
    "word-level table") {
    val table = BpeRankTable.fromMerges(
      TextAnalysis.bpeMergesFor(spark, sf))
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select("text").limit(50).collect().map(_.getString(0))
    docs.foreach { t =>
      val words = t.split("[ \\t\\n\\u000B\\f\\r]+").filter(_.nonEmpty)
      val expected = words.map(w =>
        BpeKernel.subwordCount(w, table).toLong).sum
      assert(BpeKernel.docSubwordCount(t, table) === expected)
    }
  }

  test("apply cost is flat in merge count: the kernel applies the " +
    "full 1024-rule table cheaper than the replace chain replays it") {
    val merges = TextAnalysis.bpeSeqMergesFor(spark, sf)
    val t64 = BpeRankTable.fromMerges(merges.take(64))
    val t1024 = BpeRankTable.fromMerges(merges)
    val units = graft.sources.Corpus.read(spark, sf, "documents")
      .select("text").distinct().collect().map(_.getString(0))
    def time(body: => Unit): Long = {
      val t0 = System.nanoTime(); body; System.nanoTime() - t0
    }
    // Warm up JIT on both paths.
    units.foreach { u => BpeKernel.segment(u, t1024); BpeKernel.segment(u, t64) }
    units.foreach(u => chainReplay(u, merges.take(64)))
    val kernel1024 = time(units.foreach(u => BpeKernel.segment(u, t1024)))
    val chain1024 = time(units.foreach(u => chainReplay(u, merges)))
    // The chain replays 1024 passes per unit; the kernel's pass count
    // is bounded by the unit length regardless of table size. A 4×
    // margin keeps the assertion robust to CI noise while still
    // separating O(L·A) from O(L·R) decisively (measured gap ~30×).
    assert(kernel1024 * 4 < chain1024,
      s"kernel ${kernel1024 / 1e6}ms vs chain ${chain1024 / 1e6}ms")
  }
}
