package graft.functions

/** BPE scale probe (r17 verdict #6): prove the apply kernel's cost is
  * flat in merge count at a REAL tokenizer vocab size — 32k merges —
  * not just the 1024 the gate corpus' adjacency capacity binds at.
  *
  * The gate corpora cap out near ~1024 sequence-level merges, so this
  * probe synthesizes a deterministic high-entropy corpus (seeded
  * Random, 36-symbol alphabet — adjacency capacity far above 32k),
  * trains the q253 dictionary-local trainer to 32,768 rules, then:
  *   1. cross-checks scan ≡ heap ≡ the literal per-rank replace
  *      chain on sampled units at 1024, 8192, and 32768 rules (the
  *      BpeKernelSpec exactness contract at production vocab size);
  *   2. asserts the STRUCTURAL flat-cost bound at every table size
  *      (merge passes ≤ unit length, whatever R is);
  *   3. times full-corpus apply at each table size, min-of-3 — the
  *      SCALING.md sweep row. The chain's cost is R passes/unit by
  *      construction, so it is timed only at 1024 (at 32k it is
  *      pointless wall-clock; its structural count IS the claim).
  *
  * Run: `sbt "runMain graft.functions.BpeScaleProbe"` — prints one
  * JSON line; record it in SCALING.md.
  */
object BpeScaleProbe {

  private def chainReplay(unit: String,
      merges: Seq[(Long, String, String, Long)]): Array[String] = {
    var syms = BpeKernel.splitSymbols(unit)
    merges.foreach { case (_, a, b, _) =>
      syms = BpeKernel.mergePass(syms, a, b)
    }
    syms
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(20260816L)
    val alpha = ('a' to 'z') ++ ('0' to '9')
    val units = (1 to 1200).map { _ =>
      val len = 120 + rnd.nextInt(80)
      (Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString, 1L)
    }
    val symTotal = units.map(u => BpeKernel.splitSymbols(u._1).length).sum

    val t0 = System.nanoTime()
    val merges = BpeKernel.trainLocal(units, 32768)
    val trainSec = (System.nanoTime() - t0) / 1e9
    require(merges.length == 32768,
      s"corpus exhausted at ${merges.length} merges — raise entropy")

    val sizes = Seq(1024, 8192, 32768)
    val tables = sizes.map(r => r -> BpeRankTable.fromMerges(merges.take(r))).toMap

    // 1. Exactness at production vocab size: sampled units, all sizes.
    val sample = rnd.shuffle(units).take(24).map(_._1)
    sizes.foreach { r =>
      val t = tables(r)
      val m = merges.take(r)
      sample.foreach { u =>
        val syms = BpeKernel.splitSymbols(u)
        val chain = chainReplay(u, m).toSeq
        require(BpeKernel.segmentScan(syms, t).toSeq == chain,
          s"scan != chain at R=$r")
        require(BpeKernel.segmentHeap(syms, t).toSeq == chain,
          s"heap != chain at R=$r")
      }
    }

    // 2. Structural flat cost: pass counts bounded by unit length at
    //    EVERY table size (the chain would be exactly R per unit).
    val passTotals = sizes.map { r =>
      val t = tables(r)
      var total = 0L
      units.foreach { case (u, _) =>
        val syms = BpeKernel.splitSymbols(u)
        val c = new BpeKernel.PassCounter
        BpeKernel.segmentHeap(syms, t, c): Unit
        require(c.n <= syms.length - 1, s"pass bound broken at R=$r")
        total += c.n
      }
      r -> total
    }.toMap

    // 3. Wall-clock sweep, min-of-3 per size (informational — the
    //    assertion above is the load-proof claim).
    def timeApply(t: BpeRankTable): Double = {
      units.foreach { case (u, _) => BpeKernel.segment(u, t): Unit } // warm
      (1 to 3).map { _ =>
        val s = System.nanoTime()
        units.foreach { case (u, _) => BpeKernel.segment(u, t): Unit }
        (System.nanoTime() - s) / 1e9
      }.min
    }
    val applySecs = sizes.map(r => r -> timeApply(tables(r))).toMap
    val chain1024 = {
      val m = merges.take(1024)
      sample.foreach(u => chainReplay(u, m): Unit) // warm
      (1 to 3).map { _ =>
        val s = System.nanoTime()
        units.foreach { case (u, _) => chainReplay(u, m): Unit }
        (System.nanoTime() - s) / 1e9
      }.min
    }

    println(s"""{"metric":"bpe_scale","units":${units.length},""" +
      s""""symbols":$symTotal,"train_32768_sec":${f"$trainSec%.1f"},""" +
      sizes.map(r => s""""apply_${r}_sec":${f"${applySecs(r)}%.3f"},""" +
        s""""heap_passes_$r":${passTotals(r)}""").mkString(",") +
      s""","chain_1024_sec":${f"$chain1024%.2f"}}""")
  }
}
