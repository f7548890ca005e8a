package graft

import org.scalatest.funsuite.AnyFunSuite

/** The noise-attribution thresholds are measurement SEMANTICS — a
  * silent change flips whole artifacts between clean and noisy — so
  * the boundaries are pinned as plain unit tests (no Spark session:
  * [[Bench.Sample]] is pure data).
  */
class BenchSpec extends AnyFunSuite {

  private def s(run: Double, cpu: Double, gc: Double = 0.0,
      shuf: Double = 0.0, confirm: Double = -1.0) =
    Bench.Sample(wall = 1.0, runS = run, cpuS = cpu, gcS = gc,
      shufS = shuf, confirm = confirm)

  test("polluted needs run >> cpu AND the 2s task-volume floor") {
    assert(s(run = 10.0, cpu = 3.0).polluted) // 3.3x, volume ok
    assert(!s(run = 10.0, cpu = 5.0).polluted) // 2.0x < 2.5x
    assert(!s(run = 1.9, cpu = 0.1).polluted) // huge ratio, no volume
    // GC and shuffle I/O are legitimate non-CPU blocking: subtracting
    // them can clear the ratio...
    assert(!s(run = 10.0, cpu = 3.0, gc = 1.5, shuf = 1.5).polluted)
    // ...but the floor is on RAW run volume, not the subtracted rest.
    assert(s(run = 2.1, cpu = 0.1, gc = 1.0, shuf = 0.7).polluted)
  }

  test("suspect needs pollution AND a drifted confirm probe") {
    val bound = Bench.ConfirmDrift * Bench.SpinReferenceParallel
    assert(s(10.0, 3.0, confirm = bound + 0.01).suspect)
    assert(!s(10.0, 3.0, confirm = bound - 0.01).suspect,
      "clean confirm probe must read as structural, not steal")
    assert(!s(10.0, 5.0, confirm = bound + 0.01).suspect,
      "an unpolluted sample is never suspect, whatever the probe says")
    assert(!s(10.0, 3.0).suspect,
      "default confirm (-1, probe never ran) must not convict")
  }
}
