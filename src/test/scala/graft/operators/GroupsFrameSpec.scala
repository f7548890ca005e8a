package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized contract for the GROUPS-frame/EXCLUDE emulation
  * (q110/q110b): for arbitrary partitioned integer data — including
  * the degenerate shapes the fixture gates never produce (all-tie
  * partitions, singletons, one-group partitions) — AND randomized
  * frame bounds `GROUPS n PRECEDING AND m FOLLOWING`, the emulated
  * sums must equal a brute-force replay of the frame DEFINITION: the
  * frame of a row is the rows whose ORDER value's dense rank is
  * within [-n, +m] of the row's own; EXCLUDE GROUP drops its peer
  * group, EXCLUDE CURRENT ROW drops the row, EXCLUDE TIES drops
  * peers but keeps the row; SUM over an emptied frame is NULL.
  */
class GroupsFrameSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private case class Expect(gSum: Long, xGroup: Option[Long],
    xRow: Option[Long], xTies: Long)

  /** Brute-force replay straight from the set definition, at
    * arbitrary (nPreceding, nFollowing) bounds.
    */
  private def replay(rows: Seq[(Long, String, Long, Long)],
      nPrec: Int, nFoll: Int): Map[Long, Expect] =
    rows.groupBy(_._2).flatMap { case (_, part) =>
      val rankOf = part.map(_._3).distinct.sorted.zipWithIndex.toMap
      part.map { case (id, _, x, _) =>
        val dr = rankOf(x)
        val frame = part.filter { r =>
          val d = rankOf(r._3); d >= dr - nPrec && d <= dr + nFoll
        }
        val exGroup = frame.filterNot(_._3 == x)
        val exRow = frame.filter(_._1 != id)
        val exTies = frame.filter(r => r._3 != x || r._1 == id)
        id -> Expect(
          gSum = frame.map(_._4).sum,
          xGroup = if (exGroup.isEmpty) None else Some(exGroup.map(_._4).sum),
          xRow = if (exRow.isEmpty) None else Some(exRow.map(_._4).sum),
          xTies = exTies.map(_._4).sum)
      }
    }

  test("emulated GROUPS/EXCLUDE sums equal the brute-force frame replay " +
      "at randomized bounds") {
    val s = spark
    import s.implicits._
    // Small value domains force heavy ties; ids stay unique. Bounds
    // cover the degenerate (0,0) frame (peers only), the gated
    // shapes (1,0) and (3,1), and spans wider than the group count.
    val genCase: Gen[(List[(Long, String, Long, Long)], Int, Int)] = for {
      n <- Gen.choose(1, 60)
      parts <- Gen.listOfN(n, Gen.oneOf("p1", "p2", "p3"))
      xs <- Gen.listOfN(n, Gen.choose(0L, 5L))
      ws <- Gen.listOfN(n, Gen.choose(-10L, 10L))
      nPrec <- Gen.choose(0, 7)
      nFoll <- Gen.choose(0, 4)
    } yield (parts.lazyZip(xs).lazyZip(ws).toList.zipWithIndex.map {
      case ((p, x, w), i) => (i.toLong, p, x, w)
    }, nPrec, nFoll)
    val prop = Prop.forAllNoShrink(genCase) { case (rows, nPrec, nFoll) =>
      rows.isEmpty || {
        val df = rows.toDF("event_id", "event_type", "x", "w")
        val got = Events.groupsFramesOf(df, nPrec, nFoll).collect().map { r =>
          r.getLong(0) -> Expect(r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getLong(6)),
            r.getLong(7))
        }.toMap
        got == replay(rows, nPrec, nFoll)
      }
    }
    // 30 cases keep the Spark-job cost of the property reasonable.
    val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
    assert(SCTest.check(params, prop).passed)
  }
}
