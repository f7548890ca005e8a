package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized contract for the GROUPS-frame/EXCLUDE emulation (q110):
  * for arbitrary partitioned integer data — including the degenerate
  * shapes the fixture gate never produces (all-tie partitions,
  * singletons, one-group partitions) — the emulated sums must equal a
  * brute-force replay of the frame DEFINITION: the frame of a row is
  * the rows whose ORDER value is its own x or the previous distinct
  * x; EXCLUDE GROUP drops its peer group, EXCLUDE CURRENT ROW drops
  * the row, EXCLUDE TIES drops peers but keeps the row; SUM over an
  * emptied frame is NULL.
  */
class GroupsFrameSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private case class Expect(gSum: Long, xGroup: Option[Long],
    xRow: Option[Long], xTies: Long)

  /** Brute-force replay straight from the set definition. */
  private def replay(rows: Seq[(Long, String, Long, Long)])
      : Map[Long, Expect] =
    rows.groupBy(_._2).flatMap { case (_, part) =>
      val xs = part.map(_._3).distinct.sorted
      val prev = xs.zip(None +: xs.init.map(Some(_))).toMap
      part.map { case (id, _, x, _) =>
        val peers = part.filter(_._3 == x)
        val prevGroup = prev(x).map(px => part.filter(_._3 == px))
          .getOrElse(Seq.empty)
        val frame = prevGroup ++ peers
        val exclRow = frame.filter(_._1 != id)
        id -> Expect(
          gSum = frame.map(_._4).sum,
          xGroup = if (prevGroup.isEmpty) None
            else Some(prevGroup.map(_._4).sum),
          xRow = if (exclRow.isEmpty) None else Some(exclRow.map(_._4).sum),
          xTies = (prevGroup.map(_._4) ++
            part.filter(_._1 == id).map(_._4)).sum)
      }
    }

  test("emulated GROUPS/EXCLUDE sums equal the brute-force frame replay") {
    val s = spark
    import s.implicits._
    // Small value domains force heavy ties; ids stay unique.
    val genRows: Gen[List[(Long, String, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      parts <- Gen.listOfN(n, Gen.oneOf("p1", "p2", "p3"))
      xs <- Gen.listOfN(n, Gen.choose(0L, 5L))
      ws <- Gen.listOfN(n, Gen.choose(-10L, 10L))
    } yield parts.lazyZip(xs).lazyZip(ws).toList.zipWithIndex.map {
      case ((p, x, w), i) => (i.toLong, p, x, w)
    }
    val prop = Prop.forAllNoShrink(genRows) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("event_id", "event_type", "x", "w")
        val got = Events.groupsFramesOf(df).collect().map { r =>
          r.getLong(0) -> Expect(r.getLong(4),
            if (r.isNullAt(5)) None else Some(r.getLong(5)),
            if (r.isNullAt(6)) None else Some(r.getLong(6)),
            r.getLong(7))
        }.toMap
        got == replay(rows)
      }
    }
    // 30 cases keep the Spark-job cost of the property reasonable.
    val params = SCTest.Parameters.default.withMinSuccessfulTests(30)
    assert(SCTest.check(params, prop).passed)
  }
}
