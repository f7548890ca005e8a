package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[WidthBucket]] must implement PG's published contract exactly —
  * the DuckDB oracle restates the same contract as CASE arithmetic,
  * so any divergence (boundary `>=` vs `>`, underflow/overflow
  * assignment, descending mirror) is a silent gate mismatch.
  */
class WidthBucketSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Straight-from-the-docs reference (ascending and descending). */
  private def reference(x: Double, lo: Double, hi: Double, n: Int): Long =
    if (lo < hi) {
      if (x < lo) 0L
      else if (x >= hi) n + 1L
      else math.floor(n * (x - lo) / (hi - lo)).toLong + 1L
    } else {
      if (x > lo) 0L
      else if (x <= hi) n + 1L
      else math.floor(n * (lo - x) / (lo - hi)).toLong + 1L
    }

  test("PG contract points: bounds, boundaries, interior") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      // (x, lo, hi, n) — ascending
      (49.999, 50.0, 450.0, 8), // underflow -> 0
      (50.0, 50.0, 450.0, 8), // at lower bound -> bucket 1 (>= lo)
      (100.0, 50.0, 450.0, 8), // exact interior boundary -> bucket 2
      (449.999, 50.0, 450.0, 8), // last interior -> bucket 8
      (450.0, 50.0, 450.0, 8), // at upper bound -> overflow 9 (>= hi)
      (500.0, 50.0, 450.0, 8), // overflow -> 9
      // descending mirror
      (500.0, 450.0, 50.0, 8), // above b1 -> 0
      (450.0, 450.0, 50.0, 8), // at b1 -> bucket 1 (<= b1 interior)
      (50.0, 450.0, 50.0, 8), // at b2 -> overflow 9 (<= b2)
      (49.0, 450.0, 50.0, 8)) // below b2 -> overflow 9
    val got = rows.toDF("x", "lo", "hi", "n")
      .select(WidthBucketFunctions.width_bucket(
        col("x"), col("lo"), col("hi"), col("n")).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(0L, 1L, 2L, 8L, 9L, 9L, 0L, 1L, 9L, 9L))
  }

  test("property: kernel matches the reference on random inputs, " +
      "codegen and eval agree") {
    val gen = for {
      x <- Gen.chooseNum(-100.0, 600.0)
      lo <- Gen.chooseNum(0.0, 200.0)
      span <- Gen.chooseNum(1.0, 400.0)
      desc <- Gen.oneOf(true, false)
      n <- Gen.chooseNum(1, 32)
    } yield (x, if (desc) lo + span else lo, if (desc) lo else lo + span, n)
    val prop = Prop.forAll(gen) { case (x, lo, hi, n) =>
      WidthBucket.bucket(x, lo, hi, n) == reference(x, lo, hi, n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
    // One DataFrame pass (codegen path) vs the shared kernel.
    val s = spark
    import s.implicits._
    val sample = Gen.listOfN(200, gen).sample.get
    val viaDf = sample.toDF("x", "lo", "hi", "n")
      .select(WidthBucketFunctions.width_bucket(
        col("x"), col("lo"), col("hi"), col("n")).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaDf === sample.map { case (x, lo, hi, n) =>
      WidthBucket.bucket(x, lo, hi, n) })
  }

  test("SQL front door and error surface") {
    val viaSql = spark.sql(
      "SELECT width_bucket(CAST(5.5 AS DOUBLE), CAST(0 AS DOUBLE), " +
        "CAST(10 AS DOUBLE), 10) AS b").collect()(0).getLong(0)
    assert(viaSql === 6L)
    // NULL operand -> NULL, not a crash.
    assert(spark.sql("SELECT width_bucket(CAST(NULL AS DOUBLE), " +
      "CAST(0 AS DOUBLE), CAST(10 AS DOUBLE), 4) AS b")
      .collect()(0).isNullAt(0))
    // count <= 0 and equal bounds are typed errors (PG SQLSTATE 2201G).
    val e1 = intercept[Exception] {
      spark.sql("SELECT width_bucket(CAST(1 AS DOUBLE), " +
        "CAST(0 AS DOUBLE), CAST(10 AS DOUBLE), 0)").collect()
    }
    assert(e1.getMessage.contains("count must be positive") ||
      e1.getCause != null)
    val e2 = intercept[Exception] {
      spark.sql("SELECT width_bucket(CAST(1 AS DOUBLE), " +
        "CAST(5 AS DOUBLE), CAST(5 AS DOUBLE), 4)").collect()
    }
    assert(e2.getMessage.contains("bounds must differ") ||
      e2.getCause != null)
  }
}
