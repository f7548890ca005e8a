package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextAnalysis

/** [[EditDistanceKernel.deletionVariantHashes]] must return exactly
  * the hash SET of the declarative deletion-neighborhood formulation
  * it replaced inside q243 — the formulation the DuckDB oracle still
  * replays ([[TextAnalysis.deletionNeighborhoodSql]]). Bit-identity
  * here is what lets the kernel swap in without touching the oracle.
  */
class EditDistanceSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def compareOn(strings: Seq[String]): Unit = {
    val s = spark
    import s.implicits._
    val df = strings.toDF("name")
      .withColumn("kern",
        EditDistanceFunctions.deletion_variant_hashes(col("name")))
      .withColumn("decl", sort_array(array_distinct(expr(
        s"transform(${TextAnalysis.deletionNeighborhoodSql("name")}, " +
          "v -> xxhash64(v))"))))
    df.collect().foreach { r =>
      val name = r.getString(0)
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"kernel/declarative hash-set mismatch for '$name'")
    }
  }

  test("kernel equals declarative twin on 500 random ASCII names") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789# "
    val strings = (1 to 500).map { _ =>
      val len = rnd.nextInt(24)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    compareOn(strings)
  }

  test("kernel equals declarative twin on multibyte and degenerate " +
    "strings (code-point deletion semantics)") {
    compareOn(Seq("", "a", "ab", "aa", "aaa", "héllo wörld", "ünïcödé",
      "日本語テキスト", "mix日ed языки", "  ", "·fence·",
      "Customer#000000001"))
  }

  test("fixture name survives: every 1-deletion dirty twin shares a " +
    "variant hash with its source (the FastSS necessary condition)") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    (1 to 200).foreach { _ =>
      val len = 3 + rnd.nextInt(18)
      val name = (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val pos = rnd.nextInt(len)
      val dirty = name.substring(0, pos) + name.substring(pos + 1)
      val s = spark
      import s.implicits._
      val row = Seq((name, dirty)).toDF("a", "b")
        .select(
          EditDistanceFunctions.deletion_variant_hashes(col("a")).as("ha"),
          EditDistanceFunctions.deletion_variant_hashes(col("b")).as("hb"))
        .head()
      val ha = row.getSeq[Long](0).toSet
      val hb = row.getSeq[Long](1).toSet
      assert(ha.intersect(hb).nonEmpty,
        s"no shared variant hash for '$name' / '$dirty'")
    }
  }
}
