package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant specs for the round-12 breadth gates. The value-level
  * gate is the DuckDB oracle; these pin the policy invariants and
  * independent local replays.
  */
class Breadth12Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("leakage-safe split: no cluster spans splits, naive split would leak") {
    val out = Dedup.leakageSafeSplit(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("test", "train", "val"))
    assert(out.forall(_.getLong(5) === 0L), "cluster-aware split leaked")
    // Totals cover the whole corpus exactly once.
    val nDocs = graft.sources.Corpus.read(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum === nDocs)

    // The gate discriminates the policies: the naive per-document
    // q47 split DOES scatter at least one near-dup cluster across
    // splits on this corpus — the leak this operator exists to stop.
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def naiveSplit(docId: Long): String = {
      val bkt = Integer.parseInt(md5hex(docId.toString).substring(0, 2), 16)
      if (bkt < 204) "train" else if (bkt < 230) "val" else "test"
    }
    val naiveLeaked = clusters.groupBy(_._2)
      .count { case (_, members) =>
        members.map(m => naiveSplit(m._1)).distinct.length > 1 }
    assert(naiveLeaked > 0, "fixture cannot distinguish the policies")
  }

  test("leakage-safe split: membership fingerprint replays in-JVM") {
    val assigned = Dedup.leakageSafeSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    // Re-derive each doc's split from cluster rep + md5 bucket and
    // fold the same 60-bit md5-prefix xor per split.
    val reps = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val want = docs.groupBy { d =>
      val g = reps.getOrElse(d, d)
      val bkt = Integer.parseInt(md5hex(g.toString).substring(0, 2), 16)
      if (bkt < 204) "train" else if (bkt < 230) "val" else "test"
    }.map { case (split, members) =>
      split -> members.map(d =>
        java.lang.Long.parseLong(md5hex(d.toString).substring(0, 15), 16))
        .reduce(_ ^ _)
    }
    assert(assigned === want)
  }
}
