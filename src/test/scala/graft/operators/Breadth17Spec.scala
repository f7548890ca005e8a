package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-17 invariants for the stored-index write path (q255): the
  * DuckDB oracle pins the VALUES (maintained files ≡ from-scratch
  * logical rebuild); this spec pins the physical claims SQL cannot
  * see — that maintenance rewrote ONLY the delta-touched cid
  * partitions and left every other partition's files byte-identical.
  */
class Breadth17Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private def fileState(root: String): Map[String, (Long, String)] = {
    val base = java.nio.file.Paths.get(root)
    val out = scala.collection.mutable.Map[String, (Long, String)]()
    java.nio.file.Files.walk(base).forEach { p =>
      val rel = base.relativize(p).toString
      if (rel.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        val md = java.security.MessageDigest.getInstance("MD5")
        out(rel) = (bytes.length.toLong,
          md.digest(bytes).map("%02x".format(_)).mkString)
      }
    }
    out.toMap
  }

  test("q255 maintenance rewrites ONLY touched cid partitions; " +
    "untouched partition files stay byte-identical") {
    var before: Map[String, (Long, String)] = Map.empty
    val m = Similarity.storedIvfMaintenanceCore(spark, sf,
      afterBuild = path => before = fileState(path))
    m.result.collect(): Unit // materialize the report off the files
    val after = fileState(m.path)
    val touched = m.touched.map(c => s"cid=$c").toSet
    assert(m.touched.nonEmpty && m.touched.length < 16,
      s"delta must touch a strict subset of cells, got ${m.touched.toSeq}")
    def cidOf(rel: String): String = rel.split('/').head
    // Untouched partitions: exact same files (names, sizes, bytes).
    val beforeUntouched = before.filterNot(kv => touched(cidOf(kv._1)))
    val afterUntouched = after.filterNot(kv => touched(cidOf(kv._1)))
    assert(beforeUntouched === afterUntouched,
      "untouched partitions must keep their exact files")
    assert(beforeUntouched.nonEmpty, "fixture must leave some cells untouched")
    // Touched partitions: rewritten (fresh file names from the second
    // write's task attempt — the old names are gone).
    val beforeTouched = before.keySet.filter(k => touched(cidOf(k)))
    val afterTouched = after.keySet.filter(k => touched(cidOf(k)))
    assert(afterTouched.nonEmpty)
    assert(beforeTouched.intersect(afterTouched).isEmpty,
      "touched partitions must have been rewritten by the overwrite")
    // The touched set is exactly the delta's cells: departures' cells
    // ∪ arrivals' cells, re-derived independently here.
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
    val maxId = e.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("vec_id"))).head().getLong(0)
    import org.apache.spark.sql.functions._
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val dep = Similarity.cellAssignmentsFor(
      e.filter(pmod(col("vec_id"), lit(97L)) === 0), cents)
    val arr = Similarity.cellAssignmentsFor(
      e.filter(pmod(col("vec_id"), lit(101L)) === 0)
        .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")), cents)
    val expected = dep.select("cid").union(arr.select("cid")).distinct()
      .collect().map(_.getLong(0).toInt).sorted
    assert(m.touched.toSeq === expected.toSeq)
  }

  test("q255 read-back report equals the from-scratch logical index " +
    "over the same delta") {
    import org.apache.spark.sql.functions._
    val physical = Similarity.storedIvfMaintenance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Independent logical recompute (the q250 derivation, q255's
    // sparser 97/101 moduli).
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val snapB = e.filter(pmod(col("vec_id"), lit(97L)) =!= 0)
      .select(col("vec_id"), col("embedding"))
      .unionByName(e.filter(pmod(col("vec_id"), lit(101L)) === 0)
        .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
          transform(col("embedding"), x => -x).as("embedding")))
    val logical = Similarity.cellAssignmentsFor(snapB, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
      .orderBy(col("cid")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(physical.toSeq === logical.toSeq)
  }

  test("q256 PII scrub: exact per-source counts (one email/phone/ip " +
    "per dirty doc), sorted output, and zero residual matches after " +
    "redaction") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.piiScrub(spark, sf).collect()
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy(_._2).map { case (s, rs) =>
      s -> (rs.length.toLong, rs.count(_._1 % 3 != 0).toLong)
    }
    assert(out.length === expect.size)
    assert(out.map(_.getString(0)).toSeq ===
      out.map(_.getString(0)).toSeq.sorted)
    out.foreach { r =>
      val (n, dirty) = expect(r.getString(0))
      assert(r.getLong(1) === n, s"n_docs ${r.getString(0)}")
      assert(r.getLong(2) === dirty, s"n_emails ${r.getString(0)}")
      assert(r.getLong(3) === dirty, s"n_phones ${r.getString(0)}")
      assert(r.getLong(4) === dirty, s"n_ips ${r.getString(0)}")
    }
    // Redaction completeness: rebuild the fixture + redaction with
    // the SAME public patterns and assert no class matches anything
    // in the redacted text, while clean docs pass through verbatim.
    val aug = graft.sources.Corpus.read(spark, sf, "documents")
      .withColumn("pii_text",
        when(col("doc_id") % 3 === 0, col("text")).otherwise(concat(
          col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@mail.example.org or +1-555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
          lit(" from 10."), col("doc_id") % 256, lit("."),
          (col("doc_id") * 3) % 256, lit("."), (col("doc_id") * 5) % 256)))
      .withColumn("redacted", regexp_replace(regexp_replace(
        regexp_replace(col("pii_text"),
          TextAnalysis.PiiEmailRe, "<EMAIL>"),
        TextAnalysis.PiiPhoneRe, "<PHONE>"),
        TextAnalysis.PiiIpv4Re, "<IP>"))
    val res = aug.agg(
      sum(regexp_count(col("redacted"), lit(TextAnalysis.PiiEmailRe)) +
        regexp_count(col("redacted"), lit(TextAnalysis.PiiPhoneRe)) +
        regexp_count(col("redacted"), lit(TextAnalysis.PiiIpv4Re)))
        .as("residual"),
      sum(when(col("doc_id") % 3 === 0 &&
        col("redacted") =!= col("text"), 1L).otherwise(0L))
        .as("clean_mutated")).head()
    assert(res.getLong(0) === 0L, "residual PII after redaction")
    assert(res.getLong(1) === 0L, "clean docs must pass through verbatim")
  }
}
