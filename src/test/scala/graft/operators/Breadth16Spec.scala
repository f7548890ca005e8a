package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Invariant specs for the round-16 composition gates (q247, the
  * DSIR-curated pipeline): the DuckDB oracle pins the values; these
  * pin the PLAN claims the docstring makes — that splicing the DSIR
  * score + Gumbel resample into q58 adds no exchange and the top-k
  * never plans as a global sort — plus a full driver-side replay of
  * the resample→mixture→split→pack glue over the kept pool.
  */
class Breadth16Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  /** Plan-shape assertions read the STATIC physical plan, so AQE's
    * wrapper node (which hides the tree until execution) is turned
    * off just for plan construction.
    */
  private def withoutAqe[T](body: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size

  test("q247 composes DSIR into q58 with NO new exchange; the " +
    "resample plans as a top-k heap, not a global sort") {
    withoutAqe {
      val p247 = TextAnalysis.dsirCuratedPipeline(spark, sf)
      val p58 = TextAnalysis.curatedPipeline(spark, sf)
      val heaps = p247.queryExecution.executedPlan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }
      assert(heaps.nonEmpty,
        "the Gumbel top-k should plan as TakeOrderedAndProject " +
          "(per-partition heaps, k rows out) — a global SortExec here " +
          "is the scale bug the docstring rules out")
      val (s247, s58) = (shuffleCount(p247), shuffleCount(p58))
      assert(s247 <= s58,
        s"q247 planned $s247 shuffle exchanges vs q58's $s58 — the " +
          "DSIR stages must be exchange-free (broadcast map literal + " +
          "heap top-k)")
    }
  }

  test("q247 report is well-formed, genuinely selective, and " +
    "deterministic") {
    def run() = TextAnalysis.dsirCuratedPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val rows = run()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    val nSel = rows.map(_._2).sum
    assert(nSel > 0 && nSel <= TextAnalysis.DsirPipelineK,
      s"$nSel docs survived — the resample caps the pipeline at " +
        s"k=${TextAnalysis.DsirPipelineK}")
    rows.foreach { case (split, n, tok, bins, idsum) =>
      assert(n > 0 && tok > 0 && idsum > 0, s"degenerate split $split")
      assert(bins > 0 && bins <= n, s"split $split: $bins bins for $n docs")
    }
    assert(rows.toSeq === run().toSeq,
      "seeded resample + deterministic hashes must reproduce exactly")
  }

  test("q247 equals a driver-side replay of resample → mixture → " +
    "split → pack over the kept pool (the Breadth15 BPE-replay " +
    "discipline)") {
    // Kept pool from the individually-oracled stage operators.
    val scored = TextAnalysis.docQuality(spark, sf)
      .filter(col("quality") > 0.4)
      .withColumn("fp", TextAnalysis.fingerprintCol(col("text")))
    val kept = TextAnalysis.keepFirstByFingerprint(scored)
      .join(Dedup.dedupClusters(spark, sf), Seq("doc_id"), "left")
      .filter(col("cluster_rep").isNull || col("cluster_rep") === col("doc_id"))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // Full-corpus scores from the q240 operator (its own oracle gate).
    val w = TextAnalysis.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // The r17 integer-exact Gumbel key: u = (2h+1)/2^25, inner
    // −ln(u) in pico units, outer −ln(inner) in micro — both via
    // FixedLog, the same integers the engine and the oracle compute.
    def gumbelKey(id: Long, wm: Long): Long = {
      val h = java.lang.Long.parseLong(
        md5hex(s"dsir-seed-7:$id").substring(0, 6), 16)
      val innerPico =
        graft.functions.FixedLog.lnScaledLong(33554432L, 2 * h + 1, 12)
      wm - graft.functions.FixedLog.lnScaledLong(innerPico, 1000000000000L, 6)
    }
    val sel = kept.filter(d => w.contains(d._1)) // zero-bigram docs leave
      .map { case (id, lang, nt) => (id, lang, nt, gumbelKey(id, w(id))) }
      .sortBy(d => (-d._4, d._1)).take(TextAnalysis.DsirPipelineK)
    val rates = Curation.mixtureRates.toMap
    def bucket(s: String): Int =
      Integer.parseInt(md5hex(s).substring(0, 2), 16)
    def splitOf(id: Long): String = {
      val b = bucket(id.toString)
      if (b < 204) "train" else if (b < 230) "val" else "test"
    }
    val expected = sel
      .filter(d => bucket(s"mix:${d._1}") < rates.getOrElse(d._2, 0))
      .map(d => (splitOf(d._1), d._1 / 64, d._1, d._3))
      .groupBy(x => (x._1, x._2)).toSeq
      .flatMap { case ((sp, sh), rs) =>
        var run = 0L
        rs.sortBy(_._3).map { r =>
          run += r._4; (sp, sh, r._3, r._4, (run - r._4) / 2048)
        }
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sp, rs) =>
        (sp, rs.size.toLong, rs.map(_._4).sum,
          rs.map(r => r._2 * 10000 + r._5).distinct.size.toLong,
          rs.map(_._3).sum)
      }
    val got = TextAnalysis.dsirCuratedPipeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected,
      "the composed plan diverged from the single-threaded replay of " +
        "its own selection semantics")
  }

  test("q248 incremental dedup maintenance equals the in-engine full " +
    "recompute over the shared snapshot-B fixture") {
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
    val maxId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0)
    val full = Relational.snapshotBOf(docs, maxId)
      .groupBy(col("fpb")).agg(
        org.apache.spark.sql.functions.min(col("doc_id")).as("survivor_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val inc = Relational.dedupIndexMaintenance(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq,
      "delta-only maintenance diverged from the full recompute")
    // The fixture exercises BOTH election branches: re-keyed inserts
    // whose original survived (old key wins the group) and whose
    // original was deleted (the re-keyed copy is the sole survivor).
    val rekeyed = inc.filter(_._2 > maxId).map(_._2).toSet
    assert(rekeyed.nonEmpty,
      "no re-keyed survivor — the delete∧re-insert branch never ran")
    assert(inc.exists(s => s._2 % 13 == 0 && s._2 <= maxId),
      "no surviving mod-13 original — the duplicate-group branch never ran")
  }

  test("q248's carried and recomputed legs partition the survivor set " +
    "(no group is both carried and re-elected)") {
    val inc = Relational.dedupIndexMaintenance(spark, sf).collect()
      .map(r => r.getString(0))
    assert(inc.length === inc.distinct.length,
      "a fingerprint group was emitted by both legs")
  }

  test("q249 signed-delta DF maintenance equals the in-engine full " +
    "recompute, retires zeroed terms and admits new ones") {
    import org.apache.spark.sql.functions.{array_distinct, count, explode,
      lit, max}
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // Full recompute over the SAME snapshot-B fixture, from the
    // revised TEXTS (snapshotBOf only carries fingerprints).
    val surv = docs
      .filter(org.apache.spark.sql.functions.pmod(col("doc_id"), lit(11L)) =!= 0)
      .select(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.pmod(col("doc_id"), lit(7L)) === 0,
        org.apache.spark.sql.functions.concat(col("text"), lit(" [rev2]")))
        .otherwise(col("text")).as("text"))
    val ins = docs
      .filter(org.apache.spark.sql.functions.pmod(col("doc_id"), lit(13L)) === 0)
      .select(col("text"))
    val full = surv.unionByName(ins)
      .select(explode(array_distinct(TextAnalysis.tokens(col("text"))))
        .as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val inc = TextAnalysis.dfMaintenance(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq,
      "signed-delta merge diverged from the full DF recompute")
    // Both vocabulary edges actually moved: the revision marker
    // entered, and every df stayed strictly positive (zeroed terms
    // retired).
    assert(inc.exists(_._1 == "[rev2]"), "the new term never entered")
    assert(inc.forall(_._2 > 0))
    assert(maxId > 0)
  }

  test("q250 incremental IVF maintenance equals a from-scratch " +
    "reassignment of snapshot B; negated arrivals change cells") {
    import org.apache.spark.sql.functions.{count, lit, max, pmod, sum,
      transform => atransform}
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    // Rebuild snapshot B and reassign EVERYTHING via the same public
    // assignment op the full index build uses.
    val arrivals = e.filter(pmod(col("vec_id"), lit(13L)) === 0)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
        atransform(col("embedding"), x => -x).as("embedding"))
    val b = e.filter(pmod(col("vec_id"), lit(11L)) =!= 0)
      .select(col("vec_id"), col("embedding"))
      .unionByName(arrivals)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val full = Similarity.cellAssignmentsFor(b, cents)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val inc = Similarity.ivfIndexMaintenance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq,
      "delta-only maintenance diverged from the from-scratch rebuild")
    // The negated arrivals must land in DIFFERENT cells than their
    // originals — otherwise the delta-assignment leg was never
    // genuinely exercised (identical embeddings would make carrying
    // the original's cell indistinguishable from assigning).
    val cellOf = Similarity.cellAssignmentsFor(b, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = cellOf.keys.filter(_ > maxId)
      .count(id => cellOf(id) != cellOf.getOrElse(id - maxId - 1, -1L))
    assert(moved > 0, "no negated arrival changed cell vs its original")
  }

  test("q251 incremental LSH band-index maintenance equals a " +
    "from-scratch rebuild over snapshot B; revised docs move bands") {
    import org.apache.spark.sql.functions.{lit, max, pmod}
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    // From-scratch rebuild via the SAME public kernel the maintainer
    // uses for arrivals — the in-engine IVM identity (the oracle pins
    // the cross-engine one).
    val full = Dedup.rawBandsOf(Relational.snapshotBDocsOf(docs, maxId))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._3))
    val inc = Dedup.lshIndexMaintenance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2).toInt,
        r.getString(3)))
      .sortBy(t => (t._1, t._3))
    assert(inc.nonEmpty)
    assert(inc.toSeq === full.toSeq,
      "delta-only band maintenance diverged from the full rebuild")
    // The fixture genuinely exercised every leg: deletes absent,
    // re-keyed inserts present, and at least one revised doc changed
    // at least one band key (the ' [rev2]' suffix adds shingles).
    val idxA = Dedup.rawBandsOf(docs).collect()
      .map(r => ((r.getLong(0), r.getInt(2)), r.getString(3))).toMap
    val incByKey = inc.map(t => ((t._1, t._3), t._4)).toMap
    assert(!inc.exists(t => t._1 <= maxId && t._1 % 11 == 0),
      "a deleted key survived in the maintained index")
    assert(inc.exists(_._1 > maxId), "no re-keyed insert was banded")
    val revised = docs
      .filter(pmod(col("doc_id"), lit(7L)) === 0 &&
        pmod(col("doc_id"), lit(11L)) =!= 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val moved = revised.count(id => (0 until 4).exists(b =>
      idxA.get((id, b)).exists(old =>
        incByKey.get((id, b)).exists(_ != old))))
    assert(moved > 0,
      "no revised document changed a band key — the re-banding leg " +
        "was never genuinely exercised")
  }

  test("q252's composed summaries equal fingerprints recomputed from " +
    "the three individually-gated artifacts (composition consistency)") {
    import org.apache.spark.sql.functions.{count => fcount, expr, lit}
    def fp(df: org.apache.spark.sql.DataFrame, render: String)
        : (Long, Long) = {
      val r = df.agg(fcount(lit(1)), expr(
        s"bit_xor(cast(conv(substring(md5($render), 1, 15), 16, 10)" +
          " as bigint))")).head()
      (r.getLong(0), r.getLong(1))
    }
    val got = Relational.cdcMaintainAll(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val wantBands = fp(Dedup.lshIndexMaintenance(spark, sf),
      "concat(cast(doc_id as string), ':', cast(band as string), ':', bkey)")
    val wantDf = fp(TextAnalysis.dfMaintenance(spark, sf),
      "concat(token, ':', cast(df as string))")
    val wantSurv = fp(Relational.dedupIndexMaintenance(spark, sf),
      "concat(fp, ':', cast(survivor_id as string))")
    assert(got("band_index") === wantBands,
      "composed band-index summary diverged from the q251 gate")
    assert(got("df_table") === wantDf,
      "composed df-table summary diverged from the q249 gate")
    assert(got("survivors") === wantSurv,
      "composed survivor summary diverged from the q248 gate")
    // The shared feed covers every delta row exactly once.
    val docs = graft.sources.Corpus.read(spark, sf, "documents")
    val maxId = docs.agg(org.apache.spark.sql.functions.max(col("doc_id")))
      .head().getLong(0)
    val d = Relational.cdcDeltaOf(docs, maxId)
    assert(got("cdc_delta")._1 ===
      d.deletes.count() + d.revised.count() + d.inserted.count())
  }

  test("qS06's stateless per-row cell assignment equals the batch " +
    "aggregate assignment on every corpus vector") {
    val e = graft.sources.Corpus.read(spark, sf, "embeddings")
    val model = Similarity.centroidModel(spark, sf)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val viaAgg = Similarity.cellAssignmentsFor(e, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val viaExpr = e.select(col("vec_id"),
        Similarity.assignCellCol(col("embedding"), model).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(viaExpr.nonEmpty)
    assert(viaExpr.toSeq === viaAgg.toSeq,
      "the streaming-safe expression and the batch max_by aggregate " +
        "disagreed on a cell — ingest and index build would diverge")
  }
}
