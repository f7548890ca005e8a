package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Corpus

/** Deduplication operators for training-data pipelines (north-star
  * extensions, SURVEY.md §2.2 last row): exact, n-gram Jaccard,
  * MinHash+LSH, and embedding-cosine near-dup. SimHash lives in
  * [[TextAnalysis.simhash]] (it is a fingerprint first).
  *
  * Scale design: nothing here is O(n²) over the corpus. Pair
  * generation always goes through a blocking key — shared shingle,
  * LSH band bucket, or language — so the shuffle joins on a key whose
  * per-bucket cardinality is bounded, the standard approach at
  * billion-document scale. All hashing is md5 (bit-identical in the
  * DuckDB oracle).
  */
object Dedup {

  /** Word 3-gram shingles per document, with duplicates (one row per
    * occurrence) — no shuffle; the distinct is a separate step so
    * consumers that are multiset-safe (minhash: min over a multiset ==
    * min over its set) can skip the full-corpus dedup exchange.
    */
  def rawShingles(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("shingle", explode(expr(
        """CASE WHEN size(toks) >= 3
          |THEN transform(sequence(1, size(toks) - 2),
          |               i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1]))
          |ELSE array() END""".stripMargin)))
      .select(col("doc_id"), col("lang"), col("shingle"))

  /** Distinct word 3-gram shingles per document: (doc_id, lang, shingle). */
  def shingles(spark: SparkSession, dir: String): DataFrame =
    rawShingles(spark, dir).distinct()

  /** Exact dedup over the md5 fingerprint. Input is the corpus
    * unioned with itself so the operator demonstrably removes copies:
    * per language, n_input = 2·docs, n_unique = distinct texts.
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Corpus.read(spark, dir, "documents")
    d.unionAll(d)
      .withColumn("fp", TextAnalysis.fingerprintCol(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_input"),
        countDistinct(col("fp")).as("n_unique"))
      .orderBy(col("lang"))
  }

  /** A shingle appearing in more than this many documents is dropped
    * before pairing: a shingle shared by d docs emits d² join rows, so
    * on natural text the head shingles alone would make the blocking
    * join quadratic. Capping document frequency bounds per-shingle
    * fanout at MaxShingleDf² regardless of corpus size — the standard
    * blocking-key guard at billion-document scale. Jaccard is then
    * defined consistently over the capped shingle universe (sizes and
    * intersections both exclude hot shingles), mirrored in the oracle.
    */
  val MaxShingleDf = 50

  /** For every document, its nearest same-language neighbor by word
    * 3-gram Jaccard similarity over the df-capped shingle set (docs
    * sharing no rare shingle are absent). Pairing is blocked on the
    * shingle itself: join on shingle, count commons, then
    * Jaccard = |∩| / (|A|+|B|-|∩|) — exact integer math.
    */
  def ngramJaccardNeighbors(spark: SparkSession, dir: String): DataFrame = {
    // Cached: consumed twice (df computation + the capped semi-join);
    // without the cache the scan+explode+distinct runs twice.
    val shAll = shingles(spark, dir).cache()
    val rare = shAll.groupBy(col("lang"), col("shingle"))
      .agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= MaxShingleDf)
      .select(col("lang"), col("shingle"))
    val sh = shAll.join(rare, Seq("lang", "shingle"), "left_semi").cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("a"), col("lang"), col("shingle"))
    val b = sh.select(col("doc_id").as("b"), col("lang").as("lang_b"),
      col("shingle").as("shingle_b"))
    val common = a.join(b,
        col("shingle") === col("shingle_b") && col("lang") === col("lang_b") &&
          col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    val withSizes = common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("na") + col("nb") - col("common")), 6))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("jaccard").desc, col("b"))
    withSizes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("a").as("doc_id"), col("b").as("best_neighbor"),
        col("jaccard").as("best_jaccard"))
      .orderBy(col("doc_id"))
  }

  /** MinHash + LSH near-dup candidates, verified by true Jaccard.
    * 8 hash functions h_i(s) = md5(i:s) over shingles (min taken
    * lexicographically on the hex — portable), banded 2 rows × 4
    * bands; candidate pairs share any band key; survivors have
    * verified Jaccard ≥ 0.2.
    */
  def minhashLshPairs(spark: SparkSession, dir: String): DataFrame = {
    // Signature from RAW (non-distinct) shingles: min(md5) over a
    // multiset equals min over its set, so the full-corpus distinct —
    // a shuffle of every (doc, shingle) pair — is skipped entirely.
    // Distinct sets are materialized later, only for candidate docs.
    val sh = rawShingles(spark, dir)
    // One-pass signature: the 8 hashes are 8 projected columns and the
    // 8 mins are one partial-aggregated groupBy — no 8× row blow-up,
    // no extra shuffle (the map-side combine reduces each partition to
    // one row per doc before the exchange). Same values as the
    // row-per-(doc,i) formulation: mh_i = min over shingles of
    // md5(i:shingle).
    val mh = sh.select(col("doc_id") +: col("lang") +:
        (0 until 8).map(i => md5(concat(lit(s"$i:"), col("shingle"))).as(s"h$i")): _*)
      .groupBy(col("doc_id"), col("lang"))
      .agg(min(col("h0")).as("mh0"),
        (1 until 8).map(i => min(col(s"h$i")).as(s"mh$i")): _*)
    // Bands 2 rows × 4 bands: band b = md5(b|mh_{2b}|mh_{2b+1}),
    // exploded to one row per (doc, band) for the bucket self-join.
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        md5(concat(lit(s"$b|"), col(s"mh${2 * b}"), lit("|"),
          col(s"mh${2 * b + 1}"))).as("bkey"))
    }
    val bands = mh.select(col("doc_id"), col("lang"),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("lang"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val bl = bands.select(col("doc_id").as("a"), col("lang"), col("band"), col("bkey"))
    val br = bands.select(col("doc_id").as("b"), col("lang").as("lang_b"),
      col("band").as("band_b"), col("bkey").as("bkey_b"))
    val cand = bl.join(br,
        col("bkey") === col("bkey_b") && col("band") === col("band_b") &&
          col("lang") === col("lang_b") && col("a") < col("b"))
      .select(col("a"), col("b")).distinct().cache()
    // Verification cost must be proportional to the CANDIDATE set, not
    // the corpus: first shrink the shingle table to docs that appear in
    // any candidate pair (LSH made that set small), THEN join on the
    // shared shingle and keep exactly the candidate pairs. At 100×
    // corpus the all-pairs shingle join is ~10,000× work; this path is
    // ~|cand| instead.
    val candDocs = cand.select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id"))).distinct()
    // Distinct shingle sets (Jaccard needs sets) only for candidate
    // docs — candidate-sized work, not corpus-sized. The broadcast
    // hint is deliberate: without it the semi-join shuffles the full
    // shingle table, and candDocs is by construction a small fraction
    // of the corpus (near-dup candidates; if it ever approached
    // corpus size the dedup output itself would be the bottleneck).
    val shc = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      .distinct().cache()
    val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val sa = shc.select(col("doc_id").as("a"), col("lang"), col("shingle"))
    val sb = shc.select(col("doc_id").as("b"), col("lang").as("lang_b"),
      col("shingle").as("shingle_b"))
    val common = sa.join(sb,
        col("shingle") === col("shingle_b") && col("lang") === col("lang_b") &&
          col("a") < col("b"))
      .join(cand, Seq("a", "b"), "left_semi")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
      .withColumn("jaccard", round(col("common").cast("double") /
        (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= 0.2)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Connected components over the verified near-dup pair graph — the
    * clustering step an at-scale dedup pipeline runs after pair
    * generation (keep one representative per component). Iterative
    * min-label propagation: each round every node adopts the smallest
    * label among itself and its neighbors; a round is one
    * join + aggregate over the (small) edge set plus a pointer-jumping
    * step (rep := rep(rep)) that halves label-chain depth, so the
    * loop converges in O(log n) rounds regardless of component
    * diameter (long chains included). The driver only orchestrates
    * rounds and reads one convergence count; all data work is
    * distributed — the same shape GraphX/Pregel use.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLshPairs(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).cache()
    val edges = pairs.union(pairs.select(col("b").as("a"), col("a").as("b")))
      .cache()
    val nodes = edges.select(col("a").as("doc_id")).distinct()
    // Iterative DataFrames MUST truncate lineage every round: labels
    // is referenced ~4× per round, so the logical plan grows ~4^r and
    // Catalyst re-analysis hangs the driver within a few rounds.
    // localCheckpoint(eager = true) materializes the round AND cuts
    // the plan back to a leaf — the standard iterative-algorithm idiom.
    var labels = nodes.withColumn("rep", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    // log2(n) pointer-jumping rounds always suffice; the generous cap
    // is an infinite-loop guard, not a correctness bound.
    var rounds = 0
    while (!converged && rounds < 64) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("doc_id", "b").withColumnRenamed("rep", "nrep"), "b")
        .select(col("a").as("doc_id"), col("nrep"))
      val viaMin = labels.join(viaEdges.groupBy(col("doc_id"))
          .agg(min(col("nrep")).as("minn")), Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("minn"), col("rep"))).as("rep"))
      // Pointer jumping: follow the rep's own rep one hop.
      val repOfRep = labels
        .select(col("doc_id").as("rep"), col("rep").as("rep2"))
      val next = viaMin.join(repOfRep, Seq("rep"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("rep2"), col("rep"))).as("rep"))
        .localCheckpoint(true)
      converged = next.join(labels.withColumnRenamed("rep", "old"), "doc_id")
        .filter(col("rep") =!= col("old")).isEmpty
      // Free the previous round's checkpointed blocks explicitly —
      // otherwise up to 64 label copies pin block-manager storage
      // until GC-driven cleanup gets around to them.
      labels.unpersist()
      labels = next
      rounds += 1
    }
    if (!converged)
      System.err.println(s"[dedupClusters] round cap hit after $rounds rounds")
    labels.select(col("doc_id"), col("rep").as("cluster_rep"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-duplicate pairs (sim ≥ 0.35 on this random
    * corpus; real pipelines use ≥0.95), paired inside sign-LSH buckets
    * ([[Similarity.bucketCol]]) instead of an all-pairs cartesian:
    * candidate pairs must land in the same 8-bit bucket or buckets at
    * Hamming distance 1 (multi-probe — one side emits its bucket plus
    * each single-bit flip, 9 keys, and equi-joins the other side's
    * bucket). Cost is Σ bucket² over ~256 buckets × 9 probes — linear
    * in corpus size for balanced buckets — instead of n²; near-dups
    * rarely differ in more than one sign bit, so recall stays high.
    * A pair matches exactly one probe, so no distinct is needed.
    */
  def embeddingNearDups(spark: SparkSession, dir: String): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
      .withColumn("bucket", Similarity.bucketCol(col("embedding")))
    val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"),
      explode(array(Similarity.probeCols(col("bucket")): _*)).as("probe"))
    val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("bucket").as("bucket_b"))
    a.join(b, col("probe") === col("bucket_b") && col("a") < col("b"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("ea"), col("eb")), 6))
      .filter(col("sim") >= 0.35)
      .select(col("a").as("vec_a"), col("b").as("vec_b"), col("sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
