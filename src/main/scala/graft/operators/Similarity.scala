package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Corpus

/** Approximate-nearest-neighbor search over the embedding column
  * (north-star extension). Two paths:
  *
  *   - [[bruteTopK]]: exact top-k — broadcast the (small) query set,
  *     one codegen'd pass over the vector corpus, per-query window
  *     rank. At 100 TB this is the correct baseline when queries are
  *     few: no shuffle of the corpus, only of the candidate rows.
  *   - [[lshTopK]]: sign-projection LSH — bucket every vector by the
  *     sign pattern of 8 fixed dimensions, join queries only to their
  *     own bucket. The candidate set shrinks ~256×; recall is traded
  *     for a proportionally smaller scan+shuffle. Bucketing by raw
  *     float sign keeps the oracle bit-exact (no RNG to replicate).
  *
  * The cosine kernel is the custom codegen'd Catalyst expression
  * [[graft.functions.CosineSimilarity]].
  */
object Similarity {

  private val NumQueries = 20

  /** Exact top-k neighbors for each query vector (vec_id < 20). */
  def bruteTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Sign-projection LSH bucket: bit j = (embedding[8j] > 0), j=0..7.
    * element_at is 1-based; exact float comparison is portable. Shared
    * with [[Dedup.embeddingNearDups]]'s bucketed pair generation.
    */
  def bucketCol(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { j =>
      when(element_at(emb, j * 8 + 1) > 0f, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** The 9 probe keys covering Hamming distance ≤ 1 around a bucket —
    * the single source for the multi-probe scheme ([[lshTopK]] and
    * [[Dedup.embeddingNearDups]]; the DuckDB mirrors replicate it as
    * `CASE WHEN i = 0 THEN bucket ELSE xor(bucket, 1 << (i-1)) END`).
    */
  def probeCols(bucket: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] =
    bucket +: (0 until 8).map(j => bucket.bitwiseXOR(lit(1 << j)))

  /** IVF (inverted-file) approximate top-k — the other standard scale
    * path next to [[lshTopK]]: partition the corpus into cells around
    * centroids, assign every vector to its nearest centroid once
    * (linear scan against a broadcast centroid set), and answer each
    * query by probing only its `nprobe` nearest cells. At 100 TB the
    * assignment is one broadcast pass and the search shuffles only the
    * probed cells' candidates on the cell id — corpus-partitionable by
    * `cell` so probes become partition-pruned reads.
    *
    * Centroid selection here is the deterministic stand-in for a
    * k-means fit (first `ncells` vectors) — the partition/probe
    * plumbing is identical and the choice keeps the DuckDB oracle
    * bit-exact. Scores are rounded to 1e-6 before ranking on both
    * sides so double summation order can't flip a rank.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = 2, ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    ivfSearch(e, firstNCentroids(e, ncells), k, nprobe)
  }

  /** IVF search against an explicit centroid relation — the shared
    * core of [[ivfTopK]] (deterministic first-`ncells` centroids) and
    * [[trainedIvfTopK]] (k-means-fitted centroids). Search-time cells
    * come from the SAME assignment relation the stored layout uses
    * ([[cellAssignmentsFor]]), so index build and search can never
    * disagree on a vector's cell.
    */
  private def ivfSearch(e: DataFrame, cents: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("s", round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
    val cells = cellAssignmentsFor(e, cents)
    // nprobe cells per QUERY: the rank runs over queries only (the
    // filter prunes the crossJoin to the query rows before ranking),
    // and the rank-limit rewrite plans it as a bounded top-k.
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid"))
    val qe = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val sims = probes
      .join(cells, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(e, Seq("vec_id"))
      .join(broadcast(qe), Seq("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The deterministic centroid stand-in (first `ncells` vectors) —
    * q31b's fit-free baseline, and the INIT of the k-means fit.
    */
  private def firstNCentroids(e: DataFrame, ncells: Int): DataFrame =
    e.filter(col("vec_id") < ncells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))

  /** K-means-trained IVF centroids: `iters` distributed Lloyd rounds
    * from the deterministic init (first `ncells` vectors). Each round
    * is two map-side-combinable aggregates — no driver-side data:
    *
    *   - ASSIGN: per-vector argmax of cosine against the broadcast
    *     centroids (the [[cellAssignmentsFor]] `max_by` shape — one
    *     partial aggregate per scan partition, one row per vector
    *     into the exchange);
    *   - UPDATE: per-(cell, dimension) mean via posexplode + partial
    *     avg — each scan partition emits at most ncells × dim partial
    *     (sum, count) rows — reassembled into centroid vectors by an
    *     ordered collect over the ncells × dim mean rows.
    *
    * Determinism for the q31c oracle (DuckDB unrolls the SAME rounds
    * from the same init): sims are rounded at 1e-6 before the argmax
    * and means at 1e-6 before the float cast, so double summation
    * ORDER — Spark merges partials in partition order, DuckDB sums
    * sequentially — sits 7+ orders below anything that could flip an
    * assignment. Centroids stay `array<float>` so every downstream
    * cosine takes the one [[graft.functions.CosineSimilarity]] input
    * type; the float rounding is replayed in the oracle (CAST AS
    * REAL). A cell that loses all members simply drops out of the
    * relation on both sides.
    *
    * Cosine assignment + unnormalized mean update is spherical
    * k-means' standard relaxation (cosine is scale-invariant in the
    * centroid, so skipping the normalize step changes nothing).
    * Lloyd's guarantee is on the QUANTIZER objective (mean assigned
    * cosine, non-decreasing per round — SimilaritySpec measures
    * 0.245 → 0.311 → 0.324 on the fixture); recall at fixed nprobe
    * follows on clustered data, while on a uniform-random corpus it
    * is flat by construction (no cluster structure to recover —
    * the spec pins trained ≥ init at nprobe 4 plus the objective
    * trajectory).
    */
  def trainedCentroids(spark: SparkSession, dir: String,
      ncells: Int = 16, iters: Int = 2): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    var cents = firstNCentroids(e, ncells)
    for (_ <- 1 to iters) {
      val assign = cellAssignmentsFor(e, cents)
      cents = assign.join(e, Seq("vec_id"))
        .select(col("cid"), posexplode(col("embedding")).as(Seq("i", "v")))
        .groupBy(col("cid"), col("i"))
        .agg(round(avg(col("v").cast("double")), 6).as("mv"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(i, mv)))," +
          " x -> CAST(x.mv AS FLOAT))").as("ce"))
        // MATERIALIZE each round (ncells rows — pennies): downstream
        // consumers reference the fitted centroids more than once
        // (ivfSearch scores AND assigns against them; SemDedup joins
        // through them), and without truncation every reference
        // re-executes the whole training chain — at corpus scale
        // that is iters extra full scans per reference. Same move as
        // connectedComponents' per-round checkpoint.
        .localCheckpoint(true)
    }
    cents
  }

  /** [[ivfTopK]] with k-means-trained centroids (q31c). nprobe
    * defaults to 4: the fixture's recall crossover (SimilaritySpec) —
    * at scale nprobe is the recall/cost dial either way.
    */
  def trainedIvfTopK(spark: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = 4, ncells: Int = 16, iters: Int = 2): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    ivfSearch(e, trainedCentroids(spark, dir, ncells, iters), k, nprobe)
  }

  /** SemDedup (q137) — SEMANTIC deduplication over the embedding
    * space (Abbas et al. 2023, "SemDedup: Data-efficient learning at
    * web-scale through semantic deduplication" — published method):
    * cluster the corpus with k-means, then find near-duplicate pairs
    * ONLY within each cluster — the cells bound the candidate set the
    * way LSH bands do for text, so the all-pairs O(n²) never exists.
    * Composes round-10's [[trainedCentroids]]: training, layout and
    * search share one assignment relation ([[cellAssignmentsFor]]).
    *
    * Drop policy (deterministic, oracle-replayable): a vector is
    * dropped iff some LOWER-id vector in its cell has rounded cosine
    * ≥ τ — the greedy keep-first-seen rule stated set-wise, so it
    * needs one self-join and one aggregate, no sequential scan.
    * Output per dropped vector: the minimum such neighbor (its
    * attributed duplicate-of), its strongest similarity, and the
    * in-cell duplicate count. τ = 0.3 on this corpus (embeddings are
    * near-uniform — max pairwise cosine ≈ 0.51 — so a production-ish
    * 0.9x threshold would be vacuously empty; 0.3 yields a real drop
    * set at both gate SFs). Chain semantics (a~b, b~c, a≁c) follow
    * q135's CC+survivor composition when transitive grouping is
    * wanted; SemDedup's published form is per-pair greedy.
    *
    * Scale: the per-cell self-join shuffles on cid; cell sizes are
    * balanced by the k-means fit (and ncells grows with the corpus),
    * so per-cell pair volume is bounded — the exact argument
    * SCALING.md's skewdocs sweep validates for the LSH family. The
    * cosine runs in the codegen'd kernel inside the join projection.
    */
  def semDedup(spark: SparkSession, dir: String, tau: Double = 0.3,
      ncells: Int = 16, iters: Int = 2): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val cells = cellAssignmentsFor(e, trainedCentroids(spark, dir, ncells, iters))
    val withCell = e.join(cells, Seq("vec_id"))
    val a = withCell.select(col("cid"), col("vec_id").as("va"),
      col("embedding").as("ea"))
    val b = withCell.select(col("cid"), col("vec_id").as("vb"),
      col("embedding").as("eb"))
    a.join(b, Seq("cid")).filter(col("va") < col("vb"))
      .withColumn("s",
        round(VectorFunctions.cosine_sim(col("ea"), col("eb")), 6))
      .filter(col("s") >= lit(tau))
      .groupBy(col("vb").as("dropped_vec"))
      .agg(min(col("va")).as("dup_of"), max(col("s")).as("max_sim"),
        count(lit(1)).as("n_dups"))
      .orderBy(col("dropped_vec"))
  }

  /** Diversity (cluster-balanced) sampling (q158) — the coverage
    * counterpart to SemDedup's redundancy removal: instead of
    * dropping near-dups, SELECT a bounded, semantically spread
    * subset by keeping the k most representative vectors of every
    * k-means cell (highest rounded cosine to the fitted centroid,
    * vec_id tiebreak). Web-corpus curation uses exactly this shape
    * to flatten topic imbalance: a cell with 10⁶ members and a cell
    * with 10² both contribute ≤ k, so the sample covers the
    * embedding space instead of mirroring its density.
    *
    * Composes [[trainedCentroids]] (training/assignment shared with
    * SemDedup and IVF search). The per-cell rank plans through the
    * rank-limit rewrite as a bounded TopKRows heap per (cell,
    * partition) — never a global sort — and cell sizes ride a
    * second ncells-row aggregate broadcast back, so the whole
    * operator is the assignment pass + one bounded-state shuffle.
    */
  def diversitySample(spark: SparkSession, dir: String, k: Int = 5,
      ncells: Int = 16, iters: Int = 2): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val cents = trainedCentroids(spark, dir, ncells, iters)
    val cells = e.crossJoin(broadcast(cents))
      .withColumn("s",
        round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("s"), -col("cid"))).as("cid"),
        max(col("s")).as("s"))
    val sizes = cells.groupBy(col("cid")).agg(count(lit(1)).as("cell_n"))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("s").desc, col("vec_id"))
    cells.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .join(broadcast(sizes), Seq("cid"))
      .select(col("cid"), col("rk"), col("vec_id"), col("s"), col("cell_n"))
      .orderBy(col("cid"), col("rk"))
  }

  /** Hybrid filtered ANN (q133) — vector search under a metadata
    * predicate ("nearest neighbors WITH THE SAME LABEL"), the shape
    * every production vector store serves: same IVF cells, same
    * nprobe probes, with the predicate applied to CANDIDATES before
    * ranking (post-filtering). On a cid-partitioned layout the label
    * predicate reaches the candidate scan alongside the partition
    * prune, so the filter costs selectivity, not a new plan. The
    * trade is recall: a highly selective predicate empties the
    * probed cells (a query's top-filtered rows can be < k — visible
    * here as short groups, not wrong rows), and the documented
    * remedy is the selectivity crossover every vector store
    * implements — below ~1% matching, pre-filter the corpus and
    * brute-force the survivors (the q30 shape, corpus already
    * 100× smaller). The oracle replays cells, probes, filter and
    * ranking from first principles in DuckDB.
    */
  def filteredIvfTopK(spark: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = 2, ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val cents = e.filter(col("vec_id") < ncells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("s", round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
    val cells = cellAssignments(spark, dir, ncells)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid"))
    val qe = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes
      .join(cells, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(e, Seq("vec_id"))
      .join(broadcast(qe), Seq("qid"))
      .filter(col("label") === col("qlabel")) // the metadata predicate
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("label").cast("long").as("label"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** The IVF cell id of every vector — the ONE assignment relation
    * shared by [[ivfTopK]]'s search and the stored layout
    * (`Layout.writePartitioned(cid)`), so index build and search can
    * never disagree. Cell assignment is a map-side-combinable
    * argmax — one partial aggregate per scan partition, one row per
    * vector into the exchange — not a window rank over the
    * ncells×-scored corpus (which would shuffle every scored row).
    * Ties: highest s, then lowest cid, matching ORDER BY s DESC, cid.
    * Stored partitioned by `cid`, probes become partition-pruned
    * reads (LayoutSpec proves the filter lands in PartitionFilters).
    */
  def cellAssignments(spark: SparkSession, dir: String,
      ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    cellAssignmentsFor(e, firstNCentroids(e, ncells))
  }

  /** The argmax assignment against an explicit centroid relation —
    * shared by [[cellAssignments]], [[ivfSearch]] and the k-means
    * ASSIGN step, so layout, search and training all agree on every
    * vector's cell by construction.
    */
  def cellAssignmentsFor(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("s", round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("s"), -col("cid"))).as("cid"))

  /** Batch kNN JOIN (q154) — top-k neighbors for EVERY vector at
    * once, the bulk shape behind SemDedup-style curation, retrieval-
    * augmentation corpus builds, and embedding-graph construction
    * (q30–q31c serve a small query set; this serves the corpus
    * against itself). The per-query broadcast of the point-lookup
    * paths cannot scale to n queries, so the join co-partitions BOTH
    * sides on the IVF cell id instead:
    *
    *   - every vector's nprobe nearest cells (the same broadcast-
    *     centroid scoring as [[ivfSearch]], ranked through the
    *     rank-limit rewrite → bounded TopKRows heap, never a window
    *     over the scored corpus) replicate the query side nprobe×;
    *   - the corpus side carries each vector once, in its ONE home
    *     cell ([[cellAssignmentsFor]] — the relation a cid-partitioned
    *     layout materializes, making this side a partition-local
    *     read);
    *   - one equi-join on cid yields candidates (work =
    *     Σ_cell probes(cell)·|cell|, bounded by cell balance — never
    *     all-pairs), the codegen'd cosine kernel scores them in the
    *     join projection, and the per-query top-k ranks through the
    *     rewrite again (heap per (qid, partition), no global sort).
    *
    * A query's own row is excluded (self-distance 1.0 is noise).
    * Like all IVF search, recall < 1: a true neighbor living outside
    * the probed cells is missed — nprobe is the dial, and the oracle
    * replays the SAME cells/probes from first principles so the gate
    * pins the algorithm, not brute-force truth (q30 pins brute truth
    * for the query-set case).
    */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = 2, ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val cents = firstNCentroids(e, ncells)
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("s",
        round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = scored
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cid"))
    val corpus = cellAssignmentsFor(e, cents)
      .join(e, Seq("vec_id"))
      .select(col("cid"), col("vec_id").as("neighbor"),
        col("embedding").as("ne"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("neighbor"))
    probes.join(corpus, Seq("cid"))
      .filter(col("neighbor") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("ne")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** LSH-bucketed approximate top-k with multi-probe: each query
    * probes its own bucket plus every bucket at Hamming distance 1
    * (9 keys — the same probe scheme as
    * [[Dedup.embeddingNearDups]]), trading a 9× broadcast of the tiny
    * query set for the recall a single probe gives up. The corpus
    * side still joins on its one bucket — candidate volume stays
    * ~9/256 of the corpus. A (query, vector) pair matches at most one
    * probe, so no dedup is needed.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
      .withColumn("bucket", bucketCol(col("embedding")))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("bucket").as("qbucket"))
      .select(col("qid"), col("qe"),
        explode(array(probeCols(col("qbucket")): _*)).as("probe"))
    val sims = e.join(broadcast(q),
        col("bucket") === col("probe") && col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Minimum in-cell document frequency for a q175 topic term —
    * shared with the oracle by name (singleton terms have unbounded
    * lift and label nothing).
    */
  val TopicMinSupport = 2

  /** Cluster topic labeling (q175) — the human-readable face of the
    * embedding clusters: for each trained k-means cell, the terms
    * most DISTINCTIVE of its documents (highest lift = in-cell
    * document rate / corpus document rate — the c-TF-IDF idea
    * BERTopic popularized; raw counts would label every cell with
    * the same corpus-common words). This is how a curation pipeline
    * audits what a cluster IS before acting on it (dedup, rebalance,
    * drop) — composing q31c's trained centroids with the documents
    * table through the doc_id = vec_id keying of the corpus.
    *
    * Shapes: (doc, distinct-term) rows appear once each (per-row
    * array_distinct before the explode — the q73 discipline, no
    * corpus-token aggregation); cell and corpus df are both
    * map-side-combinable counts; the lift join broadcasts the
    * vocabulary-sized df and ncells-sized cell-size relations; lift
    * is the exact integer ppm (c_cell·N·10⁶) div (n_cell·c_corp) —
    * PMI's argument, the q84 idiom — so ranking is integer-exact
    * cross-engine; the per-cell top-k plans as a TopKRows heap via
    * the injected rewrite.
    */
  def clusterTopicTerms(spark: SparkSession, dir: String, k: Int = 3,
      ncells: Int = 16, iters: Int = 2): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    // Materialized ONCE (r22, the cappedBands pattern): the cell
    // assignment kernel feeds the cell-terms join AND the cell-sizes
    // aggregate; the tokenize+explode feeds the cell-terms join AND
    // the corpus-frequency aggregate — each used to re-evaluate its
    // whole upstream per consumer on the 1-task scans.
    val cells = Dedup.materializeOnce(
      cellAssignmentsFor(e, trainedCentroids(spark, dir, ncells, iters)))
    val docs = Corpus.read(spark, dir, "documents")
    val docTerms = Dedup.materializeOnce(docs.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term")))
    val cellTerms = docTerms
      .join(cells, docTerms("doc_id") === cells("vec_id"))
      .groupBy(col("cid"), col("term"))
      .agg(count(lit(1)).as("c_cell"))
    val corpusTerms = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("c_corp"))
    val cellSizes = cells.groupBy(col("cid")).agg(count(lit(1)).as("n_cell"))
    val n = docs.agg(count(lit(1)).as("nd"))
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("lift_ppm").desc, col("term"))
    cellTerms
      .filter(col("c_cell") >= TopicMinSupport)
      .join(broadcast(corpusTerms), Seq("term"))
      .join(broadcast(cellSizes), Seq("cid"))
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm",
        expr("c_cell * nd * 1000000 div (n_cell * c_corp)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("cid"), col("rk"), col("term"), col("c_cell"),
        col("n_cell"), col("c_corp"), col("lift_ppm"))
      .orderBy(col("cid"), col("rk"))
  }

  /** Scratch dir for the q195 stored index — one per (JVM, purpose),
    * overwritten per invocation (the Layout.jvmScratchDir argument:
    * a fresh temp dir per call would leak a copy per bench sample).
    */
  private lazy val indexScratch: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_index")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit))
    p.toString
  }

  /** Stored IVF index with partition-pruned probes (q195) — the
    * MATERIALIZED form of the q31b story, which until now lived in
    * Scaladoc: the index build writes every vector into its cell's
    * PARTITION (`partitionBy("cid")` parquet — exactly how a
    * lakehouse vector index is laid out), and the search reads ONLY
    * the probed cells: the `cid IN (…)` predicate is a static
    * partition filter, so non-probed cells' files are never opened
    * (plan-pinned in SimilaritySpec via PartitionFilters + input-file
    * count). Same cells, probes and ranking as q31b — the oracle is
    * the identical replay — so the gate proves the stored layout
    * changes I/O, never results. cid is written as INT so the
    * partition-column type survives directory-name inference and the
    * prune compares un-cast attributes.
    */
  def storedIvfTopK(spark: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = 2, ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val cents = firstNCentroids(e, ncells)
    val cells = cellAssignmentsFor(e, cents)
      .withColumn("cid", col("cid").cast("int"))
    cells.join(e, Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$indexScratch/ivf")
    val stored = spark.read.parquet(s"$indexScratch/ivf")
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("s",
        round(VectorFunctions.cosine_sim(col("embedding"), col("ce")), 6))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("s").desc, col("cid"))
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("cid").cast("int").as("cid"))
    val probedCells = probes.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).sorted
    val qe = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    stored.where(col("cid").isin(probedCells.map(Integer.valueOf): _*))
      .join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(qe), Seq("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Embedding-space health report (q196) — the pre-indexing check a
    * vector pipeline runs before trusting ANN recall (and the
    * embedding-side sibling of q69's moment aggregates): per
    * dimension, count / mean / sample-stddev / min / max / exact
    * zero count. Dead dimensions (sd ≈ 0, all-zero) break IVF cell
    * balance and waste quantization bits; off-center dimensions
    * break the symmetric-int8 assumption q172 documents. One
    * posexplode (row count × 64 — dimension-bounded, not
    * corpus-token-like) into one map-side-combinable aggregate;
    * rounding per the q69 convention (mean at 6, sd at 4 — the
    * moment sums' association-order delta sits ~7 orders below).
    */
  def embeddingHealth(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .select((col("i") + 1).cast("long").as("dim"),
        col("v").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("v")), 6).as("mean"),
        round(stddev_samp(col("v")), 4).as("sd"),
        min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        sum(when(col("v") === 0d, 1L).otherwise(0L)).as("n_zero"))
      .orderBy(col("dim"))

  /** Candidate depth for [[binaryTopK]] — shared with the oracle. */
  val BqCandidates = 30

  /** Binary (1-bit) quantized ANN (q180) — the extreme end of the
    * quantization spectrum next to SQ8 (q172): one SIGN BIT per
    * dimension, 32× smaller than float32, candidates ranked by
    * Hamming distance (one xor + popcount per pair — the cheapest
    * possible scan), then the exact cosine kernel on candidates only.
    * This is pgvector's `bit(n)`/Milvus BQ and the re-rank pattern
    * every binary-quantization deployment uses, and the 64-bit
    * completion of the 8-bit sign-LSH bucketing q29/q31 block with:
    * same sign signal, here scanned exhaustively as a distance rather
    * than bucketed.
    *
    * The engine packs the 64 sign bits into ONE long in the scan
    * projection (codegen'd 64-term bitwise-OR) and ranks by
    * `bit_count(xor)`; the ORACLE never packs — it counts
    * sign-mismatched dimensions directly from the float arrays —
    * independent encodings of the Hamming distance (the q46
    * pattern). Candidate rank (ham asc, vec_id) plans as a bounded
    * TopKRows heap; exact cosine touches ≤ C×Q rows. At 100 TB the
    * packed-signature relation is 8 bytes/vector — small enough to
    * broadcast corpus-scale shards or SIMD-scan at memory bandwidth.
    */
  def binaryTopK(spark: SparkSession, dir: String, k: Int = 5,
      cands: Int = BqCandidates): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val sigs = e.select(col("vec_id"), col("embedding"),
      VectorFunctions.sign_bits64(col("embedding")).as("sig"))
    val q = sigs.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("sig").as("qsig"))
    val scored = sigs.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("ham",
        bit_count(col("sig").bitwiseXOR(col("qsig"))).cast("long"))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("vec_id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= cands)
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("ham"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** RRF constant (Cormack et al. 2009's k = 60, the
    * Elasticsearch/OpenSearch default) and per-list depth for
    * [[hybridRrf]] — shared with the oracle by name.
    */
  val RrfK = 60
  val RrfDepth = 50

  /** Hybrid retrieval via reciprocal-rank fusion (q179) — the
    * production way to combine lexical and vector search
    * (Elasticsearch/OpenSearch ship exactly this): rank the corpus by
    * BM25 for the text query (q171's scoring) and by cosine against
    * the query embedding (q30's kernel), then fuse with
    * RRF(d) = Σ_lists 1/(k + rank_d) — rank-based, so the two
    * incomparable score scales never meet, and a doc missing from one
    * list simply contributes nothing (the standard convention).
    *
    * Determinism: ranks are integers, each 1/(k+r) is one IEEE
    * division and the fusion is a TWO-term fixed-order sum — no
    * association ambiguity at all (stronger than the q130 ln
    * situation); ties broken by doc_id. Scale: each list is a global
    * top-[[RrfDepth]] (`TakeOrderedAndProject` — per-partition heaps,
    * depth rows to the driver side of the exchange), the fusion join
    * touches ≤ 2·depth rows. The corpus is scanned once per modality;
    * at interactive latency the lists come from the q99 inverted
    * index and the q31b/c IVF cells instead — same fusion.
    */
  def hybridRrf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import graft.operators.TextAnalysis.{tokens, SearchTerms}
    val Seq(t1, t2, t3) = SearchTerms
    // Text list: q171's BM25 raw score, global top-RrfDepth, ranked.
    def tf(t: String) =
      size(filter(tokens(col("text")), x => x === lit(t))).cast("long")
    val counted = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tf(t1).as("tf_a"), tf(t2).as("tf_b"),
        tf(t3).as("tf_c"),
        size(tokens(col("text"))).cast("long").as("dl"))
    val norms = counted.agg(
      sum((col("tf_a") > 0).cast("long")).as("df_a"),
      sum((col("tf_b") > 0).cast("long")).as("df_b"),
      sum((col("tf_c") > 0).cast("long")).as("df_c"),
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // Integer-rational idf via FixedLog — (2N+2)/(2df+1), the r18
    // conversion shared with q171 (see bm25Search's doc): no libm in
    // the text leg; the remaining float factor is identical IEEE
    // arithmetic on both engines.
    def idf(dfc: Column) =
      graft.functions.FixedLog.ln_scaled(col("n_docs") * 2 + lit(2L),
        dfc * 2 + lit(1L), 9).cast("double") / lit(1e9)
    def part(tfc: Column, dfc: Column) =
      idf(dfc) * (tfc.cast("double") * lit(2.2)) /
        (tfc.cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") /
            col("avgdl"))))
    val wText = Window.orderBy(col("raw").desc, col("doc_id"))
    val textList = counted.crossJoin(broadcast(norms))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .filter(col("tf_a") + col("tf_b") + col("tf_c") > 0)
      .withColumn("raw",
        part(col("tf_a"), col("df_a")) + part(col("tf_b"), col("df_b"))
          + part(col("tf_c"), col("df_c")))
      .orderBy(col("raw").desc, col("doc_id")).limit(RrfDepth)
      .withColumn("rank_text", row_number().over(wText).cast("long"))
      .select(col("doc_id"), col("rank_text"))
    // Vector list: cosine against THE query embedding (vec_id 0),
    // global top-RrfDepth, ranked. doc_id = vec_id keys the corpus.
    val e = Corpus.read(spark, dir, "embeddings")
    val qe = e.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val wVec = Window.orderBy(col("sim").desc, col("vec_id"))
    val vecList = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qe))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .orderBy(col("sim").desc, col("vec_id")).limit(RrfDepth)
      .withColumn("rank_vec", row_number().over(wVec).cast("long"))
      .select(col("vec_id").as("doc_id"), col("rank_vec"))
    def contrib(rank: Column) =
      when(rank.isNotNull, lit(1.0) / (lit(RrfK).cast("double")
        + rank.cast("double"))).otherwise(lit(0.0))
    val wFuse = Window.orderBy(col("rrf").desc, col("doc_id"))
    textList.join(vecList, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        contrib(col("rank_text")) + contrib(col("rank_vec")))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .withColumn("rk", row_number().over(wFuse).cast("long"))
      .select(col("rk"), col("doc_id"), col("rank_text"), col("rank_vec"),
        round(col("rrf"), 9).as("rrf"))
      .orderBy(col("rk"))
  }

  /** Scalar-quantized (int8) ANN with exact re-rank (q172) — the
    * memory-compression path every production vector store ships
    * (FAISS SQ8, Milvus, pgvector): store each vector as int8 codes +
    * one per-vector scale (4x smaller than float32, 8x than float64),
    * scan the COMPRESSED codes for candidates, then re-rank only the
    * candidates at full precision.
    *
    * Quantization (symmetric, per-vector): scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) ∈ [−127, 127] — floor(·+0.5)
    * instead of round() because the two engines' round() differ on
    * half-way cases while floor is IEEE-identical; q_i cannot escape
    * ±127 (|x|/scale ≤ 127 exactly, and an ulp of division error
    * moves 127 + 0.5 by far less than the 0.5 gap to 128). An
    * all-zero vector gets scale 0 and all-zero codes.
    *
    * Approximate score: the EXACT integer dot of the code arrays
    * (order-free — no float-summation ambiguity at all, unlike the
    * float kernels) times scale_q·scale_d, approximating the raw
    * float dot. Candidate top-C per query ranks on that (rounded at
    * 1e-6, vec_id tiebreak), plans as a bounded TopKRows heap via the
    * injected rewrite; the exact cosine kernel then runs on C×Q rows
    * only, never the corpus.
    *
    * At 100 TB: the quantized relation (codes + scale) is what the
    * store materializes and scans — 4x the scan throughput at equal
    * IO — while the float originals are fetched only for the ≤ C×Q
    * candidate rows; the integer dot is SIMD-friendly inside
    * whole-stage codegen. Composes with IVF cells (q31b/c) the same
    * way FAISS IVF+SQ does: quantize within each cell's scan.
    */
  def sqTopK(spark: SparkSession, dir: String, k: Int = 5,
      cands: Int = 20): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val quant = e.select(col("vec_id"), col("embedding"),
        (array_max(transform(col("embedding"), x => abs(x))).cast("double")
          / lit(127.0)).as("scale"))
      .withColumn("qv", transform(col("embedding"),
        x => when(col("scale") === 0d, lit(0L))
          .otherwise(floor(x.cast("double") / col("scale") + lit(0.5)))))
    val q = quant.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("scale").as("qscale"), col("qv").as("qqv"))
    val scored = quant.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("qdot",
        aggregate(zip_with(col("qqv"), col("qv"), (a, b) => a * b),
          lit(0L), (acc, v) => acc + v))
      .withColumn("approx",
        round(col("qdot").cast("double") * col("qscale") * col("scale"), 6))
    val wc = Window.partitionBy(col("qid"))
      .orderBy(col("approx").desc, col("vec_id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("crk", row_number().over(wc))
      .filter(col("crk") <= cands)
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("qdot"), col("approx"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Product-quantization geometry (q214) — named so the oracle SQL
    * interpolates the same constants: M subspaces × Dsub dims (= the
    * 64-dim corpus), K centroids per subspace, C ADC candidates.
    */
  val PqM = 8; val PqDsub = 8; val PqK = 4; val PqCands = 50

  /** Per-(vector, subspace) slice rows — the n×M expansion every PQ
    * stage shares. Dimension-bounded (M is a constant), never
    * corpus-shaped beyond the factor M.
    */
  private def pqSubRows(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("embedding"))
      .withColumn("sub", expr(s"slice(embedding, m * $PqDsub + 1, $PqDsub)"))
      .drop("embedding")

  /** Rounded squared-L2 between two Dsub-slices: an all-double
    * fixed-order fold (zip_with + aggregate — codegen'd higher-order
    * functions), rounded at 1e-6 before any compare so summation
    * order can never flip an argmin (the q31c discipline).
    */
  private def pqDist(a: Column, b: Column): Column =
    round(expr(s"aggregate(zip_with(${a.toString}, ${b.toString}, " +
      "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * " +
      "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"), 6)

  /** Per-(vec, subspace) nearest-centroid assignment against a
    * broadcast codebook (m, cid, ce): min over (d2, cid).
    */
  private def pqAssign(subRows: DataFrame, codebook: DataFrame): DataFrame =
    subRows.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", pqDist(col("sub"), col("ce")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** Product-quantization ANN (q214) — the classic codebook
    * compression (Jégou et al., the FAISS `PQ8` family) completing
    * this engine's quantization spectrum next to SQ8 (q172), 1-bit
    * (q180) and IVF cells (q31b/c): each vector's M=8 subspaces are
    * separately vector-quantized to K=4 trained centroids, so a
    * vector stores M log₂K bits of code, and a query scores the
    * WHOLE corpus from an M×K lookup table of subspace distances
    * (ADC — one table build per query, then per-vector work = M adds
    * of precomputed cells, no float math against the corpus floats).
    * Exact cosine re-ranks only the C best ADC candidates.
    *
    * Training is one Lloyd round per subspace from the deterministic
    * first-K init — the q31c recipe verbatim (round-6 before argmin,
    * per-dim mean round-6 cast float, localCheckpoint of the
    * codebook), so every stage replays exactly in the oracle. At
    * 100 TB the code relation (M small ints per vector) IS the
    * materialized scan — 32× smaller than the floats, which are
    * fetched per-candidate only; the ADC join is codes ⋈ a
    * queries×M×K-row broadcast, aggregated per (query, vector) —
    * map-side-combinable, never an all-pairs float scan.
    */
  def pqTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val subs = pqSubRows(e)
    val init = pqSubRows(e.filter(col("vec_id") < PqK))
      .select(col("m"), col("vec_id").as("cid"), col("sub").as("ce"))
    val trained = pqAssign(subs, init)
      .join(subs, Seq("vec_id", "m"))
      .select(col("m"), col("cid"), posexplode(col("sub")).as(Seq("i", "v")))
      .groupBy(col("m"), col("cid"), col("i"))
      .agg(round(avg(col("v").cast("double")), 6).as("mv"))
      .groupBy(col("m"), col("cid"))
      .agg(expr("transform(array_sort(collect_list(struct(i, mv)))," +
        " x -> CAST(x.mv AS FLOAT))").as("ce"))
      .localCheckpoint(true)
    val codes = pqAssign(subs, trained)
    val adc = pqSubRows(e.filter(col("vec_id") < NumQueries))
      .withColumnRenamed("vec_id", "qid")
      .join(broadcast(trained), Seq("m"))
      .select(col("qid"), col("m"), col("cid"),
        pqDist(col("sub"), col("ce")).as("dq"))
    val wApprox = Window.partitionBy(col("qid"))
      .orderBy(col("approx"), col("vec_id"))
    val cands = codes.join(broadcast(adc), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(round(sum(col("dq")), 6).as("approx"))
      .withColumn("crk", row_number().over(wApprox))
      .filter(col("crk") <= PqCands)
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    cands.join(e, Seq("vec_id")).join(broadcast(q), Seq("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("approx"), col("sim"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Matryoshka (MRL) truncation recall audit (q235) — the
    * serving-dimension decision for MRL-trained embeddings: how much
    * of the full-dimension top-k survives when vectors are truncated
    * to their first d dimensions (the whole point of Matryoshka
    * Representation Learning is that prefixes are usable embeddings;
    * this measures what a given prefix actually costs in retrieval
    * recall). For each d, brute-force top-k by cosine over the first
    * d dims (queries broadcast — the q30 shape; the ranks plan as
    * TopKRows heaps), intersect with the full-dim truth set, report
    * exact integer recall permille. d = full is the self-consistency
    * row (1000‰ by construction — same tie-break both times); its
    * top-k is computed ONCE (localCheckpoint) and serves as both the
    * truth set and the d = max report row — the most expensive
    * crossJoin+rank stage never runs twice. The dim list LEFT-joins
    * onto the hit counts, so a truncation with zero truth overlap
    * reports recall 0 instead of silently dropping its row.
    * Scores round at 1e-6 before ranking (suite float discipline).
    */
  def mrlRecall(spark: SparkSession, dir: String, k: Int = 10,
      dims: Seq[Int] = Seq(16, 32, 64)): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def topk(d: Int): DataFrame = {
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("sim").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("sim", round(VectorFunctions.cosine_sim(
          slice(col("qe"), 1, d), slice(col("embedding"), 1, d)), 6))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select(lit(d.toLong).as("dim"), col("qid"),
          col("vec_id").as("vb"))
    }
    val full = topk(dims.max).localCheckpoint(true)
    val truth = full.select(col("qid"), col("vb"))
    val all = (dims.filter(_ != dims.max).map(topk) :+ full)
      .reduce(_ unionByName _)
    val hits = all.join(truth, Seq("qid", "vb"))
      .groupBy(col("dim")).agg(count(lit(1)).as("n_hits"))
    val dimRows = spark.range(1).select(
      explode(array(dims.map(d => lit(d.toLong)): _*)).as("dim"))
    dimRows.join(hits, Seq("dim"), "left_outer")
      .select(col("dim"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("recall_permille",
        expr(s"n_hits * 1000 div ${NumQueries.toLong * k}"))
      .orderBy(col("dim"))
  }

  /** Hard-negative mining for contrastive training (q201) — for each
    * anchor, the k most similar DIFFERENT-label vectors (the
    * negatives that actually move an embedding model; random
    * negatives are trivially separable), alongside the anchor's
    * hardest positive (the least similar SAME-label vector) and the
    * FaceNet semi-hard flag `sim_neg < sim_pos` — the triplet
    * construction a metric-learning pipeline feeds its loss.
    *
    * Shape: one pass over anchor×corpus pairs (anchors broadcast —
    * the q30 baseline), split into a per-anchor min aggregate
    * (hardest positive: 1 row/anchor, broadcast back) and a
    * per-anchor rank that plans as a bounded TopKRows heap via the
    * injected rank-limit rewrite. At many-anchor scale the same
    * policy runs over [[knnJoin]]'s cell-co-partitioned candidates
    * instead of the broadcast scan (the q154 argument) — the mining
    * predicate and ranking are unchanged. Scores round to 1e-6
    * before ranking/compares (the suite-wide float discipline).
    */
  def hardNegatives(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("qlabel"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim",
        round(VectorFunctions.cosine_sim(col("qe"), col("embedding")), 6))
    val pos = pairs.filter(col("label") === col("qlabel"))
      .groupBy(col("qid")).agg(min(col("sim")).as("pos_sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    pairs.filter(col("label") =!= col("qlabel"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      // LEFT join: an anchor whose label has no OTHER same-label
      // vector has no hardest positive — it must keep its negatives
      // (pos_sim and is_semihard NULL on both engines; NULL < NULL
      // comparison propagates identically), not silently vanish from
      // the mined set the way an inner join would drop it.
      .join(broadcast(pos), Seq("qid"), "left_outer")
      .select(col("qid"), col("rk"), col("vec_id").as("neighbor"),
        col("sim"), col("pos_sim"),
        (col("sim") < col("pos_sim")).cast("long").as("is_semihard"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Incremental IVF index maintenance (q250) — the q248/q249 IVM
    * pattern on the ANN side: a production IVF index is maintained by
    * add/remove against FROZEN centroids (FAISS's `add`/`remove_ids`
    * contract — the centroids are model parameters trained once; a
    * re-train is a rebuild, not maintenance). The stored (vec_id,
    * cid) assignment index is updated row-level: departed keys
    * anti-joined out, arrivals assigned by ONE broadcast-centroid
    * pass over the DELTA only ([[cellAssignmentsFor]] — the same
    * argmax expression the full build uses, so maintenance and
    * rebuild can never disagree on a cell). The fixture re-keys
    * mod-13 vectors with NEGATED embeddings (cosine sign flips, so
    * arrivals land in genuinely different cells than their
    * originals — Breadth16Spec pins that) and deletes mod-11 keys.
    *
    * The oracle reassigns ALL of snapshot B from scratch against the
    * same frozen centroids, so the per-cell (count, sum-of-ids) gate
    * is the IVM identity: maintenance ≡ rebuild, cross-engine.
    *
    * Scale: the arrival assignment is delta-sized work against a
    * bounded broadcast (ncells centroid rows); the index update is
    * one keyed anti-join (bucketed-co-located at warehouse scale,
    * q74); the stored index is never rescanned against centroids.
    * Cell-count drift under churn is the signal to re-train — the
    * q242 zorderHealth story applied to IVF; the per-cell report
    * this gate emits IS that monitor.
    */
  /** The frozen centroid model as a BOUNDED driver artifact (ncells
    * rows — the qS04 weight-table class): (cid, centroid) pairs for
    * [[assignCellCol]]'s per-row argmax. This is what a deployment
    * broadcasts to the ingest path.
    */
  def centroidModel(spark: SparkSession, dir: String,
      ncells: Int = 16): Seq[(Long, Seq[Float])] =
    Corpus.read(spark, dir, "embeddings")
      .filter(col("vec_id") < ncells)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .toSeq

  /** STATELESS per-row cell assignment against a centroid literal —
    * the streaming-safe form of [[cellAssignmentsFor]] (whose
    * groupBy/max_by is an aggregate a stream cannot run statelessly).
    * Same score (cosine rounded at 6) and same tie-break (highest
    * score, then LOWEST cid, encoded as max over struct(s, −cid) —
    * struct ordering is lexicographic on both engines); Breadth16Spec
    * pins expression≡aggregate equality on the full corpus, so the
    * ingest path and the batch build agree on every vector's cell by
    * construction.
    */
  def assignCellCol(emb: Column, model: Seq[(Long, Seq[Float])]): Column = {
    val cents = typedLit(model)
    val best = array_max(transform(cents, c =>
      struct(
        round(VectorFunctions.cosine_sim(emb, c.getField("_2")), 6).as("s"),
        (-c.getField("_1")).as("negcid"))))
    -best.getField("negcid")
  }

  def ivfIndexMaintenance(spark: SparkSession, dir: String,
      ncells: Int = 16): DataFrame = {
    val e = Corpus.read(spark, dir, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val cents = firstNCentroids(e, ncells)
    val idxA = cellAssignmentsFor(e, cents)
    val departed = e.filter(pmod(col("vec_id"), lit(11L)) === 0)
      .select(col("vec_id"))
    val arrivals = e.filter(pmod(col("vec_id"), lit(13L)) === 0)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val idxB = idxA.join(departed, Seq("vec_id"), "left_anti")
      .unionByName(cellAssignmentsFor(arrivals, cents))
    idxB.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
      .orderBy(col("cid"))
  }

  private lazy val maintScratch: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_ivf_maint")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit))
    p.toString
  }

  /** Outcome of one stored-index maintenance pass, for the
    * write-path audit (Breadth17Spec): the on-disk index root, the
    * cid partitions the delta touched, and the per-cell report.
    */
  private[graft] final case class StoredMaint(path: String,
      touched: Array[Int], result: DataFrame)

  /** STORED-index maintenance under CDC (q255) — q250's IVM composed
    * with q195's physical layout (the r16 verdict's "stored-index
    * write-path" ask): the index lives on disk partitioned by cid,
    * and maintenance REWRITES ONLY THE TOUCHED cid PARTITIONS via
    * dynamic partition overwrite — the lakehouse write path
    * (`spark.sql.sources.partitionOverwriteMode=dynamic`, passed as a
    * per-write option so concurrent writers are untouched). Untouched
    * partitions keep their exact files (byte-identical — Breadth17Spec
    * snapshots them between build and maintain via `afterBuild`).
    *
    * Flow: full build of snapshot A (q195's partitionBy("cid")
    * layout, embeddings as payload) → q250's delta fixture (mod-11
    * departures, re-keyed negated mod-13 arrivals) → touched cells =
    * departures' cells ∪ arrivals' cells (≤ ncells driver rows — the
    * probedCells collect class) → one write containing the NEW
    * contents of exactly those partitions. The per-cell report reads
    * the MAINTAINED FILES back, and the oracle is q250's from-scratch
    * logical recompute — hash-match proves physical-maintenance ≡
    * logical-rebuild across engines.
    *
    * At 100 TB: the write is delta-cell-bounded (churn touches few
    * cells between retrains), the read-back prunes to partitions, and
    * nothing rescans the stored index against centroids. Cited
    * reference behavior: flaco's Parquet sink contract (lib.rs:116-148)
    * — here extended to an incrementally-maintained partitioned sink.
    */
  def storedIvfMaintenance(spark: SparkSession, dir: String,
      ncells: Int = 16): DataFrame =
    storedIvfMaintenanceCore(spark, dir, ncells).result

  private[graft] def storedIvfMaintenanceCore(spark: SparkSession,
      dir: String, ncells: Int = 16,
      afterBuild: String => Unit = _ => ()): StoredMaint = {
    val path = s"$maintScratch/ivf"
    val e = Corpus.read(spark, dir, "embeddings")
    val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
    val cents = firstNCentroids(e, ncells)
    // Snapshot-A stored index: the q195 cid-partitioned layout with
    // the vector payload in place.
    cellAssignmentsFor(e, cents)
      .withColumn("cid", col("cid").cast("int"))
      .join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)
    afterBuild(path)
    // q250's CDC fixture SHAPE with sparser churn moduli (97/101):
    // realistic maintenance touches a strict subset of cells, which
    // is the whole point of the partition-scoped write (the q250
    // moduli churn every one of the 16 cells at gate scale, which
    // would degenerate this into a full rewrite); the oracle carries
    // the same moduli.
    val departed = e.filter(pmod(col("vec_id"), lit(97L)) === 0)
      .select(col("vec_id"))
    val arrivals = e.filter(pmod(col("vec_id"), lit(101L)) === 0)
      .select((col("vec_id") + lit(maxId + 1)).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val arrCells = cellAssignmentsFor(arrivals, cents)
      .withColumn("cid", col("cid").cast("int"))
    val stored = spark.read.parquet(path)
    val touched = stored.join(departed, Seq("vec_id"))
      .select(col("cid"))
      .union(arrCells.select(col("cid"))).distinct()
      .collect().map(_.getInt(0)).sorted
    val cols = stored.columns.map(col).toIndexedSeq
    val newParts = stored
      .where(col("cid").isin(touched.map(Integer.valueOf): _*))
      .join(departed, Seq("vec_id"), "left_anti")
      .unionByName(arrCells.join(arrivals, Seq("vec_id")).select(cols: _*))
    newParts.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cid").parquet(path)
    val report = spark.read.parquet(path)
      .groupBy(col("cid").cast("long").as("cid"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
      .orderBy(col("cid"))
    StoredMaint(path, touched, report)
  }
}
