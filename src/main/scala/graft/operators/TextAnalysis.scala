package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extensions; no reference analogue — flaco's only
  * compute is type conversion). All are single-pass, per-row,
  * codegen'd built-ins — embarrassingly parallel at 100 TB; the only
  * shuffles are the final small aggregations.
  *
  * Determinism contract for the DuckDB oracle: every derived number is
  * integer counting, exact integer division into doubles, or md5 —
  * identical in both engines.
  */
object TextAnalysis {

  /** Whitespace tokens (portable: regexp '\S+' in both engines). */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Per-document statistics: char/token counts, average word length. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("n_nonspace",
        length(regexp_replace(col("text"), "\\s+", "")))
      .select(
        col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_char"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("n_nonspace").cast("double") /
          greatest(col("n_tokens"), lit(1)), 6).as("avg_word_len"))
      .orderBy(col("doc_id"))

  /** Character-level quality battery (q177) — the symbol-diversity
    * signals C4/Gopher-class cleaning uses to catch keyboard-mash,
    * base64 blobs and repeated-character padding that token-level
    * stats (q21/q49) miss: alphabet size, most-frequent-character
    * share, and collision (Rényi-2) entropy −log2(Σ(c_i/n)²).
    * Rényi-2 instead of Shannon BY CONSTRUCTION of the oracle: Σc_i²
    * is an EXACT integer, so the only float op is one log2 of an
    * exact rational — no per-term float summation whose order could
    * differ cross-engine (the q130 fixed-order discipline taken to
    * its limit: one transcendental call, rounded at 6). The census
    * is ONE codegen'd kernel pass per row
    * ([[graft.functions.CharCensus]], O(chars) hash-map — the
    * higher-order array_distinct+count-lambda formulation is
    * O(alphabet × chars) and cost 5.7 s at sf0.1); no char-level
    * explode ever exists, zero shuffles.
    */
  def charQuality(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .withColumn("cc",
        graft.functions.UnicodeFunctions.char_census(col("text")))
      .select(col("doc_id"),
        col("cc.n_chars").as("n_chars_t"),
        col("cc.alphabet").as("alphabet"),
        col("cc.top_cnt").as("top_char_cnt"),
        expr("cc.top_cnt * 1000000 div cc.n_chars").as("top_char_ppm"),
        col("cc.sum_sq").as("sum_sq"),
        round(log2(
          (col("cc.n_chars") * col("cc.n_chars")).cast("double") /
            col("cc.sum_sq").cast("double")), 6).as("renyi2"))
      .orderBy(col("doc_id"))

  /** Stopword lists for the n-gram-heuristic language identifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "que", "los", "una"),
    "fr" -> Seq("le", "les", "des", "est", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Occurrences of ` w ` in the padded text via length arithmetic
    * over non-regex replace — exact integer math, identical scan
    * semantics (left-to-right, non-overlapping) in Spark and DuckDB,
    * so the oracle can use the formula verbatim.
    */
  private def hits(paddedName: String, w: String): Column = {
    val tokLen = w.length + 2
    (length(col(paddedName)) -
      length(expr(s"replace($paddedName, ' $w ', '')"))) / lit(tokLen)
  }

  private def langScore(paddedName: String, lang: String): Column =
    stopwords(lang).map(w => hits(paddedName, w)).reduce(_ + _)

  /** Language identification: stopword-count votes with a fixed
    * precedence order for ties (en > de > es > fr > zh).
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("en", "de", "es", "fr", "zh")
    val scored = Corpus.read(spark, dir, "documents")
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .select(col("doc_id") +: col("lang") +:
        langs.map(l => langScore("padded", l).as(s"score_$l")): _*)
    val best = langs.map(l => col(s"score_$l")).reduce((a, b) => greatest(a, b))
    scored
      .withColumn("pred_lang",
        langs.foldRight(lit("und")) { (l, acc) =>
          when(col(s"score_$l") === best && best > 0, lit(l)).otherwise(acc)
        })
      .select(col("doc_id"), col("lang"), col("pred_lang"))
      .orderBy(col("doc_id"))
  }

  /** Language-ID confusion matrix (q198) — the EVALUATION of q22's
    * classifier, not another run of it: per (labeled, predicted)
    * language pair, the document count and the share of the label's
    * mass as exact integer ppm — the per-class recall diagonal and
    * every off-diagonal confusion a model card reports. On this
    * corpus the report does exactly its job: it EXPOSES that the
    * stopword heuristic cannot separate the synthetic labels (texts
    * draw from one shared token pool), predicting only en/und —
    * the "your classifier is broken on this distribution" signal a
    * confusion matrix exists to raise. One aggregate over q22's
    * per-doc projection + a labels-sized broadcast for the shares.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cm = langId(spark, dir)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cm.groupBy(col("lang")).agg(sum(col("n")).as("label_total"))
    cm.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("pred_lang"), col("n"),
        expr("n * 1000000 div label_total").as("share_ppm"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Per-document [0,1] quality score: length, punctuation density,
    * stopword ratio — the per-row scoring stage shared by
    * [[qualityScore]] and [[cleanCorpus]].
    */
  def docQuality(spark: SparkSession, dir: String): DataFrame =
    docQualityOf(Corpus.read(spark, dir, "documents"))

  /** The same per-row scoring over any document relation — including
    * an unbounded stream (stateless projection; see
    * [[graft.streaming.DocumentStreams]]).
    */
  def docQualityOf(docs: DataFrame): DataFrame = {
    val d = docs
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("n_punct",
        length(col("text")) - length(regexp_replace(col("text"), "[.,;:!?]", "")))
      .withColumn("n_stop", langScore("padded", "en"))
    val lenScore = least(length(col("text")).cast("double") / lit(400.0), lit(1.0))
    val punctRatio = col("n_punct").cast("double") / greatest(length(col("text")), lit(1))
    val stopRatio = col("n_stop").cast("double") / greatest(col("n_tokens"), lit(1))
    d.withColumn("quality",
      round(lenScore * 0.5 + stopRatio * 0.5 - punctRatio * 0.25, 6))
  }

  /** Quality aggregated per source. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    docQuality(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality") > 0.4, 1L).otherwise(0L)).as("n_good"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("source"))

  /** The composed training-data cleaning pipeline: quality-filter →
    * exact dedup (keep the lowest doc_id per fingerprint) → per-lang
    * corpus stats. Each stage is the operator tested on its own
    * (docQuality, fingerprintCol/exactDedup); composition stays one
    * declarative plan — filter pushes to the scan, dedup is one hash
    * aggregate, no materialization between stages.
    */
  /** Exact-dedup stage: keep the lowest doc_id per content
    * fingerprint (input must carry `fp` and `doc_id`) — shared by
    * [[cleanCorpus]] and [[trainingPipeline]].
    */
  def keepFirstByFingerprint(df: DataFrame): DataFrame = {
    // ONE-PASS form (r22, VERDICT #1): the former groupBy(fp).min +
    // left-semi probe consumed `df` TWICE — Spark has no common-
    // subplan dedup, so the upstream quality/fingerprint kernel
    // evaluated once under the aggregate and again under the probe
    // (the r21 checkpoint attempt serialized construction and measured
    // WORSE: q52 3.84→4.76 s). row_number over fp consumes df ONCE
    // with a single hash exchange of rows Catalyst prunes to the
    // consumed columns; rows kept are identical because doc_id is
    // unique, so rank-1 ≡ doc_id = min(doc_id) per fp.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    df.withColumn("__fp_rn", row_number().over(w))
      .filter(col("__fp_rn") === 1)
      .drop("__fp_rn")
  }

  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val scored = docQuality(spark, dir)
      .filter(col("quality") > 0.4)
      .withColumn("fp", fingerprintCol(col("text")))
    keepFirstByFingerprint(scored)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("lang"))
  }

  /** BPE-ish pre-tokenization: the GPT-2-style split into letter
    * runs, digit runs, and single non-alphanumeric marks — the
    * standard pre-pass before byte-pair merging. Pure RE2-compatible
    * regex, portable to the oracle.
    */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Per-document token-class counts: whitespace tokens vs BPE-ish
    * subword pre-tokens (letters / digits / marks) — the token
    * accounting a training-data pipeline budgets corpora with.
    */
  /** Count of non-overlapping matches of `pat` in the text column. */
  private def matchCount(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

  def tokenClasses(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_ws"),
        matchCount(BpeIshPattern).as("n_bpe"),
        matchCount("[A-Za-z]+").as("n_word"),
        matchCount("[0-9]+").as("n_num"),
        matchCount("[^A-Za-z0-9\\s]").as("n_mark"))
      .orderBy(col("doc_id"))

  /** Sequence packing: assign documents to fixed token-budget bins by
    * running token count — the batching pass before training-example
    * packing. Binning is per language: each partition's cumulative
    * sum is an independent window. bin = preceding-total div budget,
    * so a bin holds ~budget tokens (documents are never split).
    *
    * Scale caveat: lang has ~5 values, so one task packs each
    * language's whole corpus — fine as the compat path, wrong at
    * 100 TB. [[packBinsSharded]] is the layout-aware variant whose
    * shard count grows with the corpus.
    */
  def packBins(spark: SparkSession, dir: String, budget: Long = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Corpus.read(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("run", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(run - n_tok) div $budget"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy(col("lang"), col("bin"))
  }

  /** Layout-aware sequence packing: the shard key is a fixed-width
    * block of the storage order (doc_id div shardSize) instead of a
    * low-cardinality attribute, so shard count grows with the corpus
    * and no single task ever serializes packing — each shard packs
    * its own documents independently, which is exactly how packing
    * shards across a training fleet. The explicit
    * `repartitionByRange` pins the plan shape: one range exchange on
    * shard that the within-shard window then reuses (range
    * partitioning clusters equal shards, so the window adds no
    * second exchange), and shards come out storage-ordered.
    */
  /** Per-document shard/bin assignment — the shared core of
    * [[packBinsSharded]] (bin summary) and [[packManifest]] (bin
    * contents): (shard, doc_id, n_tok, bin).
    */
  private def shardedBins(spark: SparkSession, dir: String,
      budget: Long, shardSize: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Corpus.read(spark, dir, "documents")
      .select(expr(s"doc_id div $shardSize").as("shard"), col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .repartitionByRange(col("shard"))
      .withColumn("run", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(run - n_tok) div $budget"))
  }

  def packBinsSharded(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame =
    shardedBins(spark, dir, budget, shardSize)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy(col("shard"), col("bin"))

  /** The packing MANIFEST: per (shard, bin), the ordered document-id
    * list a training worker would concatenate into one sequence —
    * the artifact a packing job actually hands downstream, not just
    * its size audit. The list is bounded by construction (a bin holds
    * at most budget/min-doc-tokens documents), so the collect_list
    * aggregation state is bounded per group at any corpus size; ids
    * are sorted numerically before joining so the manifest is
    * deterministic and oracle-comparable.
    */
  def packManifest(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame =
    shardedBins(spark, dir, budget, shardSize)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"),
        expr("array_join(transform(sort_array(collect_list(doc_id)), " +
          "x -> cast(x AS string)), ',')").as("doc_list"))
      .orderBy(col("shard"), col("bin"))

  /** Packing-efficiency report (q202) — the padding-waste audit a
    * training pipeline runs over its packed shards: per shard, how
    * many bins the greedy packer produced, the token capacity those
    * bins reserve (bins × budget), and the waste as exact-integer
    * ppm — unfilled capacity is padding, and padding is wasted
    * compute at training time. min/max bin fill bound the spread
    * (the last bin of each shard is legitimately part-filled; a LOW
    * max means the budget is mis-sized vs document lengths).
    *
    * Cost: the q45b assignment's one range-shuffle + window, then two
    * map-side-combinable aggregates over the (shard, bin) summary —
    * the report adds nothing corpus-sized. All arithmetic is integer
    * (ppm via `div`), so the oracle replays it exactly.
    */
  def packingEfficiency(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame = {
    val bins = shardedBins(spark, dir, budget, shardSize)
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
    bins.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_docs"),
        sum(col("bin_tokens")).as("sum_tokens"),
        min(col("bin_tokens")).as("min_bin_fill"),
        max(col("bin_tokens")).as("max_bin_fill"))
      .withColumn("capacity", col("n_bins") * lit(budget))
      // A document longer than the budget overflows its bin, which can
      // push sum_tokens past capacity; waste and overflow are reported
      // as separate non-negative terms so the integer `div` below never
      // sees a negative numerator (Spark truncates toward zero, DuckDB
      // floors — they disagree only below zero).
      .withColumn("waste_ppm",
        expr("greatest(capacity - sum_tokens, 0L) * 1000000 div capacity"))
      .withColumn("overflow_tokens",
        expr("greatest(sum_tokens - capacity, 0L)"))
      .select(col("shard"), col("n_bins"), col("n_docs"),
        col("sum_tokens"), col("capacity"), col("waste_ppm"),
        col("overflow_tokens"), col("min_bin_fill"), col("max_bin_fill"))
      .orderBy(col("shard"))
  }

  /** Tokenizer-fertility report (q208) — the per-language cost model
    * a tokenizer/budget decision needs: how many characters and bytes
    * one token carries per language (CJK text tokenizes denser in
    * chars but heavier in bytes than Latin — the ratio drives both
    * context-window budgeting and storage forecasts), plus the
    * per-doc token-count quartiles that size packing bins (q45/q202
    * consume exactly this distribution). Ratios are exact-integer
    * milli-units (`×1000 div`); quartiles are `percentile_disc` over
    * integer counts — an actual element, engine-agreeable, unlike
    * interpolated percentiles. One scan + one hash aggregate.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("lang"), length(col("text")).cast("long").as("n_chars"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_bytes")).as("sum_bytes"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_tok)")
          .cast("long").as("tok_q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tok)")
          .cast("long").as("tok_med"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY n_tok)")
          .cast("long").as("tok_q3"))
      // Zero-guard: a language whose docs are all empty text has
      // sum_tokens = 0 — Spark div yields NULL, DuckDB // errors, so
      // both sides guard identically (the q226 recall_permille idiom).
      .withColumn("chars_per_tok_milli",
        expr("CASE WHEN sum_tokens > 0 " +
          "THEN sum_chars * 1000 div sum_tokens END"))
      .withColumn("bytes_per_tok_milli",
        expr("CASE WHEN sum_tokens > 0 " +
          "THEN sum_bytes * 1000 div sum_tokens END"))
      .orderBy(col("lang"))

  /** Spearman rank correlation between document quality and length
    * (q210) — the calibration check on a quality filter: q23's score
    * deliberately rewards length (half the score), and this gate
    * measures how much of the ranking that one feature explains
    * before anyone treats the score as an independent signal.
    *
    * Construction keeps floats to ONE final division: both metrics
    * rank by `row_number` over a fully tie-broken order ((metric,
    * doc_id) — a deterministic permutation, so the classic
    * 1 − 6Σd²/(n(n²−1)) formula applies verbatim), Σd² is an exact
    * integer, and ρ is one IEEE division of exact integers, rounded —
    * bit-identical cross-engine. The rounded-to-1e-6 quality values
    * are already cross-engine-pinned by q23.
    *
    * Scale: the two global rank assignments run as range-partitioned
    * distributed sorts via [[Relational.globalRowNumber]] (NOT an
    * unpartitioned Window — a single-task total sort the
    * plan-contract gate bans), joined back on doc_id; or the ranks
    * bin into percentile buckets (percentile_disc cutpoints, the
    * q209 idiom) when exact global ranks aren't worth two passes.
    */
  def spearmanQualityLength(spark: SparkSession, dir: String): DataFrame = {
    val base = docQuality(spark, dir)
      .select(col("doc_id"), col("quality"),
        length(col("text")).cast("long").as("n_chars"))
    val rq = Relational.globalRowNumber(
      base.select(col("doc_id"), col("quality")), "rq",
      col("quality"), col("doc_id")).select(col("doc_id"), col("rq"))
    val rl = Relational.globalRowNumber(
      base.select(col("doc_id"), col("n_chars")), "rl",
      col("n_chars"), col("doc_id")).select(col("doc_id"), col("rl"))
    rq.join(rl, Seq("doc_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum((col("rq") - col("rl")) * (col("rq") - col("rl")))
          .as("sum_d2"))
      .withColumn("rho", round(
        lit(1.0) - lit(6.0) * col("sum_d2") /
          (col("n_docs") * (col("n_docs") * col("n_docs") - lit(1L))), 6))
  }

  /** pg_trgm-style fuzzy matching (q233) — the PostgreSQL `pg_trgm`
    * extension's `similarity()` re-expressed declaratively: lowercase,
    * split into alnum words, pad each with two leading and one
    * trailing space (pg_trgm's exact padding, so word boundaries
    * weigh like the extension's), take distinct character 3-grams,
    * Jaccard over the two sets — the record-linkage primitive behind
    * PG's `%` operator and trigram indexes. Run here as fuzzy
    * NATION-name matching (UNITED STATES ↔ UNITED KINGDOM etc.):
    * dimension × dimension via broadcast (the q169 argument — at
    * corpus scale the trigram sets feed an LSH/inverted-index block
    * exactly like the q28 shingle pipeline; the per-row set
    * derivation is unchanged). All higher-order functions — no UDF,
    * no explode; similarity as exact integer permille.
    */
  def trgmFuzzyNations(spark: SparkSession, dir: String): DataFrame = {
    def trgmSql(c: String) =
      s"""array_distinct(flatten(transform(
         |  filter(split(lower($c), '[^a-z0-9]+'), w -> w <> ''),
         |  w -> transform(sequence(1, length(concat('  ', w, ' ')) - 2),
         |         i -> substring(concat('  ', w, ' '), i, 3)))))""".stripMargin
    val n = Corpus.read(spark, dir, "nation")
      .select(col("n_name").as("name"), expr(trgmSql("n_name")).as("tg"))
    val a = n.select(col("name").as("name_a"), col("tg").as("ta"))
    val b = n.select(col("name").as("name_b"), col("tg").as("tb"))
    a.crossJoin(broadcast(b))
      .filter(col("name_a") < col("name_b"))
      .withColumn("common",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("common") > 0)
      .withColumn("n_a", size(col("ta")).cast("long"))
      .withColumn("n_b", size(col("tb")).cast("long"))
      .withColumn("sim_permille",
        expr("common * 1000 div (n_a + n_b - common)"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"),
        col("common"), col("sim_permille"))
      .orderBy(col("sim_permille").desc, col("name_a"), col("name_b"))
  }

  /** Trigram document-frequency cap for [[fuzzyJoinCustomers]] —
    * named because the oracle interpolates the same value. The
    * pg_trgm-index analogue of [[Dedup.ContainDfCap]]: a trigram
    * occurring in more than this many names ('Customer#0000…'s
    * shared prefix — the df is the TABLE size) blocks nothing and
    * only multiplies candidates, so it is dropped from the index.
    */
  val TrgmDfCap = 64

  /** Blocked fuzzy JOIN (q234) — record linkage as PG users run it
    * with a pg_trgm index: a perturbed name list (here a
    * deterministic one-character deletion per customer name — the
    * dirty-feed stand-in) is joined back to the clean names by
    * char-trigram BLOCKING + edit-distance verification, never by a
    * cartesian compare:
    *
    *  1. both sides explode to (name, trigram) rows (q233's exact
    *     pg_trgm derivation);
    *  2. the clean-side index drops trigrams with df >
    *     [[TrgmDfCap]] (the shared 'Customer#0000' prefix trigrams
    *     have df = table size and block nothing — the df-cap is what
    *     makes a trigram index work on low-entropy name sets);
    *  3. candidates = distinct (dirty, clean) pairs sharing a
    *     surviving trigram — bounded by cap · index size;
    *  4. verify levenshtein ≤ 2 and keep the best match per dirty
    *     name ((distance, id) order — the rank plans as a TopKRows
    *     heap via the injected rewrite).
    *
    * Same candidate/verify shape as q28 (shingles→Jaccard) and q89
    * (inverted index→containment), instantiated for edit distance.
    */
  def fuzzyJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    def trgmSql(c: String) =
      s"""array_distinct(flatten(transform(
         |  filter(split(lower($c), '[^a-z0-9]+'), w -> w <> ''),
         |  w -> transform(sequence(1, length(concat('  ', w, ' ')) - 2),
         |         i -> substring(concat('  ', w, ' '), i, 3)))))""".stripMargin
    // spread: trigram explode + thresholded levenshtein otherwise
    // serialize on the 1-task single-file scan — narrow (id, name)
    // rows, the measured-win class (r21).
    val cust = graft.sources.Corpus.spread(Corpus.read(spark, dir, "customer"))
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("name"))
    // Deterministic one-char deletion at a key-dependent position
    // (2-based so the leading char survives; both engines replay it).
    // The modulus is floored at 1 (greatest) so a name of length ≤ 3
    // degrades identically on both engines instead of a NULL-vs-error
    // split on modulo-by-zero — the fixture's names are fixed-width,
    // but the docstring positions this as a template.
    val dirty = cust.select(col("id").as("did"),
      expr("concat(substring(name, 1, cast(id % greatest(length(name) - 2," +
        " 1) + 1 as int)), substring(name, cast(id % greatest(length(name)" +
        " - 2, 1) + 3 as int), 1000))").as("dname"))
    val cleanIdx = cust
      .select(col("id").as("cid"), col("name").as("cname"),
        explode(expr(trgmSql("name"))).as("tg"))
    val keep = cleanIdx.groupBy(col("tg"))
      .agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") <= TrgmDfCap)
      .select(col("tg"))
    val idx = cleanIdx.join(keep, Seq("tg"))
    // Candidates dedup on the ID PAIR only — the name strings would
    // otherwise ride the explode×index fan-out through the distinct
    // exchange (~millions of 36-byte payloads); the name lookups
    // rejoin as PLAIN equi-joins on the already-distinct pairs. The
    // name tables are corpus-derived (they grow with the corpus), so
    // a forced broadcast() here would be an eventual OOM at 100 TB —
    // the r15-verdict class; AQE still picks BHJ while they are small.
    val cand = dirty
      .select(col("did"), explode(expr(trgmSql("dname"))).as("tg"))
      .join(idx.select(col("tg"), col("cid")), Seq("tg"))
      .select(col("did"), col("cid"))
      .distinct()
      .join(dirty, Seq("did"))
      .join(cust.select(col("id").as("cid"),
        col("name").as("cname")), Seq("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("did")).orderBy(col("dist"), col("cid"))
    // Two exact pruning rules before/inside the verify: (a) a length
    // difference beyond the edit bound can never verify (levenshtein
    // ≥ |len(a) − len(b)|) — free on arbitrary corpora, a no-op on
    // the fixed-width fixture; (b) the THRESHOLDED levenshtein (banded
    // DP, early exit at 2) instead of the full O(|a|·|b|) matrix — it
    // returns −1 past the bound, which the ≤ 2 filter drops. Neither
    // changes the result, so the oracle keeps the plain form.
    val best = cand
      .filter(abs(length(col("dname")) - length(col("cname"))) <= 2)
      .withColumn("dist",
        levenshtein(col("dname"), col("cname"), 2).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("did"), col("cid").as("matched_id"),
        col("cname").as("matched_name"), col("dist"))
    // LEFT join so an UNMATCHED dirty name is a visible NULL row, not
    // a silent drop — blocking recall is part of the gated result
    // (the cap thins the index when names repeat verbatim, e.g. the
    // 10× replication fixture: df ∝ copies pushes even discriminating
    // trigrams over the cap; on real corpora names are distinct and
    // df is multiplicity-stable, but the failure mode must be LOUD).
    dirty.join(best, Seq("did"), "left_outer")
      .select(col("did"), col("dname"), col("matched_id"),
        col("matched_name"), col("dist"))
      .orderBy(col("did"))
  }

  /** Declarative ≤2-deletion neighborhood (distinct variant strings):
    * the string itself, every single-position deletion, every
    * two-position deletion — the twin of
    * [[graft.functions.EditDistanceKernel.deletionVariantHashes]]
    * (which q243 runs) and the formulation the q243 oracle replays.
    * Kept public so EditDistanceSpec can pin kernel-vs-declarative
    * hash-set equality on randomized strings.
    */
  def deletionNeighborhoodSql(c: String): String =
    s"""array_distinct(concat(
       |  array($c),
       |  transform(sequence(1, length($c)),
       |    i -> concat(substring($c, 1, i - 1),
       |                substring($c, i + 1, length($c)))),
       |  flatten(transform(sequence(1, greatest(length($c) - 1, 1)),
       |    i -> transform(sequence(least(i + 1, length($c)), length($c)),
       |      j -> concat(substring($c, 1, i - 1),
       |                  substring($c, i + 1, j - i - 1),
       |                  substring($c, j + 1, length($c))))))))""".stripMargin

  /** Deletion-neighborhood fuzzy JOIN (q243) — the scale-robust
    * answer to q234's measured trigram-recall cliff (SCALING.md
    * round-15: at 150 k distinct 9-digit names every digit trigram's
    * df crosses the cap and the index empties). FastSS/SymSpell
    * blocking (Bocek et al. 2007, "Fast Similarity Search in Large
    * Dictionaries"; SymSpell is the industrial descendant): for edit
    * distance ≤ d, ANY alignment deletes ≤ d chars from each side,
    * so two strings within distance d share an exact member of their
    * depth-d deletion neighborhoods — a NECESSARY condition with no
    * dependence on corpus entropy. Blocking therefore:
    *
    *  1. explode BOTH sides to their ≤2-deletion variants
    *     (1 + L + C(L,2) ≈ 172 strings for L = 18 — per-name cost a
    *     CONSTANT in corpus size, unlike any df-capped gram index);
    *  2. candidates = id pairs sharing a variant — an equi-join on
    *     xxhash64(variant) (8 bytes through the exchange instead of
    *     the ~17-char string; PROVABLY result-identical: every true
    *     dist ≤ 2 pair shares a real variant whose hash also
    *     matches, and a hash collision can only ADD a candidate at
    *     dist > 2, which the exact verify rejects). Pairs sharing
    *     several variants appear several times — deliberately NOT
    *     distinct()'d; see the inline note;
    *  3. verify thresholded levenshtein ≤ 2, best match per dirty
    *     name ((dist, cid) — plans as a TopKRows heap, which also
    *     absorbs the duplicate candidate rows), LEFT join so missed
    *     names stay loud (q234's contract).
    *
    * Recall is GUARANTEED (the neighborhood condition is necessary,
    * the verify is exact), so unlike q234 the 10× low-entropy
    * namespace keeps 100% matches — measured in SCALING.md. Cost is
    * linear in names (172·N index rows, short-string keys); false
    * candidates only form between names already within deletion
    * distance 4, so the candidate set tracks TRUE near-pair density
    * rather than gram-vocabulary saturation. Same output shape as
    * q234 for side-by-side comparison.
    */
  def symspellFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.EditDistanceFunctions.deletion_variant_hashes
    val cust = spread(Corpus.read(spark, dir, "customer"))
      .select(col("c_custkey").cast("long").as("id"),
        col("c_name").as("name"))
    // The SAME deterministic one-char deletion as q234 — the two
    // operators gate the same linkage problem, so their recall is
    // directly comparable.
    val dirty = cust.select(col("id").as("did"),
      expr("concat(substring(name, 1, cast(id % greatest(length(name) - 2," +
        " 1) + 1 as int)), substring(name, cast(id % greatest(length(name)" +
        " - 2, 1) + 3 as int), 1000))").as("dname"))
    // Variant HASHES straight from the kernel (r16): the declarative
    // sequence/transform/substring chain was the measured 10×-sweep
    // cost (52 s — interpreter constant, not algorithm); the kernel
    // emits the same hash SET from one byte pass per name
    // (EditDistanceKernel's bit-identity contract, pinned by
    // EditDistanceSpec; [[deletionNeighborhoodSql]] is the twin).
    val idx = cust
      .select(col("id").as("cid"),
        explode(deletion_variant_hashes(col("name"))).as("h"))
    // NO pair-level distinct (r16): a stage-attribution probe on the
    // 10× namespace measured 180 M join-output rows of which 147 M
    // are ALREADY distinct pairs (≈1000 candidates/name — the dense
    // numeric namespace's true near-pair volume), so a distinct()
    // here exchanges ~147 M rows to remove 18% duplicates that the
    // best-match TopKRows heap dedups for free (duplicate pairs
    // produce identical (dist, cid) rows; rank 1 keeps one —
    // result-identical, oracle re-verified). Removing it deletes the
    // plan's only candidate-volume exchange: the hydration joins
    // below are AQE broadcast-hash (name relations are corpus-derived
    // — no FORCED broadcast, the PlanContractSpec rule — but at any
    // SF the per-partition name slice AQE sees is join-key-bounded)
    // and the heap exchange carries ≤ 1 row per name per partition.
    // The duplicate share is namespace-dependent; if a future corpus
    // measured dup-dominated candidates, a pre-verify distinct would
    // re-earn its exchange — that trade is this comment.
    val cand = dirty
      .select(col("did"),
        explode(deletion_variant_hashes(col("dname"))).as("h"))
      .join(idx, Seq("h"))
      .select(col("did"), col("cid"))
      .join(dirty, Seq("did"))
      .join(cust.select(col("id").as("cid"),
        col("name").as("cname")), Seq("cid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("did")).orderBy(col("dist"), col("cid"))
    val best = cand
      .withColumn("dist",
        levenshtein(col("dname"), col("cname"), 2).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= 2)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("did"), col("cid").as("matched_id"),
        col("cname").as("matched_name"), col("dist"))
    dirty.join(best, Seq("did"), "left_outer")
      .select(col("did"), col("dname"), col("matched_id"),
        col("matched_name"), col("dist"))
      .orderBy(col("did"))
  }

  /** Merge-rule count for [[bpeTrain]] — shared with the oracle by
    * name (the oracle unrolls one SQL stage per round). 8 → 64 in
    * r16 (the verdict's "scale BPE past the toy" ask); the per-round
    * cost row lives in SCALING.md. A production ~32k-merge run keeps
    * this exact per-round shape — the driver still sees one argmax
    * row per round — and swaps the replace-chain APPLICATION for a
    * longest-match trie kernel; at 64 rules the measured chain cost
    * is still vocabulary-bounded-flat, so the kernel stays unshipped.
    */
  val BpeMerges = 64

  /** Session-scoped memo of the trained merge table, keyed by
    * (rounds, corpus dir): the merge table IS the deployable artifact
    * a tokenizer ships, so [[bpeApply]] (q245) applies the table
    * [[bpeTrain]] (q244) already trained instead of re-running the
    * 64-round driver loop (the r15 verdict's ask #4). Bounded:
    * [[BpeMerges]] rows per corpus dir ever trained in the session.
    */
  private val bpeMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, Seq[(Long, String, String, Long)]]()

  /** BPE tokenizer TRAINING (q244) — byte-pair-encoding merge-rule
    * induction (Sennrich et al. 2016, "Neural Machine Translation of
    * Rare Words with Subword Units"): the step every real pipeline
    * runs BEFORE the token-counting/fertility/packing operators
    * (q72/q95/q208) can exist. The algorithm, Spark-first:
    *
    *  1. ONE corpus pass collapses documents to the (word, count)
    *     vocabulary (Heaps-law-bounded — every later round works on
    *     the vocabulary, never the corpus: the reason dictionary-BPE
    *     is the industrial shape);
    *  2. each word becomes a symbol string with every symbol
    *     INDIVIDUALLY fenced ('·a··b··c·' — symbols joined by '··');
    *     per round: adjacent-pair counts weighted by word count and
    *     the (count desc, pair asc) argmax, computed in ONE stage by
    *     a mapPartitions kernel over the single-partition vocab (r21
    *     — exact because partial counts never split; the former
    *     explode → hash aggregate → TakeOrdered form planned 3
    *     stages/round through an exchange and the 64 sequential
    *     rounds paid the stage floor, not the data: 6.2 s → ~2.4 s),
    *     then the merge applied as a single
    *     `replace('·a··b·' → '·ab·')` per word. The DOUBLE fence is
    *     load-bearing: with single separators a chained run
    *     ('a a a a') only merges alternate pairs because each match
    *     consumes the shared boundary; with per-symbol fences the
    *     matches are disjoint and `replace`'s
    *     leftmost-non-overlapping contract IS exactly BPE's greedy
    *     left-to-right merge (both engines share it — and the
    *     Breadth15Spec brute-force replay pins it against a plain
    *     Scala implementation of the paper's algorithm).
    *     Precondition: the corpus never contains U+00B7 (checked
    *     nowhere cheaper than the fixture; any fence char outside
    *     the corpus alphabet works);
    *  3. [[BpeMerges]] rounds; per-round LAZY `localCheckpoint`
    *     truncates the lineage every round while keeping each round
    *     ONE Spark job (the q108b closure-loop hygiene, job-fused).
    *
    * Output: the merge table (rank, left, right, pair_count) — the
    * artifact a tokenizer ships. Driver traffic per round is ONE
    * row (the argmax); at 100 TB the corpus is read once and the
    * loop runs on the distributed vocabulary. Measured shape at 64
    * rounds (SCALING.md r16): wall is the per-round driver
    * plan+job floor (~0.1 s/round on local[32]), executor cpu ~1 s,
    * volume-flat at 10× — the sequential argmax dependence is BPE's
    * own; a production 32k-merge run amortizes it by training on the
    * frequency-capped vocabulary the same loop shape produces.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // q244 ALWAYS trains (its gate and bench number measure the
    // training loop) and refreshes the memo [[bpeApply]] reads.
    val rows = bpeTrainUncached(spark, dir)
    bpeMemo.put(s"$BpeMerges#$dir", rows): Unit
    rows.toDF("rank", "lhs", "rhs", "pair_count")
      .orderBy(col("rank"))
  }

  private def bpeTrainUncached(spark: SparkSession,
      dir: String): Seq[(Long, String, String, Long)] = {
    val sep = "·"
    var words = Corpus.read(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(concat(lit(sep),
        array_join(expr("transform(sequence(1, length(w)), " +
          "i -> substring(w, i, 1))"), sep + sep),
        lit(sep)).as("sym"), col("cnt"))
      // The loop body re-materializes the vocabulary [[BpeMerges]]
      // times; at 64 rounds per-round TASK overhead (not data) is the
      // measured cost, so the Heaps-bounded vocab runs on ONE fat
      // partition (r21: 8 → 1 measured 6.2 s → see OPTIMIZATION_r21;
      // per-round work is a pair-count over the vocab — q253's local
      // trainer does the identical work single-threaded in
      // microseconds, so even a 100 TB corpus' Heaps/cap-bounded
      // vocab never needs more than one partition per round; 8 thin
      // tasks just multiplied the per-round stage floor).
      .coalesce(1)
      .localCheckpoint()
    // Per-round argmax: pair-count + (count desc, pair asc) argmax in
    // ONE stage over the single-partition vocab (r21 — the former
    // explode → groupBy → TakeOrdered form planned 3 stages per round
    // through an exchange; at 64 sequential rounds the stage floor,
    // not the data, was the measured cost: 6.0 s → 2.3 s at sf0.1).
    // The argmax is exact BECAUSE the vocab is one partition (the
    // coalesce above): partial pair counts never split. Tie-break is
    // byte-identical to the SQL form: UTF8 binary ascending on
    // (a, b), the same ordering orderBy(a, b) used. The MERGE stays
    // the engine's regexp_replace chain below — the cross-engine
    // replace-semantics leg the q244 gate pins (the DuckDB oracle
    // unrolls the same chain); pair counting is plain counting, which
    // the oracle independently re-derives via unnest + GROUP BY.
    import spark.implicits._
    def utf8Less(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val ai = a(i) & 0xff; val bi = b(i) & 0xff
        if (ai != bi) return ai < bi
        i += 1
      }
      a.length < b.length
    }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    var rank = 1
    var exhausted = false
    while (rank <= BpeMerges && !exhausted) {
      val rows = words.select(col("sym"), col("cnt")).as[(String, Long)]
        .mapPartitions { it =>
          val m = scala.collection.mutable.HashMap
            .empty[(String, String), Long]
          it.foreach { case (sym, c) =>
            // Unfence '·a··bc·' → ['a', 'bc'] and count adjacent pairs.
            val syms = sym.substring(1, sym.length - 1)
              .split(java.util.regex.Pattern.quote(sep + sep))
            var i = 0
            while (i < syms.length - 1) {
              val p = (syms(i), syms(i + 1))
              m.update(p, m.getOrElse(p, 0L) + c)
              i += 1
            }
          }
          if (m.isEmpty) Iterator.empty
          else Iterator.single(m.foldLeft(null: ((String, String), Long)) {
            case (best, cur) =>
              if (best == null) cur
              else {
                val cmp =
                  if (cur._2 != best._2) cur._2 > best._2
                  else if (cur._1._1 != best._1._1)
                    utf8Less(cur._1._1, best._1._1)
                  else utf8Less(cur._1._2, best._1._2)
                if (cmp) cur else best
              }
          }) map { case ((a, b), pc) => (a, b, pc) }
        }.collect()
      if (rows.isEmpty) {
        // No adjacent pairs left anywhere (every word fully merged
        // before BpeMerges rounds): training is COMPLETE, not broken —
        // return the merges learned so far (r21 ADVICE; Sennrich's
        // loop terminates the same way when the vocab exhausts).
        exhausted = true
      } else {
        require(rows.length == 1,
          s"bpe argmax expects the 1-partition vocab, got ${rows.length} rows")
        val (a, b, pc) = rows(0)
        // LAZY per-round checkpoint: lineage still truncates every
        // round (the checkpoint materializes inside the NEXT round's
        // argmax job), but the round runs ONE Spark job instead of two
        // — at 64 rounds the driver job round-trip, not data, was the
        // measured cost (6.7 s wall on 1.0 s of cpu with eager
        // checkpoints; ~halved lazy).
        words = words
          .withColumn("sym", regexp_replace(col("sym"),
            lit(java.util.regex.Pattern.quote(s"$sep$a$sep$sep$b$sep")),
            lit(java.util.regex.Matcher.quoteReplacement(s"$sep$a$b$sep"))))
          .localCheckpoint(false)
        merges += ((rank.toLong, a, b, pc))
        rank += 1
      }
    }
    merges.toSeq
  }

  /** BPE tokenizer APPLICATION + fertility report (q245) — the
    * evaluation that closes q244's training loop: apply the trained
    * merge table to the corpus and report, per language, what the
    * tokenizer actually buys — subwords per word and chars per
    * subword (q208's whitespace fertility re-measured under the
    * trained subword vocabulary; integer permilles, house style).
    *
    * The merge table is q244's [[BpeMerges]]-row artifact (bounded
    * driver data — the broadcastable model). APPLICATION since r17 is
    * the [[graft.functions.BpeKernel]] rank-monotone chain kernel —
    * one codegen projection over the Heaps-bounded (lang, word,
    * count) vocabulary whose per-word cost does NOT grow with the
    * merge count (the r16 "replace-chain can't reach production
    * merge counts" gap, closed). The DuckDB oracle still replays the
    * per-rank replace chain, so this gate IS the kernel≡chain
    * cross-engine identity at [[BpeMerges]] rules; [[bpeSeqFertility]]
    * (q254) extends the same identity to [[BpeSeqMerges]] = 1024.
    */
  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    // The trained artifact, not a retrain: q244's memoized merge
    // table (a session that never ran q244 trains once here — the
    // deployment contract, where apply ships the table and never
    // re-derives it per scoring run).
    val merges = bpeMemo.computeIfAbsent(s"$BpeMerges#$dir", _ =>
      bpeTrainUncached(spark, dir))
    val table = graft.functions.BpeRankTable.fromMerges(merges)
    Corpus.read(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        length(col("w")).cast("long").as("chars"),
        graft.functions.BpeFunctions.bpe_subword_count(col("w"), table)
          .as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_word_types"),
        sum(col("cnt")).as("n_word_occurrences"),
        sum(col("chars") * col("cnt")).as("sum_chars"),
        sum(col("n_tok") * col("cnt")).as("sum_subwords"))
      .withColumn("subwords_per_word_permille",
        expr("sum_subwords * 1000 div n_word_occurrences"))
      .withColumn("chars_per_subword_permille",
        expr("sum_chars * 1000 div sum_subwords"))
      .orderBy(col("lang"))
  }

  /** The trained merge table as the deployable artifact (the qS04
    * weight-table / qS06 centroid-model class): [[BpeMerges]] rows,
    * memoized per corpus dir — what the ingest path ships to every
    * executor. A session that never ran q244 trains once here.
    */
  def bpeMergesFor(spark: SparkSession,
      dir: String): Seq[(Long, String, String, Long)] =
    bpeMemo.computeIfAbsent(s"$BpeMerges#$dir", _ =>
      bpeTrainUncached(spark, dir))

  /** Per-DOCUMENT subword counts under a trained merge table — the
    * stateless projection [[graft.streaming.DocumentStreams]] deploys
    * at ingest (qS07): since r17 ONE codegen pass of the
    * [[graft.functions.BpeKernel]] per document (split on the
    * tokens() whitespace class, chain-apply each word, sum) — no
    * join, no aggregate, no state, and per-row cost independent of
    * the merge count (the replace-chain projection this replaces
    * carried one regexp_replace per RULE in the plan — unusable at
    * production merge counts). The qS07 oracle still replays the
    * per-rank replace chain in DuckDB, gating kernel ≡ chain per
    * document; batch q245 shares the same per-word kernel, so stream
    * and batch cannot drift.
    */
  def bpeTokenCounts(docs: DataFrame,
      merges: Seq[(Long, String, String, Long)]): DataFrame = {
    val table = graft.functions.BpeRankTable.fromMerges(merges)
    docs
      .withColumn("n_words", tokenCount(col("text")).cast("long"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("lang"), col("n_words"),
        graft.functions.BpeFunctions
          .bpe_doc_subword_count(col("text"), table).as("n_subwords"))
  }

  /** Vocabulary cap for the r17 LOCAL trainer's collected dictionary
    * — top word types by (count desc, word); the industrial
    * frequency-capped-dictionary shape (a 100 TB corpus' raw type
    * count is unbounded; BPE trainers cap or sample the dictionary —
    * Sennrich's subword-nmt and HF tokenizers both train from a
    * bounded word-count table). Far above every gate corpus' type
    * count, so the q253 parity gate trains on the complete
    * vocabulary.
    */
  val BpeVocabCap = 1 << 18

  private val bpeFastMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, IndexedSeq[(Long, String, String, Long)]]()

  /** BPE training, production shape (q253): ONE distributed pass
    * collapses the corpus to the frequency-capped (word, count)
    * dictionary; [[graft.functions.BpeKernel.trainLocal]] runs every
    * merge round driver-locally over that bounded table with an
    * incremental pair index. Selection semantics are IDENTICAL to
    * q244's per-round Spark loop (overlapping pair counts, the same
    * (count, pair-bytes) argmax, chain merges) — and the q253 oracle
    * is q244's independently-derived DuckDB training replay, so the
    * local trainer is cross-engine-gated rule for rule. This removes
    * the per-round driver job floor that capped q244 at 64 rounds:
    * local rounds cost microseconds, so production merge counts
    * (≥1024, see [[bpeSeqFertility]]) are one distributed pass plus
    * local work — the industrial dictionary-BPE split.
    */
  def bpeTrainFast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeFastMergesFor(spark, dir)
      .toDF("rank", "lhs", "rhs", "pair_count")
      .orderBy(col("rank"))
  }

  def bpeFastMergesFor(spark: SparkSession,
      dir: String): IndexedSeq[(Long, String, String, Long)] =
    bpeFastMemo.computeIfAbsent(s"$BpeMerges#$dir", _ => {
      val vocab = Corpus.read(spark, dir, "documents")
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("w")).limit(BpeVocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.functions.BpeKernel.trainLocal(vocab, BpeMerges)
    })

  /** Merge count of the SEQUENCE-level tokenizer (q254) — production
    * scale, the r16 verdict's ≥1024 bar. Word-level BPE on this
    * corpus saturates below 128 rules (31 word types, 107 total
    * in-word adjacencies — the corpus alphabet is the binding
    * constraint, not the trainer), so the 1024-rule tokenizer trains
    * on whole-document SEQUENCES (SentencePiece-style
    * split_by_whitespace=false: space is a symbol, merges may cross
    * word boundaries — ~150k adjacency capacity here).
    */
  val BpeSeqMerges = 1024

  /** Distinct-sequence dictionary cap for [[bpeSeqMergesFor]] — the
    * same industrial bound as [[BpeVocabCap]]: production
    * sequence-level trainers sample/cap the unit dictionary. Every
    * gate corpus has ≤ ~5k distinct documents.
    */
  val BpeSeqUnitCap = 1 << 16

  /** Per-unit length cap (code points) for the sequence dictionary —
    * the r17 verdict's #3: [[BpeSeqUnitCap]] bounds unit COUNT but a
    * production document is 100 KB+, so without a length bound the
    * collected dictionary is multi-GB of driver heap. Truncating each
    * unit to its first 2^10 code points BEFORE the distinct-collapse
    * bounds the driver artifact at Cap × MaxChars × 4 B ≤ 256 MiB
    * worst-case UTF-8 (~64 MiB ASCII) at ANY document size —
    * SentencePiece's max_sentence_length / subword-nmt's line-based
    * dictionary play the same role. Spark `substring` and DuckDB
    * `substring` are both code-point-based, so the cap is mirrorable
    * verbatim if an oracle ever re-derives the dictionary (today the
    * q254 oracle embeds the TRAINED table, so the cap flows through
    * it by construction). Every gate corpus' max document length is
    * 577 chars — far under the cap — so gate dictionaries, trained
    * tables, and oracle hashes are unchanged; BpeKernelSpec proves
    * the cap live on a synthetic oversized unit.
    */
  val BpeSeqMaxUnitChars = 1 << 10

  private val bpeSeqMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, IndexedSeq[(Long, String, String, Long)]]()

  /** The 1024-rule sequence-level merge table (memoized per corpus
    * dir): dictionary = distinct document texts with multiplicities
    * (one distributed collapse), training local. Also consumed by
    * the q254 ORACLE generator, which embeds this table as VALUES and
    * re-applies it in DuckDB via a 1024-iteration recursive replace
    * chain — the independent cross-engine leg at production merge
    * count (the table's own selection logic is gated at
    * [[BpeMerges]] by q253 against DuckDB's from-scratch training).
    */
  def bpeSeqMergesFor(spark: SparkSession,
      dir: String): IndexedSeq[(Long, String, String, Long)] =
    bpeSeqMemo.computeIfAbsent(dir, _ => {
      val units = Corpus.read(spark, dir, "documents")
        // Byte-bounding truncation BEFORE the collapse — see
        // [[BpeSeqMaxUnitChars]]. A no-op on every gate corpus.
        .select(substring(col("text"), 1, BpeSeqMaxUnitChars).as("text"))
        .groupBy(col("text")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("text")).limit(BpeSeqUnitCap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      graft.functions.BpeKernel.trainLocal(units, BpeSeqMerges)
    })

  /** Fertility under the PRODUCTION-scale tokenizer (q254): chain-
    * apply the [[BpeSeqMerges]] = 1024-rule sequence-level table to
    * every document and report per-lang compression. The kernel's
    * per-document cost is independent of the merge count (q245 at 64
    * rules and this at 1024 run the same per-row loop — the "apply
    * cost flat in merge count" bar), and the application happens
    * AFTER the (lang, text) collapse, so the heavy projection runs on
    * post-shuffle partitions, never serialized on the single-file
    * scan. At 100 TB: one collapse + one bounded broadcast-model
    * projection — no per-rule plan growth, no driver loop.
    */
  def bpeSeqFertility(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.functions.BpeRankTable
      .fromMerges(bpeSeqMergesFor(spark, dir))
    Corpus.read(spark, dir, "documents")
      .groupBy(col("lang"), col("text")).agg(count(lit(1)).as("cnt"))
      .select(col("lang"), col("cnt"),
        length(col("text")).cast("long").as("chars"),
        graft.functions.BpeFunctions
          .bpe_subword_count(col("text"), table).as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_text_types"),
        sum(col("cnt")).as("n_docs"),
        sum(col("chars") * col("cnt")).as("sum_chars"),
        sum(col("n_tok") * col("cnt")).as("sum_subwords"))
      .withColumn("chars_per_subword_permille",
        expr("sum_chars * 1000 div sum_subwords"))
      .orderBy(col("lang"))
  }

  /** Synthesized URL per document — deterministic arithmetic over
    * doc_id, shared verbatim (same SQL text) with the q216 oracle so
    * both engines canonicalize the SAME raw strings. Mixed-case
    * schemes/hosts, default and non-default ports, trailing-slash
    * parity, utm_ tracking params and fragments keep every
    * canonicalization rule load-bearing.
    */
  val UrlSynthesisSql: String =
    """concat(
      |  CASE CAST(doc_id % 3 AS INT)
      |    WHEN 0 THEN 'HTTPS://Example.COM:443'
      |    WHEN 1 THEN 'http://Test.ORG:8080'
      |    ELSE 'https://Sub.Domain.NET' END,
      |  '/Path', CAST(doc_id % 7 AS STRING),
      |  CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
      |  '?utm_source=feed&id=', CAST(doc_id % 13 AS STRING),
      |  CASE WHEN doc_id % 4 = 0 THEN '&utm_campaign=x' ELSE '' END,
      |  '#sec', CAST(doc_id % 5 AS STRING))""".stripMargin

  /** URL canonicalization + dedup census (q216) — the normalization a
    * crawl pipeline runs before URL-level dedup (the same page
    * arrives as `HTTPS://Example.COM:443/a/?utm_source=x#frag` and
    * `https://example.com/a`): lowercase scheme and host, strip the
    * scheme's default port (keep explicit non-defaults), strip one
    * trailing slash, drop `utm_*` tracking params (preserving the
    * order of survivors), drop the fragment. The census groups by
    * canonical form — the dedup value is visible as n_docs > 1
    * wherever variants collapsed.
    *
    * The engine canonicalizes through `parse_url` (Java's URI
    * machinery); the oracle re-derives every part with pure regex —
    * independent decodings of the URL grammar, the q46 pattern. Per
    * -row projection + one hash aggregate; output bounded by the
    * synthesis's modular structure, not the corpus.
    */
  def urlCanon(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), expr(UrlSynthesisSql).as("url"))
      .withColumn("scheme", lower(expr("parse_url(url, 'PROTOCOL')")))
      .withColumn("host0", expr("parse_url(url, 'HOST')"))
      .withColumn("host", lower(col("host0")))
      .withColumn("port", expr(
        "regexp_extract(parse_url(url, 'AUTHORITY'), ':([0-9]+)$', 1)"))
      .withColumn("keep_port",
        !(col("scheme") === "https" && col("port") === "443") &&
        !(col("scheme") === "http" && col("port") === "80") &&
        col("port") =!= "")
      .withColumn("path",
        expr("regexp_replace(parse_url(url, 'PATH'), '/$', '')"))
      .withColumn("q", expr(
        "array_join(filter(split(parse_url(url, 'QUERY'), '&'), " +
          "p -> NOT startswith(p, 'utm_')), '&')"))
      .withColumn("canonical", concat(
        col("scheme"), lit("://"), col("host"),
        when(col("keep_port"), concat(lit(":"), col("port")))
          .otherwise(lit("")),
        col("path"),
        when(col("q") =!= "", concat(lit("?"), col("q")))
          .otherwise(lit(""))))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("canonical"))

  /** Length-bucketed batching report (q225) — the inference-serving
    * counterpart to q202's training-shard waste: naive batching pads
    * every sequence in a batch to the batch MAX, so one long doc
    * taxes 31 short ones; bucketing by padded length (here: round up
    * to a multiple of 64) groups like-sized docs so padding is
    * bounded by the bucket granularity. Both costs are computed
    * exactly — naive = Σ_batch (batch_max × n − Σ tok) over
    * doc_id-ordered batches of 32, bucketed = Σ_doc (bucket − tok) —
    * and the saving reported in permille. All integer arithmetic;
    * the naive batch assignment is the deterministic doc_id order.
    *
    * The global doc_id-order rank is assigned WITHOUT a corpus-wide
    * window (the r11 verdict's q225 anti-pattern: an unpartitioned
    * row_number sorts the whole corpus in ONE task): one
    * repartitionByRange(doc_id) shuffle + in-partition sort — the
    * q200 epoch-shuffle layout — then zipWithIndex, whose global
    * index is exact because range partitions are ordered and rows
    * are sorted within each (cost: one lightweight count job over
    * the partitions for the offsets — the classic two-pass
    * distributed row_number). No doc_id density assumption, so it
    * holds for any user corpus, not just the dense synthetic ids.
    */
  def bucketedBatching(spark: SparkSession, dir: String,
      batchSize: Int = 32, granule: Long = 64): DataFrame = {
    val d = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok"))
    val batched = Relational.globalRowNumber(d, "rn", col("doc_id"))
      .withColumn("batch", expr(s"(rn - 1) div $batchSize"))
    val naive = batched
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("bn"), max(col("n_tok")).as("bmax"),
        sum(col("n_tok")).as("bsum"))
      .agg(sum(col("bn") * col("bmax") - col("bsum")).as("naive_waste"))
    val bucketed = d
      .withColumn("bucket", expr(s"((n_tok + $granule - 1) div $granule) " +
        s"* $granule"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"),
        sum(col("bucket") - col("n_tok")).as("bucketed_waste"),
        countDistinct(col("bucket")).as("n_buckets"))
    bucketed.crossJoin(broadcast(naive))
      // Zero-guard (the q226 recall_permille idiom): on a degenerate
      // uniform corpus naive_waste = 0, where Spark's div yields NULL
      // but DuckDB's // errors — guard BOTH sides identically.
      .withColumn("saving_permille", expr(
        "CASE WHEN naive_waste > 0 THEN " +
          "greatest(naive_waste - bucketed_waste, 0L) * 1000 " +
          "div naive_waste END"))
      .select(col("n_docs"), col("total_tokens"), col("n_buckets"),
        col("naive_waste"), col("bucketed_waste"), col("saving_permille"))
  }

  /** Token-mass-weighted median length (q227) — the per-language
    * document length below which HALF THE TOKENS live: the statistic
    * that actually answers "what sequence length covers half my
    * training mass" (the unweighted median answers about documents,
    * and short docs dominate counts while long docs dominate mass).
    * Semantics (unchanged since r14, oracle-pinned): sort per
    * language by (n_chars, doc_id), running token sum, keep the
    * first row whose 2·cumulative ≥ total — all exact integers, so
    * the pick is deterministic under any tie.
    *
    * r18 shape — the q54 two-phase histogram, replacing the
    * lang-partitioned CORPUS-WIDE running window the r17 verdict
    * graded weak (at 100 TB the dominant language's whole corpus
    * sorted through one partition):
    *   1. one scan hash-aggregates `(lang, n_chars) → (Σ n_tok,
    *      count)` — map-side combinable; output is bounded by
    *      langs × distinct document lengths, NEVER corpus-sized;
    *   2. the running-sum window that finds the crossing LENGTH runs
    *      over that bounded histogram; the first group whose
    *      through-group cumulative crosses is the median length, and
    *      its exclusive prefix (`cum_before`) is carried along;
    *   3. the crossing DOC resolves inside only the docs at exactly
    *      the median length (broadcast semi-join on ≤ one row per
    *      language): a (lang, n_chars)-partitioned window whose
    *      input is the tie-set at the crossing length — the one
    *      per-doc sequential step the statistic irreducibly needs,
    *      now bounded by the tie count instead of the corpus.
    * Identity with the old form: cumulative token mass is monotone
    * non-decreasing in (n_chars, doc_id) order, so the first crossing
    * group is the group OF the first crossing row, and within it the
    * min satisfying doc_id is that row's doc_id.
    */
  def weightedMedianLength(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Corpus.read(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        tokenCount(col("text")).cast("long").as("n_tok"))
    val hist = d.groupBy(col("lang"), col("n_chars"))
      .agg(sum(col("n_tok")).as("g_tok"), count(lit(1)).as("g_docs"))
    val wRun = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("lang"))
    val crossing = hist
      .withColumn("cum_thru", sum(col("g_tok")).over(wRun))
      .withColumn("total_tok", sum(col("g_tok")).over(wAll))
      .withColumn("n_docs", sum(col("g_docs")).over(wAll))
      .filter(col("cum_thru") * 2 >= col("total_tok"))
      .groupBy(col("lang"))
      .agg(min(struct(col("n_chars"), (col("cum_thru") - col("g_tok"))
          .as("cum_before"), col("total_tok"), col("n_docs"))).as("p"))
      .select(col("lang").as("c_lang"), col("p.n_chars").as("median_chars"),
        col("p.cum_before"), col("p.total_tok"), col("p.n_docs"))
    val wDoc = Window.partitionBy(col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    d.join(broadcast(crossing),
        col("lang") === col("c_lang") &&
          col("n_chars") === col("median_chars"))
      .withColumn("cum", col("cum_before") + sum(col("n_tok")).over(wDoc))
      .filter(col("cum") * 2 >= col("total_tok"))
      .groupBy(col("lang"))
      .agg(min(col("doc_id")).as("median_doc"),
        min(col("n_chars")).as("weighted_median_chars"),
        min(col("total_tok")).as("total_tok"), min(col("n_docs")).as("n_docs"))
      .select(col("lang"), col("n_docs"), col("total_tok"),
        col("weighted_median_chars"), col("median_doc"))
      .orderBy(col("lang"))
  }

  /** Vocabulary construction: the k most frequent whitespace tokens
    * per language, with counts — the frequency pass a tokenizer fit
    * runs over the corpus. The token explode feeds a map-side-
    * combinable hash aggregate (the canonical distributed word count:
    * per-token rows exist only between scan and partial aggregate
    * inside each task — unlike the dedup family, the per-token
    * aggregate IS the product here, so the explode is irreducible);
    * the per-language rank then plans as a bounded TopKRows heap via
    * the injected rank-limit rewrite — k rows per (lang, partition)
    * into the exchange, no sort of the full vocabulary.
    */
  def vocabTopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("tok"))
    Corpus.read(spark, dir, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy(col("lang"), col("rk"))
  }

  /** Per-source distribution drift (q167) — KL(source ‖ corpus) over
    * the global top-V token distribution: the mixture-monitoring
    * operator a corpus pipeline runs per ingest source to catch a
    * crawler gone off-distribution (language shift, boilerplate
    * floods, template spam) BEFORE it trains. Add-one smoothing
    * keeps absent tokens finite; each source also reports its
    * biggest-contributor token — the "what changed" a drift alert
    * needs.
    *
    * Cross-engine determinism, r17 form: the per-token KL terms are
    * EXACT INTEGERS. KL·(tot_s+V) = Σ (c+1)·ln((c+1)(tot_g+V) /
    * ((cg+1)(tot_s+V))) — every log argument is a positive rational
    * of integer products, so each term is (c+1)·lnScaled(num, den, 9)
    * via [[graft.functions.FixedLog]] (the same integer ln in both
    * engines BY CONSTRUCTION), the sum is an order-free integer sum
    * (no sorted fold needed), and ONE float division of identical
    * integers precedes the single round. This replaces the r16 shape
    * (sorted-order double fold + assumed JVM-vs-DuckDB `ln`
    * bit-parity), which the 10×-scale audit caught flipping a
    * 6-decimal .5 boundary at sf0.1 — the exact ulp-flake class the
    * DSIR gates eliminated, eliminated here the same way.
    * Fixed-point error ≤ ~5e-9 in kl units — three orders below the
    * 1e-6 rounding grid. Integer bound: (c+1)·(tot_g+V) must stay in
    * BIGINT — fine to ~3e9×3e9 occurrence scales; past that the
    * BigInt `lnScaled` overload is the documented path.
    *
    * Scale: the vocabulary is a global top-V `TakeOrderedAndProject`
    * heap (constant size, the q84 broadcast idiom); occurrences
    * filter to vocab INSIDE the per-row lambda before the explode,
    * so only top-V hits ever become rows; everything after is
    * aggregates over ≤ sources×V rows. V is the resolution dial —
    * production uses 10³–10⁴, still broadcastable.
    */
  def sourceDrift(spark: SparkSession, dir: String, v: Int = 32): DataFrame = {
    val docs = Corpus.read(spark, dir, "documents")
      .select(col("source"), tokens(col("text")).as("toks"))
    val vocab = docs.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(v)
      .collect().map(_.getString(0)).toSeq
    val vlit = array(vocab.map(lit): _*)
    val occ = docs
      .select(col("source"),
        explode(filter(col("toks"), t => array_contains(vlit, t))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val srcTot = occ.groupBy(col("source")).agg(sum(col("c")).as("tot_s"))
    val glob = occ.groupBy(col("tok")).agg(sum(col("c")).as("cg"))
    val globTot = glob.agg(sum(col("cg")).as("tot_g"))
    val grid = srcTot.crossJoin(broadcast(glob))
      .crossJoin(broadcast(globTot))
      .join(occ, Seq("source", "tok"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("term_i", (col("c") + 1L) *
        graft.functions.FixedLog.ln_scaled(
          (col("c") + 1L) * (col("tot_g") + v),
          (col("cg") + 1L) * (col("tot_s") + v), 9))
    grid.groupBy(col("source"))
      .agg(max(col("tot_s")).as("n_occ"),
        round(sum(col("term_i")) / ((max(col("tot_s")) + v) * lit(1e9)), 6)
          .as("kl"),
        max_by(col("tok"), struct(col("term_i"), col("tok"))).as("top_tok"),
        round(max(col("term_i")) / ((max(col("tot_s")) + v) * lit(1e9)), 6)
          .as("top_term"))
      .orderBy(col("source"))
  }

  /** Sketch-twin heavy hitters (q142) — Spark 4's `approx_top_k`
    * frequency sketch against the exact corpus-wide token counts, the
    * q20/q96 exact-twin pattern applied to top-k items: with
    * maxItemsTracked (1024) far above the corpus's distinct-token
    * count the sketch tracks every item exactly, so the gate pins
    * `in_band` (estimate == exact) to literal 1 and hash-compares the
    * estimates themselves; the oracle recomputes the exact counts
    * from first principles. The corpus's top-5 counts are strictly
    * distinct at both gate SFs, so the ranking is tie-free.
    *
    * Scale: BOTH sides are one explode into a map-side partial
    * aggregate — the explode never materializes or shuffles (the q55
    * objection is to shuffling tokens, not scanning them); the sketch
    * side shuffles ONE mergeable sketch per partition regardless of
    * corpus size (the point of the operator — heavy hitters at 100 TB
    * without a distinct-key aggregate), the exact side one row per
    * distinct token. At a real corpus's vocabulary the exact twin is
    * the one that stops scaling and the sketch's maxItemsTracked
    * bounds state; here the twin is what makes the sketch oracleable.
    */
  def approxTopTokens(spark: SparkSession, dir: String, k: Int = 5)
      : DataFrame = {
    val toks = Corpus.read(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("tk"))
    val sketch = toks
      .agg(expr("approx_top_k(tk, 5, 1024)").as("top"))
      .select(posexplode(col("top")).as(Seq("i", "s")))
      .select((col("i") + 1).cast("long").as("rk"),
        col("s.item").as("token"), col("s.count").as("est_cnt"))
    val exact = toks.groupBy(col("tk").as("token"))
      .agg(count(lit(1)).as("exact_cnt"))
    sketch.join(exact, Seq("token"))
      .withColumn("in_band",
        (col("est_cnt") === col("exact_cnt")).cast("long"))
      .select(col("rk"), col("token"), col("est_cnt"), col("exact_cnt"),
        col("in_band"))
      .orderBy(col("rk"))
  }

  /** Deterministic train/val/test split by content-independent hash:
    * bucket = first two hex digits of md5(doc_id) (0..255), train
    * below 204 (~80%), val below 230 (~10%), test above — the
    * reproducible split assignment a training pipeline needs (any
    * worker recomputes the same split for any doc; no RNG state, no
    * shuffle — the split column is a per-row projection). Aggregated
    * per split for the gate.
    */
  /** The split assignment expression — shared by [[hashSplit]] and
    * [[trainingPipeline]] so the bucket formula and the 204/230
    * train/val/test cut-offs (and their oracle mirrors) can never
    * drift apart.
    */
  def splitCol(docId: Column): Column = {
    val bucket = conv(substring(md5(docId.cast("string")), 1, 2), 16, 10)
      .cast("long")
    when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
  }

  def hashSplit(spark: SparkSession, dir: String): DataFrame = {
    Corpus.read(spark, dir, "documents")
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("sum_tokens"))
      .orderBy(col("split"))
  }

  /** Gopher-style repetition signal: the occurrence count of each
    * document's most frequent word 2-gram and its share of all
    * 2-grams — repetitive boilerplate scores high and gets filtered.
    * The max count comes from the one-pass
    * [[graft.functions.TopGramCount]] kernel in the scan projection
    * (the gram explode + double aggregate stays in the oracle only).
    * Docs with fewer than 2 tokens have no 2-grams and are absent.
    */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        (tokenCount(col("text")) - 1).cast("long").as("n_grams"),
        graft.functions.MinHashFunctions
          .top_gram_count(tokens(col("text")), 2).as("max_rep"))
      .filter(col("max_rep").isNotNull)
      .withColumn("rep_ratio",
        round(col("max_rep").cast("double") / col("n_grams"), 6))
      .orderBy(col("doc_id"))

  /** Quality-filter CASCADE with per-rule attrition accounting
    * (q141) — the survival-funnel report every production corpus
    * pipeline publishes (C4 and Gopher both document per-rule drop
    * counts): an ORDERED rule chain where each rule sees only the
    * previous rules' survivors, reported as one row per rule with
    * n_in / n_dropped / n_out / drop_rate. Rules: length floor and
    * ceiling, supported-language allowlist, token-count floor, and
    * the Gopher-style top-unigram repetition cap (share from the
    * one-pass [[graft.functions.TopGramCount]] kernel; the oracle
    * re-derives it from an unnest + double aggregate).
    *
    * Shape: ONE scan computes every rule's boolean; ONE map-side-
    * combinable aggregate folds the cumulative-survival products
    * (sum(b1), sum(b1·b2), …); the 5-row funnel is a constant-size
    * `stack` over that single aggregate row. No shuffle of document
    * data at any width — the cascade costs the same scan the
    * cheapest single filter would.
    */
  def filterCascade(spark: SparkSession, dir: String): DataFrame =
    cascadeFunnel(cascadeCountsOf(Corpus.read(spark, dir, "documents")))

  /** The per-document rule booleans — a stateless projection, so the
    * same column set runs over an unbounded ingest stream
    * ([[graft.streaming.DocumentStreams.cascadeAttrition]]).
    */
  def cascadeFlagsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("top1", graft.functions.MinHashFunctions
        .top_gram_count(col("toks"), 1))
      .select(
        (col("n_chars") >= 100).cast("long").as("b1"),
        (col("n_chars") <= 500).cast("long").as("b2"),
        (col("lang") =!= "zh").cast("long").as("b3"),
        (col("n_tok") >= 40).cast("long").as("b4"),
        coalesce((col("top1").cast("double") / col("n_tok")) <= 0.15,
          lit(false)).cast("long").as("b5"))

  /** The one-row cumulative-survival aggregate (s0 = corpus size,
    * sk = survivors of rules 1..k) — a global map-side-combinable
    * aggregate, legal in batch AND as a streaming running aggregate
    * (complete/update mode: the funnel-so-far over everything
    * ingested).
    */
  def cascadeCountsOf(docs: DataFrame): DataFrame =
    cascadeFlagsOf(docs).agg(
      count(lit(1)).as("s0"),
      sum(col("b1")).as("s1"),
      sum(col("b1") * col("b2")).as("s2"),
      sum(col("b1") * col("b2") * col("b3")).as("s3"),
      sum(col("b1") * col("b2") * col("b3") * col("b4")).as("s4"),
      sum(col("b1") * col("b2") * col("b3") * col("b4") * col("b5"))
        .as("s5"))

  /** Reshape the one-row counts into the 5-row funnel report. */
  def cascadeFunnel(counts: DataFrame): DataFrame =
    counts
      .select(expr("""stack(5,
        |  1L, 'len_min_100', s0, s1,
        |  2L, 'len_max_500', s1, s2,
        |  3L, 'lang_supported', s2, s3,
        |  4L, 'tokens_min_40', s3, s4,
        |  5L, 'repetition_max_15pct', s4, s5)
        |  AS (stage, rule, n_in, n_out)""".stripMargin))
      .withColumn("n_dropped", col("n_in") - col("n_out"))
      .withColumn("drop_rate", round(
        col("n_dropped").cast("double") / greatest(col("n_in"), lit(1L)), 6))
      .select(col("stage"), col("rule"), col("n_in"), col("n_dropped"),
        col("n_out"), col("drop_rate"))
      .orderBy(col("stage"))

  /** The whole training-data preparation pipeline as ONE declarative
    * plan — the end-to-end story every individual operator serves:
    * quality-score and filter, drop exact duplicates (keep lowest
    * doc_id per fingerprint), drop non-representative members of
    * near-dup clusters (a member is dropped whether or not its
    * representative survived the quality filter — cluster membership
    * is a property of the corpus, not of the filtered view), assign
    * each survivor a deterministic hash split, and pack per
    * (split, storage shard) into token-budget bins. Output: per-split
    * document/token/bin totals. Every stage reuses the operator
    * tested on its own; composition adds no new shuffle beyond the
    * stages' own.
    */
  def trainingPipeline(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame =
    pipelineOf(spark, dir, budget, shardSize, mixture = false)

  /** [[trainingPipeline]] with the per-language MIXTURE-SAMPLING
    * stage ([[Curation.keepCol]]) composed in between near-dup
    * representative keep and split assignment — the complete
    * curation story (quality → exact dedup → near-dup rep keep →
    * mixture rebalance → split → pack) as one declarative plan. The
    * mixture stage is a pure per-row predicate, so composing it adds
    * zero shuffle to q52's plan.
    */
  def curatedPipeline(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame =
    pipelineOf(spark, dir, budget, shardSize, mixture = true)

  private def pipelineOf(spark: SparkSession, dir: String,
      budget: Long, shardSize: Long, mixture: Boolean): DataFrame = {
    // NOT checkpointed (r21, measured both directions): projecting
    // (doc_id, lang, fp, n_tok) narrow and localCheckpoint'ing it
    // before the exact-dedup semi-join — the cappedBands move — made
    // q52 3.84→4.76 s and q58 3.76→4.06 s on a clean host: the eager
    // materialization is a serial barrier at construction, while the
    // un-checkpointed double evaluation overlaps with the
    // dedupClusters stages inside one job. The q185 shape (many more
    // consumers) measured neutral-positive and IS checkpointed.
    val scored = docQuality(spark, dir)
      .filter(col("quality") > 0.4)
      .withColumn("fp", fingerprintCol(col("text")))
      .withColumn("n_tok", tokenCount(col("text")).cast("long"))
    val deduped = keepFirstByFingerprint(scored)
    val reps = Dedup.dedupClusters(spark, dir)
    val kept0 = deduped.join(reps, Seq("doc_id"), "left")
      .filter(col("cluster_rep").isNull || col("cluster_rep") === col("doc_id"))
    val kept =
      if (mixture) kept0.filter(Curation.keepCol(col("doc_id"), col("lang")))
      else kept0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    kept
      .withColumn("split", splitCol(col("doc_id")))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
      .withColumn("run", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(run - n_tok) div $budget"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        countDistinct(col("shard") * 10000 + col("bin")).as("n_bins"))
      .orderBy(col("split"))
  }

  /** RE2-compatible patterns shared with the oracle (Spark's Java
    * regex and DuckDB's RE2 agree on these constructs).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumberPattern = "[0-9]{6,}"

  /** PII-style redaction: count and mask email addresses and long
    * digit runs, fingerprint the redacted text — the scrubbing pass a
    * training-data pipeline runs before dedup/packing. Per-row
    * codegen'd regex; embarrassingly parallel.
    */
  def redact(spark: SparkSession, dir: String): DataFrame = {
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        matchCount(EmailPattern).as("n_emails"),
        matchCount(LongNumberPattern).as("n_longnums"),
        md5(regexp_replace(
          regexp_replace(col("text"), EmailPattern, "<EMAIL>"),
          LongNumberPattern, "<NUM>")).as("redacted_fp"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: md5 over whitespace-normalized text —
    * the exact-dedup key. md5 is bit-identical across engines.
    */
  def fingerprintCol(c: Column): Column =
    md5(lower(trim(regexp_replace(c, "\\s+", " "))))

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), fingerprintCol(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** 32-bit SimHash from md5 hex digits: bit p (1..32) is the sign of
    * the majority vote over token occurrences of the top bit of hex
    * digit p of md5(token). Integer-only — portable to the oracle.
    *
    * Computed per document inside the scan projection by the
    * codegen'd [[graft.functions.SimHash32]] kernel — no token
    * explode, no 32-vote aggregate exchange (the declarative twin is
    * what the DuckDB oracle still runs, and MinHashSpec pins bit
    * equality). Docs with no tokens are absent, as in the explode
    * formulation.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.MinHashFunctions.simhash32(tokens(col("text")))
          .as("simhash"))
      .filter(col("simhash").isNotNull)
      .orderBy(col("doc_id"))

  /** SimHash near-dup JOIN (q161) — the blocking step that turns
    * q25's fingerprints into a dedup operator, completing the
    * SimHash family the way q27/q28 complete MinHash: pairs within
    * Hamming distance ≤ `maxHam` found by the standard band
    * pigeonhole (4 × 8-bit bands of the 32-bit hash; distance ≤ 3
    * leaves at least one band untouched, so banding misses nothing
    * under the threshold), then exact `bit_count(xor)` verification
    * on candidates only — never all-pairs.
    *
    * This is Google's crawl-dedup construction (Manku et al. 2007,
    * "Detecting near-duplicates for web crawling") at Manku's own
    * width: the 64-bit [[graft.functions.SimHash64]] kernel with
    * 16-bit bands. Width is the scale dial, and it is NOT optional —
    * the 32-bit q25 fingerprint's 8-bit bands saturate by the
    * birthday bound (only 256 values per band): measured exponent
    * 1.79 / 413 s at 10×·sf0.1 vs near-linear at 64 bits, where a
    * band takes 65536 values and buckets stay sparse past millions
    * of docs. Unlike MinHash (which estimates shingle-set Jaccard),
    * SimHash distance bounds the token-frequency-vector angle —
    * robust to small edits, which is exactly what the fixture's
    * edit-variant near-dups exercise (q161's ≤ 3 matches are all
    * q27 ground-truth pairs).
    *
    * Scale: fingerprint in the scan projection (codegen kernel, no
    * explode); the 4× band explode shuffles 4 narrow rows per doc;
    * the band self-join is an equi-join on (k, band); dedup +
    * verify are candidate-volume-bounded.
    */
  def simhashNearDup(spark: SparkSession, dir: String,
      maxHam: Int = 3): DataFrame = {
    // Cached: both sides of the band self-join consume it, and the
    // fingerprint kernel over the corpus is the dominant cost — two
    // narrow longs per doc is the cheapest relation in the plan
    // (the q27 cand-cache discipline).
    val fps = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.MinHashFunctions.simhash64(tokens(col("text")))
          .as("fp"))
      .filter(col("fp").isNotNull)
      .cache()
    val banded = fps
      .select(col("doc_id"), col("fp"),
        explode(expr("array(0, 1, 2, 3)")).as("k"))
      .withColumn("band", expr("shiftright(fp, 16 * k) & 65535"))
    val a = banded.select(col("k"), col("band"),
      col("doc_id").as("doc_a"), col("fp").as("fa"))
    val b = banded.select(col("k"), col("band"),
      col("doc_id").as("doc_b"), col("fp").as("fb"))
    a.join(b, Seq("k", "band")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fa"), col("fb"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("bit_count(fa ^ fb)").cast("long"))
      .filter(col("hamming") <= maxHam)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Higher-order array-function battery over the token arrays —
    * the collection surface (lambda filter/transform/aggregate,
    * sort/distinct) that complements q15's scalar battery; all
    * codegen'd built-ins, per-row, no explode. The vocabulary
    * fingerprint hashes the sorted-distinct token list, so the gate
    * pins element order semantics (binary ascending in both engines
    * on this ASCII corpus), not just counts.
    */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(filter(col("toks"), x => length(x) > 4)).cast("long").as("n_long"),
        aggregate(col("toks"), lit(0L),
          (acc, x) => acc + length(x).cast("long")).as("sum_len"),
        array_max(transform(col("toks"), x => length(x)))
          .cast("long").as("max_len"),
        md5(array_join(array_sort(array_distinct(col("toks"))), " "))
          .as("vocab_fp"))
      .orderBy(col("doc_id"))

  /** Context-window size (tokens) for [[chunkDocs]] — shared with the
    * oracle by name.
    */
  val ChunkSize = 8

  /** Chunk stride for [[chunkDocs]]: stride < window, so consecutive
    * chunks overlap by ChunkSize - ChunkStride tokens and no boundary
    * context is lost. Shared with the oracle by name.
    */
  val ChunkStride = 6

  /** Fixed-token context-window chunking with overlap — the standard
    * LLM-training preprocessing step (documents longer than the model
    * context are split into windows; stride < window keeps boundary
    * context in two chunks). The splitting itself is the
    * [[graft.functions.ChunkTokens]] Generator — a genuine Catalyst
    * table function emitting chunk rows straight from the token array,
    * never materializing a per-document chunk collection — so the only
    * row blow-up is the output itself. Chunks are reported as md5
    * fingerprints (the gate checks exact text reconstruction without
    * shipping megabytes through the compare).
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.ChunkTokens.chunkTokens(
          tokens(col("text")), ChunkSize, ChunkStride))
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_toks"),
        md5(col("chunk_text")).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Top terms per document for [[tfidfTopTerms]] — shared with the
    * oracle by name.
    */
  val TfidfTopK = 3

  /** TF-IDF top terms per document — the classic keyword/topic signal
    * (search indexing, near-dup domain features, topic balancing).
    * score = tf x ln(N / df), ranked per doc (score desc, term asc).
    *
    * Shapes, in scale order:
    *  - TF is computed PER ROW with higher-order functions (distinct
    *    tokens x in-doc count) and exploded once — the (doc, term)
    *    rows appear exactly once each, so no corpus-token-sized
    *    explode and no (doc, term) aggregation shuffle at all;
    *  - DF is a map-side-combinable count over those rows: the only
    *    exchange on the fit path carries partially-counted rows, so
    *    its volume is vocabulary-sized per task, not corpus-sized;
    *  - the scoring join builds on the DF table (vocabulary-sized —
    *    AQE broadcasts it; ChunkSpec pins that the tf branch reaches
    *    the join with NO exchange of its own, so the corpus-derived
    *    rows are never shuffled at all. If the vocabulary ever
    *    outgrows broadcast, the same plan degrades to one shuffle of
    *    the unique (doc, term) rows — the floor for a global-DF
    *    computation);
    *  - the per-doc top-k plans as a bounded TopKRows heap via the
    *    injected rank-limit rewrite — no corpus-wide Window sort.
    * N (corpus size) is a 1-row broadcast.
    */
  /** q130's query terms — mixed document frequencies on the fixture
    * vocabulary ("dup" is ~35× rarer than the others), so idf
    * genuinely reorders raw term counts. Shared with the oracle by
    * name.
    */
  val SearchTerms: Seq[String] = Seq("hash", "scan", "dup")

  /** Ranked retrieval (q130): tf-idf top-k document search for a
    * fixed term query — the retrieval primitive a training-data
    * pipeline runs for eval-set contamination mining, quality probes
    * and near-dup triage. score(d) = Σ_t tf(t,d)·ln(N/df(t)) over
    * the QUERY terms only: per-doc state is |query| integer
    * counters computed in one projection over the token array (no
    * explode, no per-term shuffle), the df/N normalizer is a
    * single-row aggregate broadcast back, and the top-k is a global
    * `TakeOrderedAndProject` (per-partition heaps, k rows to the
    * driver — never a full sort). Two corpus scans total (df pass +
    * score pass); the indexed alternative at interactive latency is
    * the q99 inverted index. FP discipline (r18, the q167/FixedLog
    * conversion): the score IS AN EXACT INTEGER — Σ tf·lnScaled(N,
    * df, 9) via [[graft.functions.FixedLog]] — so ranking, selection,
    * and the rounded emitted score all derive from the same integers
    * in both engines; no libm call remains anywhere in the gate.
    */
  def rankedSearch(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val Seq(t1, t2, t3) = SearchTerms
    def tf(t: String) =
      size(filter(tokens(col("text")), x => x === lit(t))).cast("long")
    val counted = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tf(t1).as("tf_a"), tf(t2).as("tf_b"),
        tf(t3).as("tf_c"))
    val norms = counted.agg(
      sum((col("tf_a") > 0).cast("long")).as("df_a"),
      sum((col("tf_b") > 0).cast("long")).as("df_b"),
      sum((col("tf_c") > 0).cast("long")).as("df_c"),
      count(lit(1)).as("n_docs"))
    def idfScaled(dfc: Column) =
      graft.functions.FixedLog.ln_scaled(col("n_docs"), dfc, 9)
    counted.crossJoin(broadcast(norms))
      .filter(col("tf_a") + col("tf_b") + col("tf_c") > 0)
      .withColumn("raw_i",
        col("tf_a") * idfScaled(col("df_a"))
          + col("tf_b") * idfScaled(col("df_b"))
          + col("tf_c") * idfScaled(col("df_c")))
      .orderBy(col("raw_i").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("tf_a"), col("tf_b"), col("tf_c"),
        round(col("raw_i") / lit(1e9), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  /** BM25 ranked retrieval (q171): the scoring function production
    * search/retrieval actually runs (Lucene/Elasticsearch default;
    * Robertson et al.'s Okapi BM25) — q130's tf-idf with saturating
    * term frequency and document-length normalization:
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    *   idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))
    *
    * with k1 = 1.2, b = 0.75 (the Lucene defaults, spelled as the
    * SAME decimal literals on both engines so they parse to the same
    * doubles). Length normalization is the part tf-idf lacks: a term
    * packed into a short doc outranks the same count diluted in a
    * long one, and tf saturates at ~(k1+1)·idf instead of growing
    * linearly — so the ranking genuinely reorders q130 on this
    * corpus's mixed document lengths.
    *
    * Plan shape = q130's (the scale argument carries over verbatim):
    * per-doc query-term counters + dl in ONE scan projection (no
    * explode), a single-row df/N/Σdl normalizer broadcast back, score
    * as ONE fixed-order a+b+c expression (bit-identical for
    * equal-profile docs — an unordered SUM of per-term rows would
    * not be), global top-k via `TakeOrderedAndProject`. Two corpus
    * scans total.
    *
    * FP discipline (r18, the verdict-#8 conversion): the idf
    * simplifies to an INTEGER RATIONAL — 1 + (N−df+0.5)/(df+0.5) =
    * (2N+2)/(2df+1) — so the ln takes
    * [[graft.functions.FixedLog.ln_scaled]] (the same integer in
    * both engines by construction) and NO libm call remains in the
    * gate. The tf/length-normalization factor stays float BY DESIGN:
    * it is pure IEEE +,−,×,÷ over identical integers and identical
    * decimal literals (k1 = 1.2, b = 0.75), which both engines
    * evaluate bit-identically — only transcendentals ever differed.
    */
  def bm25Search(spark: SparkSession, dir: String,
      k: Int = 10): DataFrame = {
    val Seq(t1, t2, t3) = SearchTerms
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
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    def idf(dfc: Column) =
      graft.functions.FixedLog.ln_scaled(col("n_docs") * 2 + lit(2L),
        dfc * 2 + lit(1L), 9).cast("double") / lit(1e9)
    // norm shared across terms: k1·(1−b + b·dl/avgdl), avgdl = Σdl/N.
    def part(tfc: Column, dfc: Column) =
      idf(dfc) * (tfc.cast("double") * lit(2.2)) /
        (tfc.cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) * (col("dl").cast("double") /
            col("avgdl"))))
    counted.crossJoin(broadcast(norms))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .filter(col("tf_a") + col("tf_b") + col("tf_c") > 0)
      .withColumn("raw",
        part(col("tf_a"), col("df_a"))
          + part(col("tf_b"), col("df_b"))
          + part(col("tf_c"), col("df_c")))
      .orderBy(col("raw").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("tf_a"), col("tf_b"), col("tf_c"),
        col("dl"), round(col("raw"), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }

  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // Materialized ONCE (r21; via [[Dedup.materializeOnce]] since r22
    // — see its scaladoc for the persist-vs-checkpoint numbers): the
    // per-doc tf transform (the
    // query's dominant kernel, O(distinct terms × tokens) per doc on
    // the 1-task scan) otherwise re-evaluates under BOTH the df
    // aggregate and the scoring join's probe side. The (doc_id, term,
    // tf) forward table is the retrieval-stack artifact q99 stores
    // anyway. Measured 2.9→1.7 s same-session in r21; the spread
    // alternative was measured wall-neutral and declined.
    val tf = Dedup.materializeOnce(docs
      .select(col("doc_id"), explode(expr(
        """transform(array_distinct(toks),
          |  t -> struct(t AS term,
          |              CAST(size(filter(toks, x -> x = t)) AS BIGINT) AS tf))"""
          .stripMargin)).as("e"))
      .select(col("doc_id"), col("e.term").as("term"), col("e.tf").as("tf")))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Corpus.read(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    // score as an exact integer (tf × lnScaled(N, df, 9)): ranking
    // and the rounded output both derive from the same integer in
    // both engines — no JVM-log-vs-DuckDB-ln ulp in the gate (the
    // q167 discipline; values shift < 1e-9·tf from the float form).
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_i").desc, col("term"))
    // NOT spread (r21, the VERDICT-#4 measured verdict): spreading
    // the (doc_id, term, tf) rows before this join measured
    // wall-neutral (2.75 → 2.88 s same-session) with task cpu ~2×
    // (2.4 → 4.9 s) — unlike q67, the dominant kernel here is the
    // per-doc tf transform UPSTREAM on the scan, which a post-explode
    // spread cannot parallelize, and shipping the exploded rows only
    // adds exchange work. The serialized-kernel candidate q73 from
    // VERDICT #4 is hereby measured and declined (see SCALING.md r21).
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score_i", col("tf") *
        graft.functions.FixedLog.ln_scaled(col("n_docs"), col("df"), 9))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TfidfTopK)
      .select(col("doc_id"), col("rk").cast("long").as("rk"), col("term"),
        col("tf"), col("df"),
        round(col("score_i") / lit(1e9), 6).as("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Effective dataset size report (q185) — the dataset-card number
    * every corpus release publishes (and the honest denominator for
    * epoch math): per language, documents and TOKENS surviving each
    * dedup stage — raw → exact-fingerprint dedup (q26's keep-min-id)
    * → near-dup canonical selection (q43's clusters, q135's
    * keep-longest policy applied to the exact survivors, re-ranked by
    * n_toks among them) — with the total token saving as exact
    * integer ppm. "10 T tokens crawled" vs "6.1 T effective" is this
    * report; compositions stay one declarative plan (fingerprint
    * aggregate + the CC relation + two semi/anti joins + three
    * map-side-combinable per-lang aggregates).
    */
  def effectiveSize(spark: SparkSession, dir: String): DataFrame = {
    // Materialized ONCE (r21, the cappedBands move): this narrow
    // (doc_id, lang, n_toks, fp) relation feeds the raw tally, BOTH
    // sides of the exact-dedup semi-join, and through `exact` the
    // cluster join and two more tallies — without the checkpoints
    // the tokenCount+md5 kernel re-evaluates up to ~6× serialized on
    // the 1-task scan (measured 3.56→3.45 s same-session on top of
    // the cappedBands win — marginal wall, but the kernel now runs
    // once and task cpu stops scaling with the consumer count).
    // Materialized via [[Dedup.materializeOnce]] (r22) — see its
    // scaladoc for the measured trade-off on these corpus-shaped
    // relations (this query was the persist experiment's worst case:
    // cpu 2.7→15.7 s). The docs/exact materialization and the
    // dedupClusters sub-pipeline are INDEPENDENT until the keep join,
    // so their construction-time jobs run concurrently (guide §2.6).
    val docsExactF = scala.concurrent.Future {
      val docs = Dedup.materializeOnce(Corpus.read(spark, dir, "documents")
        .select(col("doc_id"), col("lang"),
          tokenCount(col("text")).cast("long").as("n_toks"),
          fingerprintCol(col("text")).as("fp")))
      (docs, Dedup.materializeOnce(keepFirstByFingerprint(docs)))
    }(scala.concurrent.ExecutionContext.global)
    val cl = Dedup.dedupClusters(spark, dir)
    val (docs, exact) = scala.concurrent.Await.result(docsExactF,
      scala.concurrent.duration.Duration.Inf)
    val w = Window.partitionBy(col("cluster_rep"))
      .orderBy(col("n_toks").desc, col("doc_id"))
    val keep = cl.join(exact, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"))
    val nd = exact.join(cl, Seq("doc_id"), "left_anti")
      .unionByName(exact.join(keep, Seq("doc_id"), "left_semi"))
    def tally(df: DataFrame, docsName: String, toksName: String) =
      df.groupBy(col("lang")).agg(count(lit(1)).as(docsName),
        sum(col("n_toks")).as(toksName))
    tally(docs, "docs_raw", "toks_raw")
      .join(tally(exact, "docs_exact", "toks_exact"), Seq("lang"))
      .join(tally(nd, "docs_effective", "toks_effective"), Seq("lang"))
      .withColumn("saved_ppm",
        expr("(toks_raw - toks_effective) * 1000000 div toks_raw"))
      .orderBy(col("lang"))
  }

  /** Vocabulary size for the q187 OOV report — shared with the
    * oracle by name.
    */
  val OovVocabV = 10

  /** Vocabulary coverage / OOV report (q187) — the tokenizer-fit
    * diagnostic run before committing a vocab (and the
    * mixture-monitoring cousin of q167): against the corpus's own
    * top-[[OovVocabV]] global vocabulary (the fixture has 31 distinct tokens, so a third of the types are OOV) (q55's construction — a
    * `TakeOrderedAndProject` heap, broadcast back), report per
    * language the total token mass, the OOV mass as exact integer
    * ppm, the distinct OOV type count, and the highest-frequency OOV
    * term (the next vocab candidate; deterministic (count desc, term
    * asc) argmax via the rank-limit heap). Shapes: per-doc (term, tf)
    * rows appear once each (q73 discipline, no corpus-token
    * aggregation), the per-(lang, term) aggregate is
    * map-side-combinable, the vocab anti-join is broadcast.
    */
  def oovReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.read(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
    val terms = docs.select(col("lang"), explode(expr(
      """transform(array_distinct(toks),
        |  t -> struct(t AS term,
        |    CAST(size(filter(toks, x -> x = t)) AS BIGINT) AS tf))"""
        .stripMargin)).as("e"))
      .select(col("lang"), col("e.term").as("term"), col("e.tf").as("tf"))
    // Materialized ONCE (r21): this vocab-BOUNDED aggregate (langs ×
    // distinct terms — never corpus-sized) otherwise re-evaluates its
    // whole upstream (scan + per-doc tf transform + explode + shuffle)
    // under the vocab heap AND both oov consumers — 3 serialized
    // kernel passes for one bounded table.
    val langTerm = terms.groupBy(col("lang"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .localCheckpoint(true)
    val vocab = langTerm.groupBy(col("term"))
      .agg(sum(col("cnt")).as("gcnt"))
      .orderBy(col("gcnt").desc, col("term")).limit(OovVocabV)
      .select(col("term"))
    val oov = langTerm.join(broadcast(vocab), Seq("term"), "left_anti")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("term"))
    val top = oov.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lang"), col("term").as("top_oov"),
        col("cnt").as("top_oov_cnt"))
    val tot = docs.groupBy(col("lang"))
      .agg(sum(size(col("toks")).cast("long")).as("toks_total"))
    val oa = oov.groupBy(col("lang"))
      .agg(count(lit(1)).as("oov_types"), sum(col("cnt")).as("oov_mass"))
    tot.join(oa, Seq("lang")).join(top, Seq("lang"))
      .withColumn("oov_ppm", expr("oov_mass * 1000000 div toks_total"))
      .select(col("lang"), col("toks_total"), col("oov_types"),
        col("oov_mass"), col("oov_ppm"), col("top_oov"),
        col("top_oov_cnt"))
      .orderBy(col("lang"))
  }

  /** Tokens per "line" for [[lineDedup]]: the corpus text carries no
    * newlines, so lines are consecutive fixed-width token segments —
    * the splitter is the only corpus-specific piece; a newline corpus
    * swaps it for split(text, '\n') and the pipeline is unchanged.
    */
  val LineTokens = 3

  /** A line present in more than this many distinct documents is
    * boilerplate (CCNet/RefinedWeb-style removal threshold). Shared
    * with the oracle by name.
    */
  val BoilerplateDocThreshold = 2

  /** Line-level (paragraph-granularity) dedup: fingerprint every line
    * of every document, count distinct documents per line across the
    * corpus, and strip lines shared by more than
    * [[BoilerplateDocThreshold]] documents — the standard boilerplate
    * (header/footer/nav) removal pass between exact-dedup and
    * near-dup. Output per document: line counts and the md5 of the
    * kept text, so the gate hashes the actual reconstruction, not
    * just the counts.
    *
    * Scale shape: the line-document table is grouped on the 32-char
    * md5 fingerprint, not the line text, so shuffle rows stay narrow;
    * the distinct-doc count plans as Spark's two-level distinct
    * aggregate (partial on (fp, doc_id) inside each task — map-side
    * combinable, no raw line stream crosses the wire); the
    * boilerplate set joins back by fingerprint (bounded by the
    * threshold to lines that repeat, typically tiny — AQE broadcasts
    * it at any realistic size); and the per-document reassembly
    * shuffles each line once on doc_id, which a 100 TB corpus pays
    * for any per-doc reconstruction.
    */
  def lineDedup(spark: SparkSession, dir: String): DataFrame = {
    val lines = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, (size(toks) + $LineTokens - 1) div $LineTokens),
           |  i -> struct(i AS pos,
           |    concat_ws(' ', slice(toks, (i - 1) * $LineTokens + 1, $LineTokens)) AS line))"""
          .stripMargin)).as("pl"))
      .select(col("doc_id"), col("pl.pos").as("pos"), col("pl.line").as("line"),
        md5(col("pl.line")).as("fp"))
    // Materialized ONCE (r22, the cappedBands pattern): the
    // tokenize→line-explode→md5 kernel feeds the boilerplate
    // aggregate AND the join probe — it used to run twice,
    // serialized on the 1-task scan.
    val linesM = Dedup.materializeOnce(lines)
    val boiler = linesM
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") > BoilerplateDocThreshold)
      .select(col("fp"), lit(1).as("is_boiler"))
    linesM.join(boiler, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        md5(array_join(transform(
          sort_array(collect_list(
            when(col("is_boiler").isNull, struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n")).as("kept_fp"))
      .orderBy(col("doc_id"))
  }

  /** Bigram table size cap for [[bigramLogProb]] — the top-V
    * frequency prune that keeps the model broadcastable at any corpus
    * size (bigrams outside the table score as unseen). Shared with
    * the oracle by name; 512 < the gate corpus's ~900 distinct
    * bigrams, so the pruned/unseen path is exercised.
    */
  val BigramVocab = 512

  /** N-gram LM quality scoring (perplexity filtering): fit a
    * Laplace-smoothed bigram model on the corpus itself, then score
    * every document by its mean bigram log-probability — low scorers
    * are gibberish/boilerplate, the classic CCNet-style quality
    * signal. Two passes, both visible in the plan:
    *
    *  1. FIT — token explode into two hash aggregates (unigram and
    *     bigram counts, both map-side combinable word counts); the
    *     bigram table is pruned to the [[BigramVocab]] most frequent
    *     (TakeOrderedAndProject — a bounded heap per partition, no
    *     full sort), making its size a constant independent of corpus
    *     scale.
    *  2. SCORE — per-document bigrams left-join the pruned table and
    *     inner-join unigram counts, both explicitly broadcast
    *     (bounded: top-V and the vocabulary), so the scoring pass is
    *     one scan with map-side lookups — no shuffle except the final
    *     per-doc aggregate.
    *
    * logp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1) + |V|)): exact-integer
    * numerator and denominator — and since r17 the ln itself is the
    * exact integer lnScaled(num, den, 9) through the shared FixedLog
    * kernel, so the per-doc MEAN is an integer sum over one float
    * division (the q167 discipline). This also removes an
    * association-order hazard the float form carried: avg() over
    * per-bigram doubles folds in engine-chosen order.
    *
    * The tokenize+explode lineage is DELIBERATELY evaluated twice —
    * once under the fit aggregates, once under the score scan. The
    * alternative (persisting `bigrams` across the phases) is a
    * micro-win at gate SF but the wrong shape at target scale: the
    * exploded bigram intermediate is corpus-size x tokens-per-doc,
    * and pinning it to executor storage to save a second columnar
    * scan trades cheap sequential parquet reads for cluster-wide
    * cache pressure. Fit+score as two independent scans is the
    * standard two-pass LM shape.
    */
  def bigramLogProb(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val uni = docs
      .select(explode(col("toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = uni.agg(count(lit(1)).as("vsz"))
    val bigrams = docs
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> struct(element_at(toks, i) AS w1,
          |              element_at(toks, i + 1) AS w2))""".stripMargin)).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bigramTable = bigrams
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(BigramVocab)
    // Score pass over SPREAD bigram rows (r21): (doc_id, w1, w2) is
    // narrow, and the per-bigram work downstream (two broadcast-hash
    // probes + integer ln_scaled) is the query's dominant kernel —
    // unlike shipping text (the q190b/q193 loss), shipping the
    // exploded bigrams parallelizes the kernel for one cheap exchange.
    graft.sources.Corpus.spread(bigrams)
      .join(broadcast(bigramTable), Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("logp_i", graft.functions.FixedLog.ln_scaled(
        coalesce(col("c2"), lit(0L)) + lit(1L),
        col("c1") + col("vsz"), 9))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("logp_i")) / (count(lit(1)) * lit(1e9)), 6)
          .as("logprob"))
      .orderBy(col("doc_id"))
  }

  /** Intra-document repetition removal at token granularity — the
    * within-doc companion to [[lineDedup]]'s cross-doc boilerplate
    * pass (Gopher's repetition signals, q49, MEASURE repetition;
    * this one REMOVES it): each document keeps the FIRST occurrence
    * of every token, in original order. First-occurrence order is the
    * load-bearing semantics — `array_distinct` guarantees it in
    * Spark, while DuckDB's `list_distinct` does NOT, so the oracle
    * must re-derive order independently via min-ordinality grouping:
    * two genuinely different formulations, one hashed reconstruction.
    * Everything is one codegen'd scan projection per row (the
    * higher-order dedup never leaves the row); zero shuffles before
    * the output sort.
    */
  def tokenDedup(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        round(lit(1.0) - size(array_distinct(col("toks")))
          .cast("double") / size(col("toks")), 6).as("rep_ratio"),
        md5(array_join(array_distinct(col("toks")), " ")).as("dedup_fp"))
      .orderBy(col("doc_id"))

  /** Zipf / token-frequency-distribution histogram — the corpus
    * balance audit every tokenizer-training and curation run does
    * (how heavy is the head, how long is the tail). Terms bucket by
    * floor(log2(occurrences)), computed EXACTLY as
    * `length(bin(cnt)) - 1` (binary-string length, integer-only —
    * `log(2, x)` is ln-ratio floating point in Spark and rounds
    * wrong at exact powers of two; DuckDB mirrors with
    * printf('%b')). Two map-side-combinable hash aggregates:
    * corpus-sized word count, then vocabulary-sized bucketing —
    * output is ~log2(max count) rows.
    */
  def zipfHistogram(spark: SparkSession, dir: String): DataFrame =
    Corpus.read(spark, dir, "documents")
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), (length(bin(col("cnt"))) - 1).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("bucket"))

  /** Co-occurrence vocabulary cap and minimum pair support — named so
    * the oracle SQL pins the same constants.
    */
  val CooccurVocab = 16
  val CooccurMinSupport = 5

  /** Term co-occurrence lift over the top-[[CooccurVocab]] vocabulary:
    * for term pairs (a < b) appearing in ≥ [[CooccurMinSupport]]
    * common documents, `lift = P(a,b) / (P(a)·P(b))` — the
    * association score under every PMI/collocation analysis (PMI is
    * its log). Emitted as the EXACT integer
    * `(c_ab · N · 10⁶) div (c_a · c_b)` (parts-per-million) — no
    * float log to disagree on. The numerator is widened to
    * DECIMAL(38,0) (the oracle uses HUGEINT — an independent 128-bit
    * encoding) because in Long it overflows once N exceeds ~3·10⁶
    * (c_ab scales with N for top-vocab terms, so N²·10⁶ is the real
    * bound); the QUOTIENT is Long-safe at any corpus size the wide
    * type holds: c_a,c_b ≥ c_ab ≥ minSupport ⇒ lift_ppm ≤ N·10⁶ /
    * minSupport.
    *
    * Scale is governed by the vocabulary cap, not the corpus: per-doc
    * distinct terms filter against the broadcast top-V table BEFORE
    * the pair self-join, so a document contributes ≤ V²/2 pairs no
    * matter how long it is, and the pair aggregate has ≤ V²/2 groups
    * total. The top-V table itself is a map-side-combinable doc-
    * frequency count + a TakeOrdered heap (constant size at any
    * corpus scale); N arrives as a broadcast one-row cross join, not
    * a driver-side collect.
    */
  /** The top-[[CooccurVocab]] vocabulary and its supported distinct
    * co-occurring term pairs — shared by [[cooccurLift]] (q84) and
    * [[textRank]] (q188).
    */
  private[graft] def cooccurPairs(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val docTerms = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(tokens(col("text"))))
        .as("term"))
    val vocab = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("dfreq"))
      .orderBy(col("dfreq").desc, col("term"))
      .limit(CooccurVocab)
    val f = docTerms.join(broadcast(vocab.select(col("term"))), "term")
    val pairs = f.as("a")
      .join(f.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CooccurMinSupport)
    (vocab, pairs)
  }

  /** TextRank keyword centrality (q188) — Mihalcea & Tarau 2004's
    * published keyword-extraction method in its WEIGHTED form:
    * PageRank over the term co-occurrence graph (q84's
    * vocabulary-bounded pair relation as undirected edges, the
    * co-occurrence counts as edge weights), so a term that co-occurs
    * STRONGLY with well-connected terms outranks a merely frequent
    * one — the graph-aware upgrade to raw-count vocabularies (q55).
    * On this corpus the vocab clique is degree-uniform, so the
    * weights carry the entire signal (all 16 centralities distinct —
    * unweighted PR would be uniform).
    * The iteration core is [[Dedup.integerPageRank]]: ALL-integer
    * power iteration (mass in PrScale units, per-neighbor integer
    * division, exact order-free inflow sums, damping · 85 div 100),
    * so the oracle unrolls the same three rounds and hash-matches
    * exactly — no float PageRank summation-order ambiguity exists.
    */
  def textRank(spark: SparkSession, dir: String): DataFrame = {
    val (_, pairs) = cooccurPairs(spark, dir)
    Dedup.integerPageRank(pairs.select(col("term_a").as("a"),
      col("term_b").as("b"), col("c_ab").as("w")))
      .select(col("node").as("term"), col("deg"), col("pr"))
      .orderBy(col("pr").desc, col("term"))
  }

  def cooccurLift(spark: SparkSession, dir: String): DataFrame = {
    val (vocab, pairs) = cooccurPairs(spark, dir)
    val n = Corpus.read(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    pairs
      .join(broadcast(vocab.select(col("term").as("term_a"),
        col("dfreq").as("c_a"))), "term_a")
      .join(broadcast(vocab.select(col("term").as("term_b"),
        col("dfreq").as("c_b"))), "term_b")
      .crossJoin(broadcast(n))
      .select(col("term_a"), col("term_b"), col("c_ab"), col("c_a"),
        col("c_b"),
        expr("cast(c_ab as decimal(38,0)) * n_docs * 1000000 div (c_a * c_b)")
          .as("lift_ppm"))
      .orderBy(col("term_a"), col("term_b"))
  }

  /** Value-based token-count deciles — curriculum/length bucketing
    * stated the way it scales: `ntile(10)` needs ONE global sort (a
    * single task owns the whole corpus order), so the boundaries are
    * computed instead as the constant-size interpolated quantile
    * vector (Spark `percentile` == DuckDB `quantile_cont`, the q41
    * parity; exact doubles — integer inputs interpolate at .5
    * fractions), broadcast via a one-row cross join, and each doc's
    * bucket is `|{b : n_toks > b}|` — a per-row lambda against the
    * 9-element array. Value-based means ties share a bucket (pandas
    * qcut semantics), which is what makes the bucket a pure function
    * of n_toks and therefore gateable; position-split ties (ntile's
    * contract) are inherently engine-order-dependent AND unscalable.
    * Everything after the scan is one map-side-combinable aggregate
    * to ≤ 10 rows.
    */
  def tokenDeciles(spark: SparkSession, dir: String): DataFrame = {
    val base = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_toks"))
    val bounds = base.agg(expr(
      "percentile(n_toks, array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))")
      .as("bounds"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        size(expr("filter(bounds, b -> cast(n_toks as double) > b)"))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("n_toks")).as("min_toks"),
        max(col("n_toks")).as("max_toks"), sum(col("n_toks")).as("sum_toks"))
      .orderBy(col("bucket"))
  }

  /** Posting-list cap for [[invertedIndex]] — named so the oracle
    * slices to the same bound.
    */
  val PostingCap = 16

  /** Inverted-index construction — the search/retrieval building
    * block next to dedup in a training-data stack: per term, the
    * document frequency (full count) and the FIRST [[PostingCap]]
    * doc ids as the stored posting prefix. The cap is what makes the
    * build scale-shaped: `collect_list` over a hot term's full
    * posting set holds df rows of state, while the rank-limit
    * `row_number() ≤ cap` on (term → doc_id order) plans as the
    * injected bounded TopKRows heap (k rows per term per map
    * partition into the exchange), so the collect that follows only
    * ever sees ≤ cap rows per term. df rides a separate map-side-
    * combinable count — the full posting mass is never materialized
    * per group anywhere.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val docTerms = Corpus.read(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
    val dfreq = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("dfreq"))
    val prefix = docTerms
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("doc_id"))))
      .filter(col("rn") <= PostingCap)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_posting"),
        array_join(sort_array(collect_list(col("doc_id"))), ",")
          .as("posting_csv"))
    dfreq.join(prefix, "term")
      .select(col("term"), col("dfreq"), col("n_posting"),
        col("posting_csv"))
      .orderBy(col("term"))
  }

  /** Stopword list for [[stopwordFilter]] — pinned by name so the
    * oracle SQL and the spec test the same set.
    */
  val StopWords: Seq[String] = Seq("a", "the")

  /** Stopword removal — the standard curation pass before dedup and
    * indexing: drop [[StopWords]] from each document's token stream
    * (order preserved), report exact token bookkeeping and the md5
    * fingerprint of the filtered stream (so the gate checks WHICH
    * tokens survived and in what order, not just how many). The
    * stop ratio is exact integer ppm.
    *
    * One codegen'd scan projection — the higher-order `filter` runs
    * per row against a literal array, no explode, no join, no
    * shuffle (the orderBy is presentation). At any corpus size this
    * is a single pass.
    */
  def stopwordFilter(spark: SparkSession, dir: String): DataFrame = {
    // Column-API lambda, not an interpolated SQL string: a stopword
    // containing a quote (or any SQL metacharacter) must stay data,
    // never syntax.
    val stopArr = typedLit(StopWords)
    Corpus.read(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .withColumn("content",
        filter(col("toks"), t => !array_contains(stopArr, t)))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(col("content")).cast("long").as("n_content"),
        expr("(size(toks) - size(content)) * 1000000L div size(toks)")
          .as("stop_ppm"),
        md5(array_join(col("content"), " ")).as("content_fp"))
      .orderBy(col("doc_id"))
  }

  /** q156's query phrases — corpus-frequent bigrams so matches exist
    * at every SF; named because the oracle interpolates the same
    * tokens.
    */
  val PhraseA = ("table", "value")
  val PhraseB = ("fast", "sort")

  /** Token-phrase search (q156) — ORDERED-adjacency match ("term A
    * immediately followed by term B"), the `tsquery A <-> B`
    * followed-by / phrase-search primitive that tf-idf retrieval
    * (q130, bag-of-words) cannot express: position matters. Engine
    * encoding: one per-row pass — zip each token with its successor
    * (`zip_with` over the array and itself shifted by one) and count
    * pair hits with a higher-order aggregate; no explode, no
    * (doc, position) blow-up, no shuffle before the final order.
    * Also emits the position of the FIRST occurrence (1-based, 0 if
    * absent — the standard's `position()` analogue) via
    * array_position on the boolean hit mask. The oracle re-derives
    * adjacency from FIRST PRINCIPLES: explicit 1-based list
    * subscripts l[i], l[i+1] over an unnested index range (the q143
    * idiom) — independent encodings of "adjacent". Docs with no hit
    * on either phrase are filtered so the output is match-sized.
    */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    def hits(a: String, b: String) =
      expr("zip_with(toks, slice(concat(toks, array('')), 2, " +
        s"size(toks)), (x, y) -> CASE WHEN x = '$a' AND y = '$b' " +
        "THEN 1L ELSE 0L END)")
    Corpus.read(spark, dir, "documents")
      .withColumn("toks", tokens(col("text")))
      .withColumn("ha", hits(PhraseA._1, PhraseA._2))
      .withColumn("hb", hits(PhraseB._1, PhraseB._2))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("aggregate(ha, 0L, (acc, v) -> acc + v)").as("n_a"),
        expr("aggregate(hb, 0L, (acc, v) -> acc + v)").as("n_b"),
        coalesce(array_position(col("ha"), 1L), lit(0L)).as("first_a"))
      .filter(col("n_a") + col("n_b") > 0)
      .orderBy(col("doc_id"))
  }

  /** Spread a pathologically under-partitioned input before a
    * CPU-heavy per-row kernel. The driver corpus ships single-file
    * tables — a 1-task scan, which SERIALIZES md5-heavy projections
    * (measured: q240's fit+score at 10.7 s wall ≈ 9.8 s cpu on the
    * single-file sf0.1 documents vs 1.40 s on the same rows in 32
    * part-files). Guarded on the physical input file count, not a
    * blind repartition: real corpora are many-file and this is a
    * no-op — at target scale an unconditional repartition would
    * shuffle the full corpus for nothing.
    */
  private def spread(df: DataFrame): DataFrame = Corpus.spread(df)

  /** DSIR hashed-bigram buckets for one document's token array:
    * each adjacent token pair is hashed (md5 hex prefix, the q47
    * portable-hash idiom) into one of `buckets` feature buckets —
    * the paper's hashed n-gram feature map. Computed by the
    * [[graft.functions.MinHashKernel.dsirBuckets]] native kernel
    * (one tight loop per document, reused digest), BIT-IDENTICAL to
    * the declarative `transform(..., (t, i) ->
    * cast(conv(substring(md5(concat(t, ' ', toks[i+1])), 1, 3), 16,
    * 10) as int) % B)` the oracle replays — the MinHashSignature
    * kernel-vs-declarative split applied to DSIR.
    */
  private def dsirBuckets(buckets: Int): Column =
    graft.functions.MinHashFunctions.dsir_buckets(col("toks"), buckets)

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how much its hashed-bigram feature profile looks
    * like a target domain (here `lang = targetLang`) relative to the
    * raw corpus. Per bucket b: lw(b) = ln p_target(b) − ln p_raw(b)
    * with add-half smoothing, computed on exact integer counts as
    * ln((2·cp+1)/(2·Np+B)) − ln((2·cq+1)/(2·Nq+B)) and FIXED to a
    * micro-unit BIGINT — so the per-document score is an INTEGER sum
    * (order-independent, exactly reproducible cross-engine; the only
    * floating step is the B bucket-level ln's, the q73/q171 parity
    * class). Per doc: w_micro = Σ lw_micro(bucket of each bigram).
    *
    * Scale: stage 1 explodes bigrams but map-side-combines into ≤ B
    * partial rows per partition (the q142 contract — the explode
    * never shuffles row-per-token); the collected weight table is
    * bounded by the CONSTANT B = 1024 (the adjudicated vocab-collect
    * class, TextAnalysis.scala:755) and returns to the plan as a
    * broadcast map literal; stage 2 is a single codegen scan — a
    * higher-order `aggregate` over the bucket array with a map
    * lookup, no second explode, no join, no extra shuffle. At 100 TB
    * both stages are embarrassingly parallel.
    */
  def dsirWeights(spark: SparkSession, dir: String,
      targetLang: String = "en", buckets: Int = 1024): DataFrame =
    dsirScore(spread(Corpus.read(spark, dir, "documents")),
      dsirWeightTable(spark, dir, targetLang, buckets), buckets)
      .orderBy(col("doc_id"))

  /** FIT stage of [[dsirWeights]] as a reusable artifact: the
    * micro-unit bucket→log-ratio table, bounded by the constant B
    * (the trained model a deployment broadcasts — e.g. the qS04
    * streaming scorer applies it at ingest).
    *
    * Cross-engine parity of the log step (r16 verdict "kill the ln
    * flake class"): the bucket log-ratio is computed by
    * [[graft.functions.FixedLog.lnScaled]] — EXACT integer arithmetic
    * on the rational (2cp+1)(2Nq+B) / (2Np+B)(2cq+1) — and the
    * oracles run [[graft.functions.FixedLog.sqlExpr]], the same
    * integer algorithm in DuckDB SQL. Both engines therefore produce
    * the SAME micro-unit BIGINT on every input: no float `log`
    * anywhere in the gated artifact, no ulp flake budget left (the
    * result is still ln to within ~4·10⁻⁹ + the .5-micro rounding).
    */
  def dsirWeightTable(spark: SparkSession, dir: String,
      targetLang: String = "en", buckets: Int = 1024): Map[Int, Long] = {
    val dist = spread(Corpus.read(spark, dir, "documents"))
      .select(col("lang"), tokens(col("text")).as("toks"))
      .withColumn("bks", dsirBuckets(buckets))
      .select(col("lang"), explode(col("bks")).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("cp"),
        count(lit(1)).as("cq"))
      .collect()
    val np = dist.map(_.getLong(1)).sum
    val nq = dist.map(_.getLong(2)).sum
    dist.map { r =>
      val cp = r.getLong(1); val cq = r.getLong(2)
      // ln(p/q) of the smoothed ratio as ONE rational — BigInt
      // products, so the arithmetic is overflow-free at any corpus
      // size (count products exceed 2^63 well below 100 TB).
      val num = (BigInt(2) * cp + 1) * (BigInt(2) * nq + buckets)
      val den = (BigInt(2) * np + buckets) * (BigInt(2) * cq + 1)
      r.getInt(0) -> graft.functions.FixedLog.lnScaled(num, den, 6)
    }.toMap
  }

  /** SCORE stage of [[dsirWeights]]: a STATELESS projection over any
    * documents relation — batch or streaming — with the trained
    * table as a broadcast map literal. One codegen pass, no join,
    * no explode, no state; a bucket produced by [[dsirBuckets]] can
    * be absent from a table trained on a DIFFERENT corpus slice
    * (e.g. scoring a live feed with an offline model), so the lookup
    * null-coalesces to 0 — unseen features carry no evidence.
    */
  def dsirScore(docs: DataFrame, lw: Map[Int, Long],
      buckets: Int = 1024): DataFrame = {
    val wm = typedLit(lw)
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("bks", dsirBuckets(buckets))
      .filter(size(col("bks")) > 0)
      .select(col("doc_id"),
        size(col("bks")).cast("long").as("n_grams"),
        aggregate(col("bks"), lit(0L), (acc, b) =>
          acc + coalesce(element_at(wm, b), lit(0L))).as("w_micro"))
  }

  /** DSIR importance RESAMPLING (the paper's selection step): draw
    * k documents WITHOUT replacement with probability ∝ exp(weight)
    * via the Gumbel top-k trick — key = weight + Gumbel noise,
    * take the k largest keys. The noise is SEEDED and portable:
    * u ∈ (0,1) from a 6-hex-digit md5 prefix of the doc id (the q47
    * idiom), g = −ln(−ln(u)) — deterministic in both engines, so the
    * "random" sample is hash-reproducible (the property a 100 TB
    * pipeline needs to re-derive the same training set twice).
    * Weight = w_micro/1e6 from [[dsirWeights]] (integer-exact).
    *
    * Scale: per-row key computation is codegen'd; the top-k plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the
    * driver) — no global sort, no full shuffle.
    */
  def dsirResample(spark: SparkSession, dir: String,
      k: Int = 100): DataFrame =
    dsirWeights(spark, dir)
      .withColumn("key_micro", gumbelKeyMicro)
      .select(col("doc_id"), col("w_micro"), col("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)

  /** The seeded Gumbel resampling key over an input carrying
    * (doc_id, w_micro) — shared by [[dsirResample]] and
    * [[dsirCuratedPipeline]] so the seed string, the 6-hex-digit
    * uniform, and the micro fixing can never drift between the
    * standalone operator and the composed pipeline (the splitCol
    * sharing discipline).
    *
    * The noise is integer-exact end to end (the q240 FixedLog
    * discipline): u = (2h+1)/2^25 from the 6-hex md5 prefix h, so
    * −ln(u) = lnScaled(2^25, 2h+1) fixed to PICO units (pico, not
    * micro, keeps relative precision when u → 1 and −ln u → 3·10⁻⁸),
    * then g_micro = −lnScaled(inner_pico, 10^12) — two integer log
    * evaluations both engines reproduce bit-identically. The key is
    * a deterministic seeded pseudo-Gumbel accurate to ~10⁻⁴ of true
    * −ln(−ln u) at the extreme u; distribution-indistinguishable for
    * resampling, and (the property the gate needs) the same BIGINT
    * in both engines.
    */
  private def gumbelKeyMicro: Column = {
    import graft.functions.FixedLog.ln_scaled
    val h = conv(substring(md5(
      concat(lit("dsir-seed-7:"), col("doc_id"))), 1, 6), 16, 10)
      .cast("long")
    val innerPico = ln_scaled(lit(33554432L), h * 2L + 1L, 12)
    val gMicro = -ln_scaled(innerPico, lit(1000000000000L), 6)
    (col("w_micro") + gMicro).cast("long")
  }

  /** Incremental document-frequency maintenance under CDC (q249) —
    * [[Relational.dedupIndexMaintenance]]'s IVM pattern applied to
    * the corpus STATISTICS a retrieval/scoring stack depends on: the
    * (term, df) table behind tf-idf (q73) and BM25 (q151) maintained
    * by SIGNED deltas instead of a full recompute per snapshot.
    * Aggregates admit negative deltas, so no group membership is
    * needed (unlike q248's min-election): df_B(t) = df_A(t)
    * + Σ_delta ±[t ∈ doc] — deletes subtract their distinct-term
    * sets, updates subtract the old text's and add the revision's,
    * inserts add. One delta-sized explode-aggregate merged into the
    * stored table by a full-outer join on the term; terms falling to
    * df = 0 leave the vocabulary (and '[rev2]' enters it — both
    * edges live in the fixture).
    *
    * The oracle is the FULL per-term distinct-doc recompute over
    * snapshot B, so hash-match is the IVM identity across engines.
    *
    * Scale: the delta legs explode ONLY delta documents; the stored
    * table is touched by one keyed merge join (bucketed-co-located
    * at warehouse scale, q74); nothing re-reads the base corpus.
    */
  def dfMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.read(spark, dir, "documents")
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    dfMaintainCore(docs, Relational.cdcDeltaOf(docs, maxId))
      .orderBy(col("token"))
  }

  /** The q249 signed-delta merge over an already-derived delta —
    * shared by the q249 gate and the q252 composed pass.
    */
  def dfMaintainCore(docs: DataFrame,
      delta: Relational.CdcDelta): DataFrame = {
    def terms(text: Column) = explode(array_distinct(tokens(text)))
    // Stored artifact from snapshot A.
    val dfA = docs.select(terms(col("text")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    // Signed delta terms, each leg delta-bounded.
    val deletes = delta.deletes
      .select(terms(col("text")).as("token"), lit(-1L).as("d"))
    val updOld = delta.revised
      .select(terms(col("old_text")).as("token"), lit(-1L).as("d"))
    val updNew = delta.revised
      .select(terms(col("new_text")).as("token"), lit(1L).as("d"))
    val inserts = delta.inserted
      .select(terms(col("text")).as("token"), lit(1L).as("d"))
    val signed = deletes.unionByName(updOld).unionByName(updNew)
      .unionByName(inserts)
      .groupBy(col("token")).agg(sum(col("d")).as("d"))
    dfA.join(signed, Seq("token"), "full_outer")
      .select(col("token"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d"), lit(0L)))
          .as("df"))
      .filter(col("df") > 0)
  }

  /** Top-k size of [[dsirCuratedPipeline]]'s resampling stage — a
    * CONSTANT (the training-set size the curation run is budgeted
    * for), sized under the gate corpus's post-filter survivor count
    * (~420 of 500 docs at sf0.01) so the resample genuinely selects
    * at every driver SF.
    */
  val DsirPipelineK = 256

  /** The complete DSIR-curated training pipeline (q247) — q58's
    * composition with the importance-RESAMPLING stage spliced in
    * where a real pretraining-data run puts it (Xie et al. 2023 §3:
    * select from the cleaned pool, then post-process): quality
    * filter → exact dedup → near-dup representative keep → DSIR
    * score → Gumbel top-k resample (k = [[DsirPipelineK]]) → mixture
    * rebalance → hash split → token-budget shard packing, as ONE
    * declarative plan. Output adds a `docid_sum` identity per split
    * so the gate pins exactly WHICH documents survived end-to-end,
    * not just how many.
    *
    * Composition cost vs q58 — the claim the plan audit
    * (Breadth15Spec) pins: the DSIR score is a stateless projection
    * (bucket kernel + broadcast-map-literal lookup; the fit is the
    * bounded B=1024 [[dsirWeightTable]] artifact, reused verbatim),
    * so it adds NO exchange; the top-k plans as TakeOrderedAndProject
    * (per-partition heaps, k rows out) — no global sort, no shuffle —
    * and every operator downstream of it runs on ≤ k = O(1) rows. At
    * 100 TB the fit and the scoring are both embarrassingly parallel
    * single passes, and the only data-sized exchanges remain q58's
    * own (the dedup aggregate and the near-dup join).
    */
  def dsirCuratedPipeline(spark: SparkSession, dir: String,
      budget: Long = 2048, shardSize: Long = 64): DataFrame = {
    // The DSIR weight fit (one spread corpus pass, collected to a
    // bounded map) and the dedupClusters sub-pipeline are independent
    // — run their construction-time jobs concurrently (guide §2.6;
    // same move as effectiveSize's docs/exact overlap).
    val lwF = scala.concurrent.Future(dsirWeightTable(spark, dir))(
      scala.concurrent.ExecutionContext.global)
    val reps = Dedup.dedupClusters(spark, dir)
    val wm = typedLit(scala.concurrent.Await.result(lwF,
      scala.concurrent.duration.Duration.Inf))
    val scored = docQuality(spark, dir)
      .filter(col("quality") > 0.4)
      .withColumn("fp", fingerprintCol(col("text")))
      .withColumn("n_tok", tokenCount(col("text")).cast("long"))
    val deduped = keepFirstByFingerprint(scored)
    val kept = deduped.join(reps, Seq("doc_id"), "left")
      .filter(col("cluster_rep").isNull || col("cluster_rep") === col("doc_id"))
    // DSIR score: per-row bucket kernel + broadcast map lookup. Docs
    // with no bigram carry no evidence and leave the pool (the q240
    // match-sized contract).
    val sel = kept
      .withColumn("toks", tokens(col("text")))
      .withColumn("bks", dsirBuckets(1024))
      .filter(size(col("bks")) > 0)
      .withColumn("w_micro", aggregate(col("bks"), lit(0L), (acc, b) =>
        acc + coalesce(element_at(wm, b), lit(0L))))
      .withColumn("key_micro", gumbelKeyMicro)
      .select(col("doc_id"), col("lang"), col("n_tok"), col("key_micro"))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(DsirPipelineK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("split"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    sel
      .filter(Curation.keepCol(col("doc_id"), col("lang")))
      .withColumn("split", splitCol(col("doc_id")))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
      .withColumn("run", sum(col("n_tok")).over(w))
      .withColumn("bin", expr(s"(run - n_tok) div $budget"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        countDistinct(col("shard") * 10000 + col("bin")).as("n_bins"),
        sum(col("doc_id")).as("docid_sum"))
      .orderBy(col("split"))
  }

  // ---- PII scrub (q256) ----

  /** PII detection + redaction patterns — the three classes every
    * production scrub pass (C4, CCNet, Dolma-style) handles with
    * rule-based matching: emails, international-format phone
    * numbers, IPv4 addresses. RE2-safe subset (no backreferences or
    * lookaround) so the DuckDB oracle runs the IDENTICAL pattern
    * text through its own regex engine — the cross-engine agreement
    * is part of the gate, not an assumption.
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
  val PiiIpv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII scrub (q256) — rule-based detect + redact over the corpus,
    * reported as per-source counts plus a fingerprint of the
    * REDACTED text (so the gate pins the rewrite itself, not just
    * the match counts).
    *
    * The synthetic corpus carries no PII, so the operator runs over
    * a deterministic fixture: 2/3 of documents get an email, a
    * phone and an IPv4 whose digits derive from doc_id appended to
    * their text (the q246 modular-fixture philosophy — the oracle
    * re-derives the exact same corpus and the counts are exact, not
    * statistical), 1/3 stay clean so the no-match path is exercised.
    *
    * 100 TB shape: one codegen'd regexp pass per row (three
    * regexp_count + three chained regexp_replace in a single
    * projection — no explode, no UDF), then ONE partial-aggregable
    * groupBy over ~20 source keys. Embarrassingly parallel; the
    * shuffle carries |sources| rows per task. Redaction order is
    * fixed (email → phone → ip) and part of the contract.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = piiScrubProjection(Corpus.read(spark, dir, "documents"))
    scrubbed.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("e")).cast("long").as("n_emails"),
        sum(col("p")).cast("long").as("n_phones"),
        sum(col("i")).cast("long").as("n_ips"),
        expr("bit_xor(cast(conv(substring(md5(redacted), 1, 15), 16, 10) " +
          "as bigint))").as("redacted_fp"))
      .orderBy(col("source"))
  }

  /** The per-row half of [[piiScrub]] — fixture injection + the
    * three-class detect/redact projection, emitting
    * (doc_id, source, e, p, i, redacted). Stateless and
    * batch/stream-agnostic: q256 aggregates it per source; the qS10
    * ingest twin streams it row-by-row (no watermark, no state).
    */
  def piiScrubProjection(docs: DataFrame): DataFrame = {
    val aug = docs.withColumn("pii_text",
      when(col("doc_id") % 3 === 0, col("text")).otherwise(concat(
        col("text"),
        lit(" contact user"), col("doc_id"),
        lit("@mail.example.org or +1-555-"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
        lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        lit(" from 10."), col("doc_id") % 256, lit("."),
        (col("doc_id") * 3) % 256, lit("."), (col("doc_id") * 5) % 256)))
    aug.select(
      col("doc_id"), col("source"),
      regexp_count(col("pii_text"), lit(PiiEmailRe)).as("e"),
      regexp_count(col("pii_text"), lit(PiiPhoneRe)).as("p"),
      regexp_count(col("pii_text"), lit(PiiIpv4Re)).as("i"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("pii_text"), PiiEmailRe, "<EMAIL>"),
          PiiPhoneRe, "<PHONE>"),
        PiiIpv4Re, "<IP>").as("redacted"))
  }
}
