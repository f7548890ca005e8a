package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the two techniques that decide whether
  * a 100 TB table is queryable: directory partitioning (partition
  * pruning: a filter on the partition column skips whole directories
  * before any I/O) and hash bucketing (co-located joins/aggregations:
  * two tables bucketed on the same key by the same count join with NO
  * shuffle — the exchange disappears from the plan). The reference
  * has no table layout at all (single-file sinks, `src/lib.rs:116-168`);
  * this is pure Spark-scale capability.
  */
object Layout {

  /** Write `df` hive-style partitioned by `cols` (low-cardinality
    * columns only — each distinct combination is a directory).
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Write `df` as a bucketed external table: `buckets` hash buckets
    * on `key`, sorted within buckets (enables shuffle-free sort-merge
    * joins too). Bucketing metadata lives in the session catalog;
    * `path` keeps the data external to the warehouse.
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables previously bucketed on the join key with the
    * same bucket count: Catalyst sees compatible output partitioning
    * on both sides and plans the join without any Exchange.
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Oracle-gated bucketed join (the q57 salting pattern: a physical
    * layout choice must be result-invisible): orders and customer are
    * re-written as bucketed tables on their join keys, then joined and
    * aggregated to revenue per market segment — the oracle is the
    * PLAIN join over the raw parquet, so any row lost or duplicated by
    * the bucketing write/read round-trip fails the hash. The
    * shuffle-elimination claim itself is pinned in LayoutSpec (plan
    * has no Exchange with broadcast disabled); at 100 TB this layout
    * is what turns every repeated fact-dim join on the same key from
    * a full shuffle into a local merge. Money in exact integer cents.
    */
  /** One scratch directory per (JVM, prefix), overwritten — never
    * re-created — on every invocation: the bench runs each query
    * several times per pass, and a fresh createTempDirectory per call
    * would orphan the previous copy each time (an unbounded disk leak
    * across bench/correctness runs). Deleted on JVM shutdown.
    */
  private def jvmScratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils.deleteQuietly(p.toFile): Unit))
    p.toString
  }

  private lazy val bucketDir: String = jvmScratchDir("graft_q74_")

  def bucketedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val tmp = bucketDir
    writeBucketed(
      Corpus.read(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "q74_orders_b", s"$tmp/orders", "o_custkey", 8)
    writeBucketed(
      Corpus.read(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
      "q74_customer_b", s"$tmp/customer", "c_custkey", 8)
    spark.table("q74_orders_b")
      .join(spark.table("q74_customer_b"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("revenue_cents"))
      .orderBy(col("c_mktsegment"))
  }

  private lazy val federationDir: String = jvmScratchDir("graft_q106_")

  /** Cross-format federation — the reference's file-format selector
    * (`/root/reference/src/lib.rs:19-26`) exercised as one QUERY
    * instead of isolated round-trips: the nation dim is re-written as
    * headered CSV, region as JSON lines, and both join back against
    * the parquet customer table in a single plan. The oracle runs the
    * same join over the ORIGINAL parquet — any value a format writer
    * or reader mangles (type widening, header handling, JSON numeric
    * round-trip) breaks the hash. Dims stay broadcast-small; the one
    * corpus-sized input is the parquet scan.
    */
  def federatedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val tmp = federationDir
    Corpus.read(spark, dir, "nation").write.mode("overwrite")
      .option("header", "true").csv(s"$tmp/nation_csv")
    Corpus.read(spark, dir, "region").write.mode("overwrite")
      .json(s"$tmp/region_json")
    val nation = spark.read.option("header", "true")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .csv(s"$tmp/nation_csv")
    val region = spark.read
      .schema("r_regionkey INT, r_name STRING")
      .json(s"$tmp/region_json")
    Corpus.read(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
          .as("acctbal_cents"))
      .orderBy(col("r_name"))
  }

  private lazy val layoutDir: String = jvmScratchDir("graft_q237_")

  /** Layout / clustering-health introspection (q237) — the per-file
    * min/max statistics an OPTIMIZE/Z-ORDER decision is made from:
    * write the SAME keys under a clustered layout (arithmetic range
    * buckets — disjoint sorted runs) and a shuffled one (k mod N —
    * every file spans the whole key range), read both back, and
    * derive per-file (count, min, max) from the PHYSICAL layout via
    * `input_file_name()`, then count overlapping file pairs — 0 for
    * the clustered layout, all N·(N−1)/2 for the shuffled one. The
    * overlap count is exactly what data-skipping buys: a point
    * predicate prunes to 1 file on the clustered layout and to none
    * on the shuffled one.
    *
    * File assignment is EXPLICIT ARITHMETIC (`k div width`,
    * `k mod N`), so the oracle re-derives every statistic from the
    * ORIGINAL table without touching the scratch files (the q106
    * philosophy) — the gate therefore proves the physical
    * write→read→introspect round trip reproduces the logical
    * assignment. Per-file stats group by the partition VALUE parsed
    * from the path, so task-level part-file splits inside one
    * partition directory cannot change the result. The pair join is
    * file-count-bounded.
    */
  def layoutHealth(spark: SparkSession, dir: String,
      nFiles: Int = 8): DataFrame = {
    val tmp = layoutDir
    val li = Corpus.read(spark, dir, "lineitem")
      .select(expr("CAST(l_orderkey AS BIGINT)").as("k"))
    val maxK = li.agg(max(col("k"))).head().getLong(0)
    val width = maxK / nFiles + 1
    val assigned = li
      .withColumn("f_clustered", expr(s"k div $width"))
      .withColumn("f_shuffled", pmod(col("k"), lit(nFiles)).cast("long"))
    assigned.write.mode("overwrite")
      .partitionBy("f_clustered").parquet(s"$tmp/clustered")
    assigned.write.mode("overwrite")
      .partitionBy("f_shuffled").parquet(s"$tmp/shuffled")
    def stats(path: String, pcol: String, label: String): DataFrame = {
      val per = spark.read.parquet(path)
        .withColumn("file",
          regexp_extract(input_file_name(), s"$pcol=(\\d+)", 1)
            .cast("long"))
        .groupBy(col("file"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("mn"),
          max(col("k")).as("mx"))
      val a = per.select(col("file").as("fa"), col("mn").as("mna"),
        col("mx").as("mxa"))
      val b = per.select(col("file").as("fb"), col("mn").as("mnb"),
        col("mx").as("mxb"))
      val ov = a.join(broadcast(b), col("fa") < col("fb") &&
          col("mnb") <= col("mxa") && col("mna") <= col("mxb"))
        .agg(count(lit(1)).as("overlapping_pairs"))
      per.agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"))
        .crossJoin(broadcast(ov))
        .select(lit(label).as("layout"), col("n_files"), col("n_rows"),
          col("overlapping_pairs"))
    }
    stats(s"$tmp/clustered", "f_clustered", "clustered")
      .unionByName(stats(s"$tmp/shuffled", "f_shuffled", "shuffled"))
      .orderBy(col("layout"))
  }

  private lazy val zorderScratch: String = jvmScratchDir("graft_q242_")

  /** Physical file count for [[zorderHealth]]'s two scratch layouts —
    * private because the q242 oracle's tile math is derived from it
    * (power of two; 65536 must divide evenly).
    */
  private val ZorderFiles = 16

  /** Bit-interleave of two pre-scaled `bits`-bit integers as PURE
    * div/mod/multiply arithmetic — one text, any SQL engine (no
    * shift-operator dialect): z = Σ_i ((x div 2^i) % 2)·2^(2i+1)
    * + ((y div 2^i) % 2)·2^(2i). `idiv` is the engine's integer
    * division spelling (`div` Spark, `//` DuckDB).
    */
  def zInterleaveExpr(x: String, y: String, idiv: String,
      bits: Int = 8): String =
    (0 until bits).map { i =>
      val p = 1L << i
      s"((($x) $idiv $p) % 2) * ${1L << (2 * i + 1)} + " +
        s"((($y) $idiv $p) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")

  /** Z-ORDER clustering health (q242) — q237's physical
    * write→read→introspect gate extended to MULTI-dimensional
    * data-skipping, the `OPTIMIZE ... ZORDER BY (a, b)` decision:
    * scale two predicate columns to 8-bit codes, bit-interleave them
    * into a 16-bit Morton z-value, and compare a z-clustered layout
    * against a single-column-sorted one. Per layout, per-file
    * (min, max) bounding boxes on BOTH dimensions are derived from
    * the PHYSICAL files via `input_file_name()`; the health row
    * reports the file count a 16-wide probe band hits on each
    * dimension. The linear layout prunes perfectly on its sort key
    * and not at all on the other (1 vs all); z-order prunes BOTH to
    * ~√nFiles tiles — the balanced-pruning property that justifies
    * the rewrite at 100 TB, measured rather than asserted.
    *
    * File assignment is explicit arithmetic on the z-value
    * (`z div 65536/nFiles` — contiguous Morton tiles), so the oracle
    * re-derives every statistic from the ORIGINAL table without
    * touching the scratch files (the q237/q106 philosophy): the gate
    * proves the physical round trip reproduces the logical
    * assignment. At scale the same z projection feeds
    * `repartitionByRange(z) + sortWithinPartitions(z)` — a single
    * range shuffle, no new operator; the stats join here is
    * file-count-bounded.
    */
  def zorderHealth(spark: SparkSession, dir: String): DataFrame = {
    // File count is a PRIVATE constant, not a parameter: the q242
    // oracle hard-codes the matching tile math (z // 4096, 16-file
    // layout, the [100,115] probe band), and 65536/nFiles truncates
    // for non-power-of-two values — a caller-supplied nFiles would
    // silently diverge from the oracle (r15 ADVICE).
    val nFiles = ZorderFiles
    val tmp = zorderScratch
    // NOT spread (r21, measured both directions): repartitioning the
    // scan before the two partitionBy writes made the gate 2.5→5.1 s
    // — 32 tasks × 16 partition dirs fan out to ~512 small part
    // files, and the doubled open/commit overhead plus the read-back
    // of those files exceeds the single-task write it replaced
    // (guide §6's small-files tax, measured live).
    val li = Corpus.read(spark, dir, "lineitem")
      .select(expr("CAST(l_partkey AS BIGINT)").as("x"),
        expr("CAST(l_suppkey AS BIGINT)").as("y"))
    val mr = li.agg(max(col("x")), max(col("y"))).head()
    val (maxX, maxY) = (mr.getLong(0), mr.getLong(1))
    val assigned = li
      .withColumn("xb", expr(s"x * 256 div ${maxX + 1}"))
      .withColumn("yb", expr(s"y * 256 div ${maxY + 1}"))
      .withColumn("z", expr(zInterleaveExpr("xb", "yb", "div")))
      .withColumn("f_zorder", expr(s"z div ${65536 / nFiles}"))
      .withColumn("f_linear", expr(s"xb div ${256 / nFiles}"))
    assigned.write.mode("overwrite")
      .partitionBy("f_zorder").parquet(s"$tmp/zorder")
    assigned.write.mode("overwrite")
      .partitionBy("f_linear").parquet(s"$tmp/linear")
    def stats(path: String, pcol: String, label: String): DataFrame = {
      val per = spark.read.parquet(path)
        .withColumn("file",
          regexp_extract(input_file_name(), s"$pcol=(\\d+)", 1)
            .cast("long"))
        .groupBy(col("file"))
        .agg(count(lit(1)).as("n"),
          min(col("xb")).as("mnx"), max(col("xb")).as("mxx"),
          min(col("yb")).as("mny"), max(col("yb")).as("mxy"))
      per.agg(count(lit(1)).as("n_files"), sum(col("n")).as("n_rows"),
        sum(expr("(mxx - mnx + 1) * (mxy - mny + 1)"))
          .as("sum_bbox_area"),
        sum(when(col("mnx") <= 115 && col("mxx") >= 100, 1L)
          .otherwise(0L)).as("files_hit_x"),
        sum(when(col("mny") <= 115 && col("mxy") >= 100, 1L)
          .otherwise(0L)).as("files_hit_y"))
        .select(lit(label).as("layout"), col("n_files"), col("n_rows"),
          col("sum_bbox_area"), col("files_hit_x"), col("files_hit_y"))
    }
    stats(s"$tmp/zorder", "f_zorder", "zorder")
      .unionByName(stats(s"$tmp/linear", "f_linear", "linear"))
      .orderBy(col("layout"))
  }

  private lazy val corruptDir: String = jvmScratchDir("graft_q221_")

  /** Corrupt-record-tolerant JSON ingestion (q221) — the ingest
    * contract a 100 TB pipeline cannot live without: a malformed line
    * must not fail the job (FAILFAST), must not silently vanish
    * (DROPMALFORMED), but must surface as a quarantined row
    * (PERMISSIVE + `_corrupt_record`) so loss is measurable. The
    * fixture corrupts a deterministic subset (event_id % 17 = 0 —
    * each such line truncated to half) of a JSON-lines re-write of
    * events; the report checksums BOTH populations (good rows by id
    * sum + cents, corrupt rows by count), and the oracle re-derives
    * them arithmetically from the original parquet. Integer-only
    * JSON fields keep the float round-trip out of the gate.
    */
  def corruptJsonIngest(spark: SparkSession, dir: String): DataFrame = {
    val tmp = corruptDir
    Corpus.read(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("line", to_json(struct(col("event_id"), col("user_id"),
        col("cents"))))
      .withColumn("line", when(col("event_id") % 17 === 0,
        expr("substring(line, 1, length(line) div 2)"))
        .otherwise(col("line")))
      .select(col("line"))
      .write.mode("overwrite").text(s"$tmp/events_jsonl")
    spark.read
      .schema("event_id LONG, user_id LONG, cents LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$tmp/events_jsonl")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("_corrupt_record").isNull.cast("long")).as("n_good"),
        sum(col("_corrupt_record").isNotNull.cast("long")).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("event_id")))
          .as("good_id_sum"),
        sum(when(col("_corrupt_record").isNull, col("cents")))
          .as("good_cents"))
  }

  private lazy val evolutionDir: String = jvmScratchDir("graft_q218_")

  /** Schema-evolution read (q218) — the lakehouse reality a 100 TB
    * table accumulates: files written before a column existed sit
    * next to files written after. Orders are re-written as two
    * batches — the even keys WITHOUT `o_orderpriority` (the
    * "old-schema" files), the odd keys with it — and read back as one
    * table under `mergeSchema`; the old-schema rows must surface the
    * evolved column as NULL, not fail the scan or silently drop rows.
    * The aggregate groups by the evolved column (NULL group = the
    * old files) and checksums both populations; the oracle re-derives
    * the merged table arithmetically from the original parquet.
    */
  def schemaEvolutionRead(spark: SparkSession, dir: String): DataFrame = {
    val tmp = evolutionDir
    val orders = Corpus.read(spark, dir, "orders")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$tmp/orders_evo/batch=old")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$tmp/orders_evo/batch=new")
    spark.read.option("mergeSchema", "true").parquet(s"$tmp/orders_evo")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
          .as("price_cents"),
        sum(col("o_orderkey")).as("key_sum"))
      .select(coalesce(col("o_orderpriority"), lit("PRE_SCHEMA"))
        .as("prio"), col("n_orders"), col("price_cents"), col("key_sum"))
      .orderBy(col("prio"))
  }
}
