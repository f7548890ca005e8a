package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Corpus

/** Round-20 breadth: SQL-language UDFs (q264), session variables +
  * EXECUTE IMMEDIATE (q265), and the native XML surface (q266).
  */
class Breadth20Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q264 SQL functions INLINE: the optimized plan carries no " +
    "SQLFunction node, the table function's segment filter reaches " +
    "the scan, and the report equals a hand-inlined twin") {
    val df = Relational.sqlUdfReport(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString()
    // EliminateSQLFunctionNode must have fired for every call — a
    // surviving SQLFunction* wrapper would be a per-row black box.
    assert(!optimized.contains("SQLFunction"),
      s"SQL function not inlined:\n$optimized")
    // After inlining, c_mktsegment = 'BUILDING' is an ordinary
    // predicate — it must be pushed into the customer parquet scan.
    val physical = df.queryExecution.executedPlan.toString()
    // Match c_mktsegment INSIDE the pushed list (r20 ADVICE: two
    // independent contains() could pass vacuously off ReadSchema).
    assert("PushedFilters: \\[[^\\]]*c_mktsegment".r
      .findFirstIn(physical).isDefined,
      s"segment filter not pushed to scan:\n$physical")
    // Semantics: equals the same report with the bodies hand-inlined.
    val twin = graft.Flaco.sql(spark, sf,
      """SELECT o.o_orderpriority AS prio,
        |  CASE substring(o.o_orderpriority, 1, 1) WHEN '1' THEN 5
        |    WHEN '2' THEN 4 WHEN '3' THEN 3 WHEN '4' THEN 2
        |    ELSE 1 END AS w,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS sum_cents,
        |  CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT) *
        |    (CASE substring(o.o_orderpriority, 1, 1) WHEN '1' THEN 5
        |      WHEN '2' THEN 4 WHEN '3' THEN 3 WHEN '4' THEN 2
        |      ELSE 1 END)) AS BIGINT) AS sum_wcents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o.o_orderpriority ORDER BY prio""".stripMargin)
    assert(df.collect().toSeq === twin.collect().toSeq)
    assert(df.count() > 0)
  }

  test("SQL table function composes with LATERAL correlation — " +
    "per-row invocation with an outer-reference argument, still " +
    "inlined") {
    Corpus.registerAll(spark, sf)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION g264t_first_n(k BIGINT)
        |RETURNS TABLE(i BIGINT) RETURN
        |SELECT x FROM (SELECT explode(sequence(1L, greatest(k, 1L)))
        |  AS x)""".stripMargin)
    val df = spark.sql(
      """SELECT n.n_nationkey AS nk, CAST(sum(t.i) AS BIGINT) AS tri
        |FROM nation n, LATERAL g264t_first_n(n.n_nationkey + 1) t
        |GROUP BY n.n_nationkey ORDER BY nk""".stripMargin)
    assert(!df.queryExecution.optimizedPlan.toString().contains("SQLFunction"))
    // sum(1..k) with k = nk+1: the closed form pins per-row invocation.
    df.collect().foreach { r =>
      val k = r.getAs[Number]("nk").longValue() + 1
      assert(r.getAs[Long]("tri") === k * (k + 1) / 2, s"nk=${r.get(0)}")
    }
  }

  test("q265 session variables chain: the data-derived threshold in " +
    "the report equals an independent recomputation, and the " +
    "variable survives for a direct read") {
    val out = Relational.execImmediateReport(spark, sf).collect()
    assert(out.nonEmpty)
    // Recompute the threshold independently of the variable machinery.
    val expected = Corpus.read(spark, sf, "orders").as("o")
      .join(Corpus.read(spark, sf, "customer").as("c"),
        org.apache.spark.sql.functions.expr("o.o_custkey = c.c_custkey"))
      .where("c.c_mktsegment = 'AUTOMOBILE'")
      .count() / 50
    // The gate just ran, so the session variable holds that value.
    val varVal = spark.sql("SELECT g265_minn AS v").collect()(0).getInt(0)
    assert(varVal.toLong === expected)
    out.foreach(r => assert(r.getAs[Long]("n") >= expected,
      s"HAVING threshold violated: ${r}"))
  }

  test("q266 row grain: from_xml and the xpath family agree on every " +
    "single row, and a malformed/NULL xml nulls out instead of " +
    "failing") {
    val n = Corpus.read(spark, sf, "events").count()
    val rows = graft.Flaco.sql(spark, sf,
      s"""WITH x AS (SELECT event_id, user_id, event_type, value,
         |    ${Relational.XmlSynth} AS xml FROM events),
         |p AS (SELECT event_id, user_id, event_type,
         |  from_xml(xml, '_id BIGINT, user STRUCT<_uid: BIGINT,
         |    _tier: STRING>, value BIGINT, tags STRUCT<t: ARRAY<STRING>>')
         |    AS s,
         |  xpath_string(xml, '/evt/user/@tier') AS tier_xp,
         |  CAST(xpath_string(xml, '/evt/user/@uid') AS BIGINT) AS uid_xp
         |FROM x)
         |SELECT
         |  count(CASE WHEN s._id = event_id THEN 1 END) AS id_ok,
         |  count(CASE WHEN s.user._uid = user_id THEN 1 END) AS uid_ok,
         |  count(CASE WHEN s.user._tier = event_type THEN 1 END)
         |    AS tier_ok,
         |  count(CASE WHEN uid_xp = user_id THEN 1 END) AS uid_xp_ok,
         |  count(CASE WHEN tier_xp = event_type THEN 1 END) AS tier_xp_ok
         |FROM p""".stripMargin).collect()(0)
    (0 until 5).foreach(i => assert(rows.getLong(i) === n,
      s"column $i disagreed on ${n - rows.getLong(i)} rows"))
    // NULL / malformed degrade to null, never an error (PERMISSIVE).
    val deg = spark.sql(
      """SELECT from_xml(CAST(NULL AS STRING), 'a INT') AS a,
        |  from_xml('<not-closed', 'a INT') AS b""".stripMargin)
      .collect()(0)
    assert(deg.isNullAt(0))
    assert(deg.get(1) == null || deg.getStruct(1).isNullAt(0))
  }

  test("to_xml is the write half: struct → xml text → from_xml " +
    "round-trips typed values on every row") {
    Corpus.registerAll(spark, sf)
    val rt = spark.sql(
      """SELECT count(*) AS n,
        |  count(CASE WHEN p.a = event_id AND p.b = user_id
        |    AND p.t = event_type THEN 1 END) AS ok
        |FROM (SELECT event_id, user_id, event_type,
        |  from_xml(to_xml(named_struct(
        |      'a', event_id, 'b', user_id, 't', event_type)),
        |    'a BIGINT, b BIGINT, t STRING') AS p
        |  FROM events) t""".stripMargin).collect()(0)
    assert(rt.getLong(0) > 0)
    assert(rt.getLong(1) === rt.getLong(0),
      s"${rt.getLong(0) - rt.getLong(1)} rows failed the to_xml/from_xml round-trip")
  }

  test("q267 try_* branches: every null count matches its closed " +
    "form, and the to_number round-trip recovers the cents exactly") {
    val out = Relational.tryArithmetic(spark, sf).cache()
    try {
      val keys = Corpus.read(spark, sf, "orders")
        .select(org.apache.spark.sql.functions.col("o_orderkey"))
        .collect().map(_.getLong(0))
      val n = keys.length.toLong
      def nulls(c: String) =
        out.filter(out(c).isNull).count()
      assert(out.count() === n)
      // try_cast: invalid string exactly when k % 3 == 0
      assert(nulls("safe_int") === keys.count(_ % 3 == 0).toLong)
      // try_divide: null exactly when divisor k % 5 == 0
      assert(nulls("safe_div") === keys.count(_ % 5 == 0).toLong)
      // try_add/try_multiply: overflow exactly on odd keys (the +10 /
      // x2 arms push past Long.Max; even keys add 0 / multiply by 1)
      assert(nulls("safe_add") === keys.count(_ % 2 == 1).toLong)
      assert(nulls("safe_mul") === keys.count(_ % 2 == 1).toLong)
      // try_element_at: 3-element array, 1-based index 1 + k % 5 —
      // out of range exactly when k % 5 is 3 or 4
      assert(nulls("safe_elem") ===
        keys.count(k => k % 5 == 3 || k % 5 == 4).toLong)
      // to_char → try_to_number round-trip: NEVER null, and equal to
      // the cents it rendered (checked against the independent twin)
      assert(nulls("cents_back") === 0L)
      val cents = Corpus.read(spark, sf, "orders")
        .selectExpr("o_orderkey AS k",
          "CAST(round(o_totalprice * 100) AS BIGINT) AS cents_twin")
      assert(out.join(cents, out("k") === cents("k"))
        .filter("cents_back <> cents_twin").count() === 0L)
      assert(nulls("bad_number") === n)
    } finally { out.unpersist(); () }
  }
}
