package graft.jdbc

import org.scalatest.funsuite.AnyFunSuite

import graft.{Flaco, TestSpark}

/** The r17 binary-transfer read path (extended protocol, per-column
  * BINARY result formats for [[MiniPgWire.BinaryOids]]) pinned
  * value-identical to the text path it replaced, on a LIVE
  * PostgreSQL 15 — env-gated like PagilaLiveSpec
  * (`scripts/pg_provision.sh` arms; cancels offline).
  *
  * Two layers:
  *  1. raw JDBC getters over the same rows with `binaryTransfer`
  *     on/off (the decode-level contract, every BinaryOids type +
  *     NULLs + sign/fraction/scale edges);
  *  2. Spark's whole JDBC read both ways, full-row hash-compared
  *     (the engine-level contract on a pagila-shaped bulk table).
  *
  * The reference reads typed values over the same wire contract
  * (rust-postgres issues extended-protocol reads with binary result
  * format); this gate is what makes the sandbox driver's fast path
  * trustworthy rather than merely fast.
  */
class PgBinaryParitySpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val uriOpt: Option[String] = sys.env.get("FLACO_PG_URI")

  private def uri: String = {
    assume(uriOpt.isDefined,
      "FLACO_PG_URI not set — live-PG binary parity gate dormant offline")
    graft.types.FlacoPostgresDialect.register()
    MiniPgDriver.ensureRegistered()
    uriOpt.get
  }
  private def textUri: String = {
    val u = uri
    u + (if (u.contains("?")) "&" else "?") + "binaryTransfer=false"
  }

  private lazy val loaded: Boolean = {
    val conn = java.sql.DriverManager.getConnection(uri)
    try {
      val st = conn.createStatement()
      st.executeUpdate("DROP TABLE IF EXISTS flaco_binfmt_live")
      st.executeUpdate(
        """CREATE TABLE flaco_binfmt_live (
          |  id int4,
          |  i8 int8, i2 int2, b bool,
          |  f4 float4, f8 float8,
          |  d date, ts timestamp, tz timestamptz,
          |  n numeric(20,6), nn numeric,
          |  by bytea, u uuid,
          |  s text, j json)""".stripMargin)
      st.executeUpdate(
        """INSERT INTO flaco_binfmt_live VALUES
          |  (1, -9007199254740993, -32768, true,
          |   0.1, -2.2250738585072014e-308,
          |   '1999-12-31', '2021-03-14 01:02:03.25',
          |   '2021-03-14 01:02:03.25+05:30',
          |   -1234567890123.456789, 1.500,
          |   '\x0001ff7f80', 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11',
          |   'plain ''text''', '{"k": 1}'),
          |  (2, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
          |   NULL, NULL, NULL, NULL, NULL, NULL),
          |  (3, 9223372036854775807, 32767, false,
          |   3.4028235e38, 1.7976931348623157e308,
          |   '2000-01-01', '2000-01-01 00:00:00',
          |   '2000-01-01 00:00:00+00',
          |   0.000001, 'NaN',
          |   '\x', '00000000-0000-0000-0000-000000000000',
          |   '', '[]')""".stripMargin)
      st.close()
    } finally conn.close()
    true
  }

  test("every BinaryOids getter agrees between binary and text " +
    "transfer, including NULLs and range edges") {
    val u = uri
    assert(loaded)
    val q = "select * from flaco_binfmt_live order by id"
    val cb = java.sql.DriverManager.getConnection(u)
    val ct = java.sql.DriverManager.getConnection(textUri)
    try {
      val rb = cb.createStatement().executeQuery(q)
      val rt = ct.createStatement().executeQuery(q)
      var row = 0
      while (rb.next()) {
        assert(rt.next())
        row += 1
        def both[A](f: java.sql.ResultSet => A): (A, A) = {
          val vb = f(rb); val nb = rb.wasNull()
          val vt = f(rt); val nt = rt.wasNull()
          assert(nb === nt, s"null flag drift row $row")
          (vb, vt)
        }
        Seq(2, 3).foreach { i => // i8, i2
          val (vb, vt) = both(_.getLong(i)); assert(vb === vt, s"col $i")
        }
        locally { val (vb, vt) = both(_.getBoolean(4)); assert(vb === vt) }
        locally { val (vb, vt) = both(_.getFloat(5)); assert(vb === vt) }
        locally { val (vb, vt) = both(_.getDouble(6)); assert(vb === vt) }
        locally { val (vb, vt) = both(_.getDate(7)); assert(vb === vt) }
        Seq(8, 9).foreach { i =>
          val (vb, vt) = both(_.getTimestamp(i)); assert(vb === vt, s"col $i")
        }
        locally { val (vb, vt) = both(_.getBigDecimal(10)); assert(vb === vt) }
        // numeric NaN: both transfer modes serve the text form via
        // getString and throw alike on getBigDecimal.
        locally {
          val (vb, vt) = both(_.getString(11)); assert(vb === vt)
        }
        locally {
          val (vb, vt) = both(r => Option(r.getBytes(12)).map(_.toSeq))
          assert(vb === vt)
        }
        Seq(13, 14, 15).foreach { i => // uuid, text, json
          val (vb, vt) = both(_.getString(i)); assert(vb === vt, s"col $i")
        }
        // getString render parity on the binary-decoded columns too
        // (PG text render vs the ColumnStore.text re-render).
        Seq(1, 2, 3, 4, 7, 10).foreach { i =>
          val (vb, vt) = both(_.getString(i)); assert(vb === vt, s"col $i")
        }
      }
      assert(row === 3 && !rt.next())
    } finally { cb.close(); ct.close() }
  }

  test("binary transfer serves PG's ±infinity timestamps/dates via " +
    "pgjdbc's sentinel convention (the text path throws at parse — " +
    "binary is strictly more faithful here)") {
    val u = uri
    val c = java.sql.DriverManager.getConnection(u)
    try {
      val rs = c.createStatement().executeQuery(
        "select 'infinity'::timestamp, '-infinity'::timestamptz, " +
          "'infinity'::date, '-infinity'::date")
      assert(rs.next())
      assert(rs.getTimestamp(1).getTime === Long.MaxValue)
      assert(rs.getTimestamp(2).getTime === Long.MinValue)
      assert(rs.getDate(3).getTime === Long.MaxValue)
      assert(rs.getDate(4).getTime === Long.MinValue)
      assert(rs.getString(1) === "infinity")
      assert(rs.getString(2) === "-infinity")
    } finally c.close()
  }

  test("binary timestamptz getString tracks the session TimeZone the " +
    "server reports (ParameterStatus), matching the text wire's own " +
    "render after SET TIME ZONE") {
    val u = uri
    val cb = java.sql.DriverManager.getConnection(u)
    val ct = java.sql.DriverManager.getConnection(textUri)
    try {
      val q = "select '2021-03-13 19:32:03.25+00'::timestamptz"
      Seq("Asia/Kolkata", "America/New_York", "UTC").foreach { z =>
        cb.createStatement().executeUpdate(s"SET TIME ZONE '$z'"): Unit
        ct.createStatement().executeUpdate(s"SET TIME ZONE '$z'"): Unit
        val rb = cb.createStatement().executeQuery(q)
        val rt = ct.createStatement().executeQuery(q)
        assert(rb.next() && rt.next())
        assert(rb.getString(1) === rt.getString(1), s"zone $z")
        assert(rb.getTimestamp(1) === rt.getTimestamp(1), s"zone $z")
      }
    } finally { cb.close(); ct.close() }
  }

  test("Spark's whole JDBC read is row-identical across transfer " +
    "modes on a pagila-shaped bulk table") {
    val u = uri
    assert(loaded)
    // payment: ids, numeric amount, timestamp — the bulk shape the
    // ingest probe measures.
    val q = "select * from payment"
    val dfB = Flaco.readSqlToDataFrame(spark, u, q)
    val dfT = Flaco.readSqlToDataFrame(spark, textUri, q)
    assert(dfB.schema === dfT.schema)
    val hb = dfB.selectExpr("count(*)", "bit_xor(xxhash64(*))").head()
    val ht = dfT.selectExpr("count(*)", "bit_xor(xxhash64(*))").head()
    assert(hb === ht)
    assert(hb.getLong(0) > 0)
  }
}
