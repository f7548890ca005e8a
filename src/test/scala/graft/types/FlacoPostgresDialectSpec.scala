package graft.types

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ParityOptions

/** The dialect is the JDBC-layer carrier of the reference's type
  * semantics — testable offline because getCatalystType is a pure
  * function of (sqlType, typeName, size).
  */
class FlacoPostgresDialectSpec extends AnyFunSuite {

  private val d = new FlacoPostgresDialect()
  private def ct(sqlType: Int, name: String, size: Int = 0): Option[DataType] =
    d.getCatalystType(sqlType, name, size, new MetadataBuilder)

  test("handles exactly postgresql JDBC urls") {
    assert(d.canHandle("jdbc:postgresql://h:5432/db"))
    assert(!d.canHandle("jdbc:mysql://h/db"))
  }

  test("numeric is lossy double under parity, decimal in exact mode") {
    assert(ct(Types.NUMERIC, "numeric") === Some(DoubleType))
    val exact = new FlacoPostgresDialect(ParityOptions(numericAsDouble = false))
    assert(exact.getCatalystType(Types.NUMERIC, "numeric", 0,
      new MetadataBuilder) === Some(DecimalType(38, 18)))
  }

  test("json, jsonb and uuid land on plain strings") {
    assert(ct(Types.OTHER, "json") === Some(StringType))
    assert(ct(Types.OTHER, "jsonb") === Some(StringType))
    assert(ct(Types.OTHER, "uuid") === Some(StringType))
  }

  test("1-byte char keeps the code; time maps to micros; oid widens") {
    assert(ct(Types.CHAR, "char", size = 1) === Some(ByteType))
    assert(ct(Types.TIME, "time") === Some(LongType))
    assert(ct(Types.TIME, "timetz") === Some(LongType))
    assert(ct(Types.BIGINT, "oid") === Some(LongType))
  }

  test("timestamps: naive stays NTZ, tz becomes instant") {
    assert(ct(Types.TIMESTAMP, "timestamp") === Some(TimestampNTZType))
    assert(ct(Types.TIMESTAMP_WITH_TIMEZONE, "timestamptz") === Some(TimestampType))
  }

  test("interval maps to the decoded struct of PgTypeMap") {
    assert(ct(Types.OTHER, "interval") === Some(PgTypeMap.mapping("interval")))
  }

  test("unknown types defer to Spark (catchable error, not an abort)") {
    assert(ct(Types.OTHER, "mpaa_rating") === None)
  }

  test("write side is symmetric for the bent types") {
    assert(d.getJDBCType(DoubleType).map(_.databaseTypeDefinition) ===
      Some("DOUBLE PRECISION"))
    assert(d.getJDBCType(TimestampNTZType).map(_.databaseTypeDefinition) ===
      Some("TIMESTAMP"))
  }

  test("register takes precedence over the built-in postgres dialect") {
    val installed = FlacoPostgresDialect.register()
    try {
      // Spark folds multiple matching dialects into an AggregatedDialect
      // with registered ones first: numeric must now resolve to the
      // reference's lossy double, not the built-in DecimalType.
      val effective = JdbcDialects.get("jdbc:postgresql://h/db")
      assert(effective.getCatalystType(Types.NUMERIC, "numeric", 0,
        new MetadataBuilder) === Some(DoubleType))
    } finally JdbcDialects.unregisterDialect(installed)
  }
}
