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

  test("timestamps: naive stays NTZ, tz becomes instant BY NAME") {
    assert(ct(Types.TIMESTAMP, "timestamp") === Some(TimestampNTZType))
    // pgjdbc reports Types.TIMESTAMP for timestamptz too — the
    // instant mapping must fire on the type NAME or absolute times
    // would silently load as naive values.
    assert(ct(Types.TIMESTAMP, "timestamptz") === Some(TimestampType))
    assert(ct(Types.TIMESTAMP_WITH_TIMEZONE, "timestamptz") === Some(TimestampType))
  }

  test("getter-incompatible mappings are NOT bent at the JDBC layer") {
    // rs.getLong on TIME / struct getters don't exist in JdbcUtils:
    // these semantics live in PgTypeMap / DecodeInterval post-load,
    // and the dialect must defer to Spark's defaults.
    assert(ct(Types.TIME, "time") === None)
    assert(ct(Types.TIME, "timetz") === None)
    assert(ct(Types.OTHER, "interval") === None)
    assert(ct(Types.CHAR, "char", size = 1) === None)
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
