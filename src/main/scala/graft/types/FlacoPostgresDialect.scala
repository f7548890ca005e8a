package graft.types

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

import graft.ParityOptions

/** JDBC dialect carrying the reference's PostgreSQL→Arrow type
  * choices (the 19-arm switch at reference `src/lib.rs:199-386`,
  * SURVEY.md §1.2) into Spark's own JDBC read path — the idiomatic
  * place for per-type decode semantics (SURVEY §2.1 row 2: the row
  * loop is subsumed by the dialect layer; the mapping IS the work).
  *
  * Differences from Spark's built-in PostgresDialect, all traceable
  * to the reference:
  *   - NUMERIC → DoubleType (lossy, `src/lib.rs:375-381`) under the
  *     default parity; DecimalType(38,18) in exact mode
  *   - JSON/JSONB → StringType (re-serialized text, not nested;
  *     `src/lib.rs:226-234`)
  *   - UUID → StringType (the intent of `src/lib.rs:241-248`)
  *   - "char" (1-byte) → ByteType: the reference keeps the char CODE,
  *     not the character (`src/lib.rs:214-219`)
  *   - TIME/TIMETZ → LongType µs-since-midnight (no Spark TimeType;
  *     `src/lib.rs:350-366`, offsets discarded like the reference)
  *   - OID → LongType (u32 widened, `src/lib.rs:235-240`)
  *   - TIMESTAMP → TimestampNTZType (tz-naive, `src/lib.rs:283-303`)
  *   - unknown types surface as None → Spark raises a catchable
  *     error instead of the reference's `unimplemented!` abort
  *     (`src/lib.rs:382-385`)
  */
class FlacoPostgresDialect(parity: ParityOptions = ParityOptions())
    extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:postgresql")

  override def getCatalystType(
      sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = {
    val byName = typeName.toLowerCase match {
      case "json" | "jsonb" | "uuid" => Some(StringType)
      case "char" if size <= 1 => Some(ByteType) // 1-byte "char" code
      case "time" | "timetz" => Some(LongType)   // µs since midnight
      case "oid" => Some(LongType)
      case "interval" => Some(PgTypeMap.mapping("interval"))
      case _ => None
    }
    byName.orElse(sqlType match {
      case Types.NUMERIC | Types.DECIMAL =>
        Some(if (parity.numericAsDouble) DoubleType else PgTypeMap.numericExact)
      case Types.TIMESTAMP => Some(TimestampNTZType)
      case Types.TIMESTAMP_WITH_TIMEZONE => Some(TimestampType)
      case _ => None // defer to Spark's default mapping / error surface
    })
  }

  /** Write-side mapping (spark → PG) for the types the read side
    * bends: keep them symmetric so a round trip re-reads the same.
    */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case DoubleType => Some(JdbcType("DOUBLE PRECISION", Types.DOUBLE))
    case StringType => Some(JdbcType("TEXT", Types.VARCHAR))
    case ByteType => Some(JdbcType("\"char\"", Types.CHAR))
    case TimestampNTZType => Some(JdbcType("TIMESTAMP", Types.TIMESTAMP))
    case _ => None
  }

  override def quoteIdentifier(colName: String): String =
    "\"" + colName.replace("\"", "\"\"") + "\""
}

object FlacoPostgresDialect {
  /** Install for all jdbc:postgresql URLs (before Spark's built-in
    * dialect — registered dialects take precedence).
    */
  def register(parity: ParityOptions = ParityOptions()): FlacoPostgresDialect = {
    val d = new FlacoPostgresDialect(parity)
    JdbcDialects.registerDialect(d)
    d
  }
}
