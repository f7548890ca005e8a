package graft.jdbc

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.types.FlacoPostgresDialect

/** FlacoPostgresDialect executing through Spark's REAL JDBC read
  * path against pgjdbc-shaped metadata ([[FakePgDriver]]): the
  * name-first type arms ("timestamptz" under Types.TIMESTAMP,
  * "json"/"uuid" under Types.OTHER), the numeric parity modes, the
  * pg_type field metadata, and null decode — the PG wire semantics
  * that Derby (JdbcExecutionSpec) cannot exercise. The dialect
  * cannot distinguish this driver from pgjdbc: every input it
  * consults (type codes, type names, precision, values) is
  * reproduced faithfully.
  */
class FakePgSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Register the dialect only for the duration of the action —
    * the registry is process-global and a leaked registration would
    * let FlacoPostgresDialectSpec's precedence assertions pass
    * against OUR instance instead of their own.
    */
  private def withDialect[T](f: org.apache.spark.sql.DataFrame => T): T = {
    val d = FlacoPostgresDialect.register()
    try f(spark.read.format("jdbc")
      .option("url", "jdbc:postgresql://fake:5432/db")
      .option("driver", classOf[FakePgDriver].getName)
      .option("dbtable", "pgtab")
      .load())
    finally org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(d)
  }

  test("dialect maps pgjdbc type names through a real jdbc load") {
    withDialect { df =>
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") === LongType)
    assert(types("label") === StringType)
    assert(types("num") === DoubleType)          // reference's lossy parity
    assert(types("ts") === TimestampNTZType)     // naive timestamp
    assert(types("tstz") === TimestampType)      // name-first arm: instant
    assert(types("j") === StringType)            // json via Types.OTHER
    assert(types("u") === StringType)            // uuid via Types.OTHER
    // Every column records its wire type name for parity transforms.
    assert(df.schema("tstz").metadata.getString("pg_type") === "timestamptz")
    assert(df.schema("num").metadata.getString("pg_type") === "numeric")
    }
  }

  test("values and nulls decode through the real getter path") {
    val rows = withDialect(_.orderBy(col("id")).collect())
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "alpha")
    assert(rows(0).getDouble(2) === 1.5)
    assert(rows(0).getString(5) === """{"k": 1}""")
    assert(rows(0).getString(6) === "123e4567-e89b-12d3-a456-426614174000")
    // The all-null row decodes as nulls, not zeros/empties.
    (1 to 6).foreach(i => assert(rows(1).isNullAt(i), s"col $i of row 2"))
    assert(rows(2).getDouble(2) === -2.25)
    // Naive vs instant semantics: ts is a LocalDateTime-backed NTZ,
    // tstz an instant; both round-trip the same wall-clock digits
    // under the session's UTC zone.
    assert(rows(2).getAs[java.time.LocalDateTime]("ts").toString
      === "1999-12-31T23:59:59")
  }
}
