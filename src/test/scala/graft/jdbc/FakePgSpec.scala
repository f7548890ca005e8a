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

  /** The observable half of the pushdown contract: the SQL texts
    * Spark actually SENDS (recorded by the driver) — the schema
    * probe, one statement per partition each carrying its range
    * predicate, and the pushed filter inside every partition's
    * WHERE. Against live PostgreSQL these are exactly the statements
    * the server would plan.
    */
  test("partitioned read sends per-partition WHERE clauses with the pushed filter") {
    val d = FlacoPostgresDialect.register()
    try {
      FakePgTable.clearRecorded()
      val df = spark.read.format("jdbc")
        .option("url", "jdbc:postgresql://fake:5432/db")
        .option("driver", classOf[FakePgDriver].getName)
        .option("dbtable", "pgtab")
        .option("partitionColumn", "id")
        .option("lowerBound", "1").option("upperBound", "5")
        .option("numPartitions", "2")
        .load()
        .filter(col("id") > 1)
      // The fixture serves the full table to every non-probe
      // statement, so 2 partitions x 3 rows proves two partition
      // statements executed AND that Spark trusts the pushed filter
      // (no re-evaluation: rows with id=1 come back uncut).
      assert(df.count() === 6L)
      val sqls = FakePgTable.recordedSql
      assert(sqls.exists(_.contains("WHERE 1=0")), s"no schema probe in $sqls")
      val parts = sqls.filterNot(_.contains("1=0"))
      assert(parts.length === 2, s"expected 2 partition statements: $parts")
      // Range split of [1,5) into 2 strides at 3; null rows ride the
      // first stride.
      assert(parts.exists(s => s.contains("< 3") && s.contains("is null")),
        s"no lower-stride clause in $parts")
      assert(parts.exists(_.contains(">= 3")), s"no upper-stride clause in $parts")
      parts.foreach { s =>
        assert(s.toLowerCase.contains("where"), s"partition statement without WHERE: $s")
        assert(s.contains("\"id\" > 1"), s"pushed filter missing from: $s")
      }
    } finally org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(d)
  }

  test("dbtable subquery travels verbatim as the FROM relation") {
    val sub = "(SELECT id, label FROM pgtab WHERE id > 0) sq"
    val d = FlacoPostgresDialect.register()
    try {
      FakePgTable.clearRecorded()
      spark.read.format("jdbc")
        .option("url", "jdbc:postgresql://fake:5432/db")
        .option("driver", classOf[FakePgDriver].getName)
        .option("dbtable", sub)
        .load().collect()
      val sqls = FakePgTable.recordedSql
      assert(sqls.nonEmpty)
      sqls.foreach(s => assert(s.contains(sub), s"FROM relation rewritten: $s"))
    } finally org.apache.spark.sql.jdbc.JdbcDialects.unregisterDialect(d)
  }
}
