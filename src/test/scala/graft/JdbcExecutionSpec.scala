package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end execution of the JDBC read path against an embedded
  * Derby database (ships with Spark) — no live PostgreSQL exists in
  * this offline environment, so this exercises everything the engine
  * owns in `read_sql`: option assembly → Spark JDBC source → schema
  * from ResultSetMetaData → row decode → partitioned parallel reads →
  * parity post-transforms → the failure surface. PostgreSQL-SPECIFIC
  * wire-type semantics stay covered by FlacoPostgresDialectSpec /
  * PgTypeMapSpec (a Derby URL does not engage the PG dialect).
  */
class JdbcExecutionSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private lazy val url: String = {
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby").toString)
    val u = "jdbc:derby:memory:graftdb;create=true"
    val c = DriverManager.getConnection(u)
    val st = c.createStatement()
    st.executeUpdate(
      """CREATE TABLE people (
        |  id INT NOT NULL,
        |  name VARCHAR(40),
        |  score DOUBLE,
        |  balance DECIMAL(10,2),
        |  born TIMESTAMP,
        |  active BOOLEAN)""".stripMargin)
    val ins = c.prepareStatement(
      "INSERT INTO people VALUES (?, ?, ?, ?, ?, ?)")
    (0 until 50).foreach { i =>
      ins.setInt(1, i)
      ins.setString(2, if (i % 7 == 0) null else s"name_$i")
      ins.setDouble(3, i * 1.5)
      ins.setBigDecimal(4, new java.math.BigDecimal(s"$i.25"))
      ins.setTimestamp(5, java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 12:00:00"))
      ins.setBoolean(6, i % 2 == 0)
      ins.executeUpdate()
    }
    ins.close(); st.close(); c.close()
    u
  }

  test("read_sql executes an arbitrary SQL statement and decodes rows") {
    val df = Flaco.readSqlToDataFrame(spark, url,
      "SELECT id, name, score, balance, born, active FROM people WHERE id < 10")
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.length === 10)
    assert(rows(3).getString(1) === "name_3")
    assert(rows(0).isNullAt(1), "NULL VARCHAR must survive the wire")
    assert(rows(2).getDouble(2) === 3.0)
    assert(rows(4).getBoolean(5) === true)
    // default parity: numericAsDouble converts the DECIMAL column
    // (Derby reports uppercase identifiers)
    assert(df.schema("BALANCE").dataType ===
      org.apache.spark.sql.types.DoubleType)
    assert(math.abs(rows(7).getDouble(3) - 7.25) < 1e-9)
  }

  test("exact mode keeps DECIMAL precision") {
    val df = Flaco.readSqlToDataFrame(spark, url,
      "SELECT id, balance FROM people WHERE id = 33",
      parity = ParityOptions(numericAsDouble = false))
    val r = df.collect().head
    assert(r.getDecimal(1) === new java.math.BigDecimal("33.25"))
  }

  test("partitioned read splits into parallel range scans") {
    val df = spark.read.format("jdbc")
      .options(Flaco.jdbcOptions(url, "SELECT id, score FROM people",
        partitionColumn = Some(("id", 0L, 50L, 4))))
      .load()
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 50)
    assert(df.agg(org.apache.spark.sql.functions.sum("id")).collect()
      .head.getLong(0) === (0 until 50).sum.toLong)
  }

  test("bad SQL fails with the catchable FlacoSparkException at execution") {
    val e = intercept[FlacoSparkException] {
      Flaco.readSqlToDataFrame(spark, url, "SELECT definitely not sql !!")
    }
    assert(e.getMessage.contains("read_sql failed"))
  }

  test("readSqlToFile lands the result as parquet") {
    val out = java.nio.file.Files.createTempDirectory("jdbcout").toString + "/p"
    Flaco.readSqlToFile(spark, url, "SELECT id, score FROM people",
      out, FileFormat.Parquet)
    assert(spark.read.parquet(out).count() === 50)
  }
}
