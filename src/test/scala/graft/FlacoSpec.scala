package graft

import org.scalatest.funsuite.AnyFunSuite

/** API surface + error paths, the analogue of the reference's
  * error-path tests (`tests/test_general.py:103-112`: invalid SQL and
  * invalid URI both raise FlacoException). Execution against a live
  * PostgreSQL is impossible offline, so the JDBC path is tested at
  * the plan-assembly level plus its failure wrapping.
  */
class FlacoSpec extends AnyFunSuite {

  test("jdbcOptions carries query, url and fetchsize into the plan") {
    val opts = Flaco.jdbcOptions("jdbc:postgresql://h/db", "select 1 as x")
    assert(opts("url") === "jdbc:postgresql://h/db")
    assert(opts("query") === "select 1 as x")
    assert(opts("fetchsize") === "10000")
    assert(!opts.contains("partitionColumn"))
  }

  test("jdbcOptions adds partitioned-read options when requested") {
    val opts = Flaco.jdbcOptions("jdbc:postgresql://h/db", "select * from t",
      fetchSize = 500, partitionColumn = Some(("id", 0L, 1000L, 8)))
    assert(opts("fetchsize") === "500")
    assert(opts("partitionColumn") === "id")
    assert(opts("lowerBound") === "0" && opts("upperBound") === "1000")
    assert(opts("numPartitions") === "8")
    // 'query' and 'partitionColumn' are mutually exclusive in Spark's
    // JDBCOptions: the partitioned form must use a dbtable subquery.
    assert(!opts.contains("query"))
    assert(opts("dbtable") === "(select * from t) flaco_subquery")
  }

  test("readSqlToDataFrame wraps connection failure in FlacoSparkException") {
    val e = intercept[FlacoSparkException] {
      Flaco.readSqlToDataFrame(TestSpark.spark,
        "jdbc:postgresql://nope.invalid:5432/db", "select 1")
    }
    assert(e.getMessage.contains("read_sql failed"))
  }

  test("sql raises FlacoSparkException on invalid SQL") {
    val e = intercept[FlacoSparkException] {
      Flaco.sql(TestSpark.spark, TestSpark.sf, "select definitely not sql !")
    }
    assert(e.getMessage.contains("sql failed"))
  }

  test("sql runs a delegated statement over the registered corpus") {
    val df = Flaco.sql(TestSpark.spark, TestSpark.sf,
      "select count(*) as n from lineitem")
    assert(df.collect().head.getLong(0) > 0)
  }

  test("writeFile dispatches on the FileFormat ADT") {
    val spark = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val df = spark.range(5).toDF("id")
    Flaco.writeFile(df, s"$dir/p", FileFormat.Parquet)
    assert(spark.read.parquet(s"$dir/p").count() === 5)
    Flaco.writeFile(df, s"$dir/f", FileFormat.Feather,
      ParityOptions(singleFile = true))
    assert(new java.io.File(s"$dir/f").isFile)
  }

  test("orders round-trips through the Csv, Json and Orc formats") {
    val spark = TestSpark.spark
    val df = graft.sources.Corpus.read(spark, TestSpark.sf, "orders")
    val dir = java.nio.file.Files.createTempDirectory("fmt3").toString
    Seq(FileFormat.Csv, FileFormat.Json, FileFormat.Orc).foreach { fmt =>
      val p = s"$dir/${fmt.toString.toLowerCase}"
      Flaco.writeFile(df, p, fmt)
      val back = Flaco.readFile(spark, p, fmt, Some(df.schema))
      assert(back.count() === df.count(), s"count via $fmt")
      val cols = df.columns.toSeq
      assert(back.select(cols.head, cols.tail: _*).exceptAll(df).isEmpty,
        s"content via $fmt")
    }
  }

  test("csv round-trips fields containing newlines (multiLine read)") {
    val spark = TestSpark.spark
    val s = spark
    import s.implicits._
    val df = Seq((1L, "plain"), (2L, "line one\nline two"), (3L, "a,b\"c"))
      .toDF("id", "text")
    val p = java.nio.file.Files.createTempDirectory("csvnl").toString + "/t"
    Flaco.writeFile(df, p, FileFormat.Csv)
    val back = Flaco.readFile(spark, p, FileFormat.Csv, Some(df.schema))
    assert(back.count() === 3)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("session extensions inject cosine_sim into fresh sessions' SQL") {
    // newSession() has a fresh function registry: anything registered
    // imperatively on the shared session is absent there, so success
    // proves the GraftSessionExtensions injection path.
    val s2 = TestSpark.spark.newSession()
    val r = s2.sql(
      "select cosine_sim(array(1.0f, 2.0f), array(1.0f, 2.0f)) as c," +
        " dot_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) as d")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.getDouble(1) === 11.0)
  }
}
