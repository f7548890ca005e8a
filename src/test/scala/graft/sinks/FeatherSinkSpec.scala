package graft.sinks

import java.io.FileInputStream
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{FlacoSparkException, TestSpark}
import graft.sources.Corpus

/** End-to-end exercise of the Feather/Arrow-IPC sink (the analogue of
  * `write_table_to_feather`, reference `src/lib.rs:150-168`): write
  * every corpus table plus a null matrix, read the files back with the
  * independent Arrow-Java reader, and compare cell-by-cell against the
  * source DataFrame — covering the Date/Timestamp/List fillVector
  * branches the round-1 verdict flagged as never executed.
  */
class FeatherSinkSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Read one IPC file back as (nulls, values) per column per row. */
  private def readBack(file: String, schema: StructType): Seq[Seq[Any]] = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(file)
    val reader = new ArrowFileReader(in.getChannel, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        (0 until n).foreach { i =>
          out += schema.fields.indices.map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null else cell(v, schema.fields(c).dataType, i)
          }
        }
      }
      out.toSeq
    } finally { reader.close(); in.close(); alloc.close() }
  }

  private def cell(v: FieldVector, dt: DataType, i: Int): Any = dt match {
    case IntegerType => v.asInstanceOf[IntVector].get(i)
    case LongType => v.asInstanceOf[BigIntVector].get(i)
    case ShortType => v.asInstanceOf[SmallIntVector].get(i)
    case ByteType => v.asInstanceOf[TinyIntVector].get(i)
    case FloatType => v.asInstanceOf[Float4Vector].get(i)
    case DoubleType => v.asInstanceOf[Float8Vector].get(i)
    case BooleanType => v.asInstanceOf[BitVector].get(i) == 1
    case StringType =>
      new String(v.asInstanceOf[VarCharVector].get(i), "UTF-8")
    case BinaryType => v.asInstanceOf[VarBinaryVector].get(i).toSeq
    case DateType => v.asInstanceOf[DateDayVector].get(i).toLong
    case TimestampType => v.asInstanceOf[TimeStampMicroTZVector].get(i)
    case TimestampNTZType => v.asInstanceOf[TimeStampMicroVector].get(i)
    case _: TimeType => v.asInstanceOf[TimeMicroVector].get(i)
    case ArrayType(FloatType, _) =>
      v.asInstanceOf[ListVector].getObject(i)
        .asInstanceOf[java.util.List[_]].asScala.toSeq
    case other => fail(s"unhandled test type $other")
  }

  /** The same canonical form for a Spark row cell. */
  private def expected(row: Row, c: Int, dt: DataType): Any =
    if (row.isNullAt(c)) null
    else dt match {
      case DateType => row.getAs[Any](c) match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay
        case d: java.time.LocalDate => d.toEpochDay
      }
      case TimestampType => row.getAs[Any](c) match {
        case t: java.sql.Timestamp =>
          t.getTime * 1000L + (t.getNanos % 1000000) / 1000
        case t: java.time.Instant =>
          t.getEpochSecond * 1000000L + t.getNano / 1000
      }
      case TimestampNTZType =>
        val t = row.getAs[java.time.LocalDateTime](c)
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      case _: TimeType =>
        row.getAs[java.time.LocalTime](c).toNanoOfDay / 1000L
      case BinaryType => row.getAs[Array[Byte]](c).toSeq
      case ArrayType(FloatType, _) => row.getSeq[Float](c)
      case _ => row.get(c)
    }

  private def assertFeatherRoundTrip(df: DataFrame): Unit = {
    val file = Files.createTempDirectory("ft").toString + "/t.arrow"
    FeatherSink.write(df, file, singleFile = true)
    val got = readBack(file, df.schema)
    val want = df.collect().toSeq.map(r =>
      df.schema.fields.indices.map(c => expected(r, c, df.schema.fields(c).dataType)))
    assert(got.length === want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"row $i differs")
    }
  }

  test("every corpus table round-trips through the Feather sink") {
    Corpus.tableNames.foreach { name =>
      assertFeatherRoundTrip(Corpus.read(spark, TestSpark.sf, name))
    }
  }

  test("null matrix: nulls in every supported type round-trip") {
    val schema = StructType(Seq(
      StructField("i4", IntegerType), StructField("i8", LongType),
      StructField("i2", ShortType), StructField("i1", ByteType),
      StructField("f4", FloatType), StructField("f8", DoubleType),
      StructField("s", StringType), StructField("b", BinaryType),
      StructField("bo", BooleanType), StructField("d", DateType),
      StructField("ts", TimestampNTZType),
      StructField("tz", TimestampType),
      // Spark 4.1 native TIME — the reference's own Time64(us)
      // output arm (src/lib.rs:350-366).
      StructField("t6", TimeType(6)),
      StructField("arr", ArrayType(FloatType))))
    val rows = java.util.List.of(
      Row(7, 8L, 9.toShort, 3.toByte, 1.5f, 2.5, "héllo", Array[Byte](0, 127),
        false, java.time.LocalDate.of(1999, 12, 31),
        java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0, 654321000),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:00:00.123456Z")),
        java.time.LocalTime.of(23, 59, 59, 999999000),
        Seq(0.5f, -1.5f)),
      Row(null, null, null, null, null, null, null, null, null, null, null, null, null, null))
    assertFeatherRoundTrip(spark.createDataFrame(rows, schema))
  }

  test("default mode writes one IPC file per partition in parallel") {
    val df = Corpus.read(spark, TestSpark.sf, "orders").repartition(3)
    val dir = Files.createTempDirectory("ftp").toString + "/out"
    FeatherSink.write(df, dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".arrow"))
    assert(parts.length === 3)
    val total = parts.map(p => readBack(p.getPath, df.schema).length).sum
    assert(total === df.count())
  }

  test("write then readFile(Feather) round-trips, single-file and per-partition") {
    val spark0 = spark
    val df = Corpus.read(spark0, TestSpark.sf, "orders")
    val cols = df.columns.toSeq

    val single = Files.createTempDirectory("fr1").toString + "/t.arrow"
    FeatherSink.write(df, single, singleFile = true)
    val back1 = graft.Flaco.readFile(spark0, single, graft.FileFormat.Feather)
    assert(back1.count() === df.count())
    assert(back1.select(cols.head, cols.tail: _*).exceptAll(df).isEmpty)

    val parts = Files.createTempDirectory("fr2").toString + "/out"
    FeatherSink.write(df.repartition(3), parts)
    val back2 = graft.Flaco.readFile(spark0, parts, graft.FileFormat.Feather)
    assert(back2.rdd.getNumPartitions === 3, "one task per IPC file")
    assert(back2.count() === df.count())
    assert(back2.select(cols.head, cols.tail: _*).exceptAll(df).isEmpty)
  }

  test("readFile(Feather) round-trips the null matrix of every supported type") {
    val schema = StructType(Seq(
      StructField("i4", IntegerType), StructField("i8", LongType),
      StructField("f4", FloatType), StructField("f8", DoubleType),
      StructField("s", StringType), StructField("bo", BooleanType),
      StructField("d", DateType), StructField("ts", TimestampNTZType),
      StructField("tz", TimestampType),
      // TIME must survive the engine's OWN read path (FeatherSource),
      // not just a raw Arrow-Java read-back — the sink writes
      // Time64(us), the source must map it to TimeType(6).
      StructField("t6", TimeType(6)),
      StructField("arr", ArrayType(FloatType))))
    val rows = java.util.List.of(
      Row(7, 8L, 1.5f, 2.5, "héllo", false,
        java.time.LocalDate.of(1999, 12, 31),
        java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0, 654321000),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:00:00.123456Z")),
        java.time.LocalTime.of(23, 59, 59, 999999000),
        Seq(0.5f, -1.5f)),
      Row(0, 0L, 0f, 0.0, "", true,
        java.time.LocalDate.of(1970, 1, 1),
        java.time.LocalDateTime.of(1970, 1, 1, 0, 0, 0),
        java.sql.Timestamp.from(java.time.Instant.EPOCH),
        java.time.LocalTime.MIDNIGHT,
        Seq.empty[Float]),
      Row(null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(rows, schema)

    val p = Files.createTempDirectory("frn").toString + "/t.arrow"
    FeatherSink.write(df, p, singleFile = true)
    val back = graft.Flaco.readFile(spark, p, graft.FileFormat.Feather)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)

    // Per-partition mode: same matrix through the parallel layout.
    val parts = Files.createTempDirectory("frnp").toString + "/out"
    FeatherSink.write(df.repartition(2), parts)
    val back2 = graft.Flaco.readFile(spark, parts, graft.FileFormat.Feather)
    assert(back2.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back2.exceptAll(df).isEmpty && df.exceptAll(back2).isEmpty)
  }

  test("collectAsArrowStream round-trips through an independent Arrow reader") {
    val df = Corpus.read(spark, TestSpark.sf, "customer")
    val bytes = graft.Flaco.collectAsArrowStream(df)
    val alloc = new RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.asScala.map(_.getName).toSeq ===
        df.columns.toSeq)
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        (0 until n).foreach { i =>
          got += df.schema.fields.indices.map { c =>
            val v = root.getVector(c)
            if (v.isNull(i)) null else cell(v, df.schema.fields(c).dataType, i)
          }
        }
      }
    } finally { reader.close(); alloc.close() }
    val want = df.collect().toSeq.map(r =>
      df.schema.fields.indices.map(c => expected(r, c, df.schema.fields(c).dataType)))
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("collectAsArrowStream of an empty result carries schema and zero rows") {
    val df = Corpus.read(spark, TestSpark.sf, "orders").filter("o_orderkey < 0")
    val bytes = graft.Flaco.collectAsArrowStream(df)
    val alloc = new RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      assert(reader.getVectorSchemaRoot.getSchema.getFields.asScala
        .map(_.getName).toSeq === df.columns.toSeq)
      var rows = 0
      while (reader.loadNextBatch()) rows += reader.getVectorSchemaRoot.getRowCount
      assert(rows === 0)
    } finally { reader.close(); alloc.close() }
  }

  test("unsupported column type is rejected with FlacoSparkException") {
    val df = spark.sql("select map('k', 1) as m")
    val e = intercept[FlacoSparkException] {
      FeatherSink.write(df, "/tmp/never-written.arrow", singleFile = true)
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("singleFile byte budget fails fast with a typed error, no partial file") {
    val df = Corpus.read(spark, TestSpark.sf, "documents")
      .select("doc_id", "text")
    val path = Files.createTempDirectory("feather-budget").toString + "/one.arrow"
    val e = intercept[FlacoSparkException] {
      FeatherSink.write(df, path, singleFile = true,
        singleFileByteBudget = 1024L)
    }
    assert(e.getMessage.contains("byte budget"))
    assert(!new java.io.File(path).exists(),
      "partial over-budget IPC file left behind")
    // The same result within budget (and the per-partition scale
    // mode) writes fine — the guard gates only the parity path.
    FeatherSink.write(df, path, singleFile = true)
    assert(readBack(path, df.schema).size === df.count())
  }
}
