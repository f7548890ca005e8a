package graft.sinks

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.{Flaco, TestSpark}

/** Executable Python parity for the reference's flagship entry point
  * `read_sql_to_pyarrow` (reference `src/lib.rs:42-72`): the bytes
  * [[Flaco.collectAsArrowStream]] returns must be consumable by a
  * REAL pyarrow runtime — `pyarrow.ipc.open_stream(...).read_all()`
  * per the README recipe — with every value surviving the hop.
  *
  * The probe: a mixed-type DataFrame (int32/int64/string-with-nulls/
  * double/binary/timestamp — the reference's interchange column mix),
  * streamed to Arrow IPC bytes on the JVM side, read back by a
  * python3 subprocess that canonicalizes each column (timestamps →
  * int64 micros, binary → hex, doubles → 6-decimal fixed) and prints
  * one line per column; the spec computes the same canonical lines
  * from `df.collect()` and compares exactly. The timestamp column's
  * expected values are its own micros source column (`ts_us`), so no
  * JVM-side datetime formatting can skew the comparison.
  *
  * Offline pattern (same as PagilaLiveSpec): python3-with-pyarrow is
  * a driver-side amenity, not a library dependency — when it is
  * absent the tests CANCEL (never abort, never fail), and the suite
  * arms with zero work wherever a python runtime exists.
  */
class PyArrowParitySpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** python3 with pyarrow importable, probed once. */
  private lazy val pythonOk: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import pyarrow")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  private val ReaderScript =
    """import sys
      |import pyarrow as pa
      |import pyarrow.ipc as ipc
      |with open(sys.argv[1], 'rb') as f:
      |    buf = f.read()
      |table = ipc.open_stream(pa.py_buffer(buf)).read_all()
      |print("NROWS " + str(table.num_rows))
      |print("SCHEMA " + ";".join(
      |    f.name + ":" + str(f.type) for f in table.schema))
      |for field, col in zip(table.schema, table.columns):
      |    if pa.types.is_timestamp(field.type):
      |        col = col.cast(pa.int64())
      |    if pa.types.is_time(field.type):
      |        col = col.cast(pa.int64())
      |    vals = []
      |    for v in col.to_pylist():
      |        if v is None:
      |            vals.append("NULL")
      |        elif isinstance(v, bytes):
      |            vals.append(v.hex())
      |        elif isinstance(v, float):
      |            vals.append("%.6f" % v)
      |        else:
      |            vals.append(str(v))
      |    print(field.name + "=" + ",".join(vals))
      |""".stripMargin

  private val Rows = 200L

  private def probeDf() = spark.range(Rows).selectExpr(
      "id",
      "cast(id % 5 as int) as i32",
      "if(id % 7 = 0, null, concat('s-', cast(id as string))) as s",
      "cast(id as double) / 3.0 as d",
      "cast(concat('b', cast(id as string)) as binary) as b",
      "946684800000000 + id * 1000000 as ts_us",
      "timestamp_micros(946684800000000 + id * 1000000) as ts",
      // Native TIME(6) (r19): µs-of-day twin + the typed column built
      // from it — pyarrow must see a real time64[us].
      "(id * 61000001) % 86400000000 as t6_us",
      "if(id % 11 = 0, null, to_time(format_string('%02d:%02d:%02d.%06d', " +
        "((id * 61000001) % 86400000000) div 3600000000, " +
        "(((id * 61000001) % 86400000000) div 60000000) % 60, " +
        "(((id * 61000001) % 86400000000) div 1000000) % 60, " +
        "((id * 61000001) % 86400000000) % 1000000))) as t6")
    .orderBy("id")

  test("pyarrow.ipc.open_stream consumes collectAsArrowStream bytes " +
    "value-for-value (the read_sql_to_pyarrow contract)") {
    assume(pythonOk, "python3 with pyarrow not available in this " +
      "sandbox — parity check cancels (arms wherever a python " +
      "runtime exists)")

    val df = probeDf()
    val bytes = Flaco.collectAsArrowStream(df)
    val dir = Files.createTempDirectory("pyarrow-parity")
    val ipcPath = dir.resolve("probe.arrows")
    val scriptPath = dir.resolve("reader.py")
    Files.write(ipcPath, bytes)
    Files.writeString(scriptPath, ReaderScript)

    val proc = new ProcessBuilder("python3", scriptPath.toString,
        ipcPath.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"pyarrow reader failed:\n$out")
    val lines = out.linesIterator.toSeq
    val byName = lines.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap

    assert(lines.contains(s"NROWS $Rows"), s"row count line missing:\n$out")
    val schemaLine = lines.find(_.startsWith("SCHEMA "))
      .getOrElse(fail(s"schema line missing:\n$out"))
    // Types as pyarrow sees them — the wire really carried Arrow
    // types, not strings (timestamp keeps the UTC tz FeatherSink
    // stamps per Spark session-UTC semantics).
    Seq("id:int64", "i32:int32", "s:string", "d:double", "b:binary",
        "ts_us:int64", "ts:timestamp[us, tz=UTC]",
        "t6:time64[us]").foreach { t =>
      assert(schemaLine.contains(t), s"schema missing $t: $schemaLine")
    }

    // Canonical expected lines from the JVM-side rows, same encoding.
    val collected = df.collect()
    val expected: Map[String, String] = Map(
      "id" -> collected.map(_.getLong(0).toString),
      "i32" -> collected.map(_.getInt(1).toString),
      "s" -> collected.map(r =>
        if (r.isNullAt(2)) "NULL" else r.getString(2)),
      "d" -> collected.map(r => "%.6f".formatLocal(java.util.Locale.ROOT,
        r.getDouble(3))),
      "b" -> collected.map(r => r.getAs[Array[Byte]](4)
        .map("%02x".format(_)).mkString),
      // the timestamp column's truth is its own micros source
      "ts_us" -> collected.map(_.getLong(5).toString),
      "ts" -> collected.map(_.getLong(5).toString),
      // TIME canonicalized to µs-of-day on both sides (python
      // str(time) and LocalTime.toString render zero-seconds
      // differently — integers don't lie)
      "t6" -> collected.map(r =>
        if (r.isNullAt(8)) "NULL" else r.getLong(7).toString)
    ).map { case (k, vs) => k -> vs.mkString(",") }

    expected.foreach { case (colName, want) =>
      assert(byName.get(colName).contains(want),
        s"$colName: pyarrow read differs\n  got  ${byName.get(colName)}" +
          s"\n  want $want")
    }
  }

  test("pyarrow consumption of a corpus query result (README recipe " +
    "end-to-end)") {
    assume(pythonOk, "python3 with pyarrow not available")
    val df = graft.sources.Corpus.read(spark, TestSpark.sf, "nation")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
    val bytes = Flaco.collectAsArrowStream(df)
    val dir = Files.createTempDirectory("pyarrow-parity2")
    val ipcPath = dir.resolve("nation.arrows")
    val scriptPath = dir.resolve("reader.py")
    Files.write(ipcPath, bytes)
    Files.writeString(scriptPath, ReaderScript)
    val proc = new ProcessBuilder("python3", scriptPath.toString,
        ipcPath.toString)
      .redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    assert(proc.waitFor() == 0, s"pyarrow reader failed:\n$out")
    val rows = df.collect()
    assert(out.linesIterator.contains(s"NROWS ${rows.length}"))
    val names = rows.map(_.getString(1)).mkString(",")
    assert(out.linesIterator.exists(_ == s"n_name=$names"),
      s"n_name values differ:\n$out")
  }
}
