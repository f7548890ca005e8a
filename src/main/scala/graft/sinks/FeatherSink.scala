package graft.sinks

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.channels.{Channels, WritableByteChannel}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileWriter, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.FlacoSparkException

/** Feather (Arrow IPC File) sink — the Spark-native
  * `write_table_to_feather` (reference `src/lib.rs:150-168`). The
  * reference freezes the whole result into one in-memory chunk and
  * writes a single uncompressed IPC file; here we stream fixed-size
  * record batches (bounded memory — the reference's own TODO at
  * `src/lib.rs:75`) and, by default, write one IPC file per partition
  * in parallel (the 100 TB path). `singleFile = true` gives the
  * reference's one-file layout via a driver-side local iterator,
  * still batch-streamed.
  *
  * Built on Arrow-Java (`/opt/spark/jars/arrow-vector-18.3.0.jar`),
  * public API only.
  */
object FeatherSink {

  private val BatchRows = 4096

  /** Ceiling for [[write]]'s `singleFile` parity mode. That mode
    * streams the WHOLE result through the driver by design
    * (reference-layout parity) — correct for interchange-sized
    * results, catastrophic if invoked on a corpus-sized one by
    * accident. The guard fails fast with a typed error the moment
    * the budget is crossed (bytes actually written, not an estimate
    * — plan statistics are unreliable before execution), deletes the
    * partial file, and names the per-partition mode as the scale
    * path. Override per call for bigger deliberate exports.
    */
  val DefaultSingleFileByteBudget: Long = 4L << 30

  def write(df: DataFrame, path: String, singleFile: Boolean = false,
      singleFileByteBudget: Long = DefaultSingleFileByteBudget): Unit = {
    val schema = df.schema
    validate(schema)
    if (singleFile) {
      val it = df.toLocalIterator()
      try writeIterator(schema, it.asScala, path, singleFileByteBudget)
      catch { case e: Throwable =>
        new File(path).delete() // no truncated IPC file left behind
        throw e
      }
    } else {
      val dir = new File(path)
      dir.mkdirs()
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          writeIterator(schema, it, f"$path/part-$pid%05d.arrow")
        }
      }
    }
  }

  /** The whole result as Arrow IPC STREAM bytes — the in-memory
    * interchange contract of the reference's flagship
    * `read_sql_to_pyarrow` (reference `src/lib.rs:42-72`, which hands
    * a fully materialized table across the Arrow C Data Interface).
    * Driver-side by design: this is the "hand the result to a
    * Python/Arrow consumer" path, bounded by what one process can
    * hold — same contract and same limit as the reference; the
    * distributed paths (parquet/feather sinks, the DataFrame itself)
    * remain the 100 TB story. Batch-streamed via toLocalIterator, so
    * peak memory is one partition plus one 4096-row batch.
    */
  def collectAsArrowStream(df: DataFrame): Array[Byte] = {
    val schema = df.schema
    validate(schema)
    val bos = new ByteArrayOutputStream()
    writeRows(schema, df.toLocalIterator().asScala, Channels.newChannel(bos),
      stream = true)
    bos.toByteArray
  }

  private def validate(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case IntegerType | LongType | ShortType | ByteType | FloatType |
            DoubleType | StringType | BinaryType | BooleanType | DateType |
            TimestampType | TimestampNTZType => ()
        case _: TimeType => ()
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => ()
        case dt => throw new FlacoSparkException(
          s"Feather sink: type $dt (column ${f.name}) not supported")
      }
    }

  private def arrowField(f: StructField): Field = {
    def prim(t: ArrowType) =
      new Field(f.name, FieldType.nullable(t), null)
    f.dataType match {
      case IntegerType => prim(new ArrowType.Int(32, true))
      case LongType => prim(new ArrowType.Int(64, true))
      case ShortType => prim(new ArrowType.Int(16, true))
      case ByteType => prim(new ArrowType.Int(8, true))
      case FloatType => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
      case DoubleType => prim(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
      case StringType => prim(ArrowType.Utf8.INSTANCE)
      case BinaryType => prim(ArrowType.Binary.INSTANCE)
      case BooleanType => prim(ArrowType.Bool.INSTANCE)
      case DateType => prim(new ArrowType.Date(DateUnit.DAY))
      case TimestampType =>
        prim(new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC"))
      case TimestampNTZType =>
        prim(new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, null))
      case _: TimeType =>
        // The reference's own TIME output shape: Time64(Microsecond)
        // (src/lib.rs:350-366). Spark TIME(p≤6) values are µs-exact.
        prim(new ArrowType.Time(ArrowTimeUnit.MICROSECOND, 64))
      case ArrayType(elem, _) =>
        val child = arrowField(StructField("item", elem))
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          Seq(child).asJava)
      case dt => throw new FlacoSparkException(s"unsupported $dt")
    }
  }

  /** Stream `rows` into one IPC file at `file` in BatchRows chunks.
    * `byteBudget`, if finite, bounds the bytes actually written.
    */
  private def writeIterator(
      schema: StructType, rows: Iterator[Row], file: String,
      byteBudget: Long = Long.MaxValue): Unit = {
    val out = new FileOutputStream(file)
    try {
      if (byteBudget == Long.MaxValue)
        writeRows(schema, rows, out.getChannel, stream = false)
      else {
        val ch = new BudgetedChannel(out.getChannel, byteBudget)
        // The trip surfaces as IOException somewhere inside the Arrow
        // writer (possibly wrapped, possibly superseded by the
        // writer's own shutdown) — the flag, not the exception type,
        // is the reliable signal to translate into the typed error.
        try writeRows(schema, rows, ch, stream = false)
        catch { case e: Throwable =>
          if (ch.tripped) throw new FlacoSparkException(
            s"Feather singleFile output exceeded its $byteBudget-byte " +
              s"budget at $file. singleFile streams the whole result " +
              "through the driver (reference-parity layout); use the " +
              "default per-partition mode for large results, or raise " +
              "singleFileByteBudget deliberately.")
          throw e
        }
      }
    } finally out.close()
  }

  /** Counts bytes through to `inner`; crossing `budget` sets
    * [[tripped]] and refuses all further writes — fail-fast for the
    * driver-side singleFile parity path.
    */
  private final class BudgetedChannel(
      inner: WritableByteChannel, budget: Long)
      extends WritableByteChannel {
    private var written = 0L
    @volatile var tripped = false
    override def write(src: java.nio.ByteBuffer): Int = {
      if (tripped) throw new java.io.IOException("byte budget exceeded")
      val n = inner.write(src)
      written += n
      if (written > budget) {
        tripped = true
        throw new java.io.IOException("byte budget exceeded")
      }
      n
    }
    override def isOpen: Boolean = inner.isOpen
    override def close(): Unit = inner.close()
  }

  /** Stream `rows` into `ch` in BatchRows chunks, as the IPC file
    * format (Feather) or the IPC stream format (interchange).
    */
  private def writeRows(
      schema: StructType, rows: Iterator[Row], ch: WritableByteChannel,
      stream: Boolean): Unit = {
    val allocator = new RootAllocator()
    val arrowSchema = new Schema(schema.fields.map(arrowField).toSeq.asJava)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    val writer = if (stream) new ArrowStreamWriter(root, null, ch)
                 else new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      val buf = new Array[Row](BatchRows)
      while (rows.hasNext) {
        var n = 0
        while (n < BatchRows && rows.hasNext) { buf(n) = rows.next(); n += 1 }
        root.allocateNew()
        var c = 0
        while (c < schema.fields.length) {
          fillVector(root.getVector(c), schema.fields(c).dataType, buf, n, c)
          c += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
      }
      writer.end()
    } catch { case e: Throwable =>
      // writer.close() re-flushes through the (possibly tripped)
      // channel; don't let its secondary failure supersede the real
      // one or leak the root/allocator.
      try writer.close() catch { case _: Throwable => () }
      root.close(); allocator.close()
      throw e
    }
    writer.close(); root.close(); allocator.close()
  }

  private def fillVector(
      v: FieldVector, dt: DataType, rows: Array[Row], n: Int, c: Int): Unit = {
    var i = 0
    dt match {
      case IntegerType =>
        val vec = v.asInstanceOf[IntVector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getInt(c)); i += 1 }
      case LongType =>
        val vec = v.asInstanceOf[BigIntVector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getLong(c)); i += 1 }
      case ShortType =>
        val vec = v.asInstanceOf[SmallIntVector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getShort(c)); i += 1 }
      case ByteType =>
        val vec = v.asInstanceOf[TinyIntVector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getByte(c)); i += 1 }
      case FloatType =>
        val vec = v.asInstanceOf[Float4Vector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getFloat(c)); i += 1 }
      case DoubleType =>
        val vec = v.asInstanceOf[Float8Vector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, rows(i).getDouble(c)); i += 1 }
      case StringType =>
        val vec = v.asInstanceOf[VarCharVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else vec.setSafe(i, rows(i).getString(c).getBytes("UTF-8"))
          i += 1
        }
      case BinaryType =>
        val vec = v.asInstanceOf[VarBinaryVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else vec.setSafe(i, rows(i).getAs[Array[Byte]](c))
          i += 1
        }
      case BooleanType =>
        val vec = v.asInstanceOf[BitVector]
        while (i < n) { if (rows(i).isNullAt(c)) vec.setNull(i) else vec.setSafe(i, if (rows(i).getBoolean(c)) 1 else 0); i += 1 }
      case DateType =>
        val vec = v.asInstanceOf[DateDayVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else vec.setSafe(i, rows(i).getAs[Any](c) match {
            case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
            case d: java.time.LocalDate => d.toEpochDay.toInt
          })
          i += 1
        }
      case TimestampType =>
        val vec = v.asInstanceOf[TimeStampMicroTZVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else vec.setSafe(i, rows(i).getAs[Any](c) match {
            case t: java.sql.Timestamp =>
              t.getTime * 1000L + (t.getNanos % 1000000) / 1000
            case t: java.time.Instant =>
              t.getEpochSecond * 1000000L + t.getNano / 1000
          })
          i += 1
        }
      case TimestampNTZType =>
        val vec = v.asInstanceOf[TimeStampMicroVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else {
            val ldt = rows(i).getAs[java.time.LocalDateTime](c)
            val micros = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
              ldt.getNano / 1000
            vec.setSafe(i, micros)
          }
          i += 1
        }
      case _: TimeType =>
        val vec = v.asInstanceOf[TimeMicroVector]
        while (i < n) {
          if (rows(i).isNullAt(c)) vec.setNull(i)
          else vec.setSafe(i,
            rows(i).getAs[java.time.LocalTime](c).toNanoOfDay / 1000L)
          i += 1
        }
      case ArrayType(elem, _) =>
        val vec = v.asInstanceOf[ListVector]
        val w = vec.getWriter
        while (i < n) {
          w.setPosition(i)
          if (rows(i).isNullAt(c)) w.writeNull()
          else {
            w.startList()
            val arr = rows(i).getSeq[Any](c)
            elem match {
              case FloatType => arr.foreach(x => w.float4.writeFloat4(x.asInstanceOf[Float]))
              case DoubleType => arr.foreach(x => w.float8.writeFloat8(x.asInstanceOf[Double]))
              case _ => throw new FlacoSparkException(s"list<$elem> unsupported")
            }
            w.endList()
          }
          i += 1
        }
        vec.setValueCount(n)
      case dt => throw new FlacoSparkException(s"unsupported $dt")
    }
  }
}
