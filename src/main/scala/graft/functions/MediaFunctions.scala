package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real media-container byte arithmetic for the multimodal path: the
  * container has no codec LIBRARIES, but PNG and BMP headers are pure
  * byte layout — so the engine builds genuinely-headered payloads
  * (PNG signature + IHDR with a real CRC32; BMP file + info headers)
  * around opaque content bytes, and the decode side parses the
  * dimensions back out of the header bytes. Encode and decode are
  * independent directions of the same published layout (the q46
  * INTERVAL pattern): the wrap writes big-endian IHDR fields per the
  * PNG spec and little-endian BITMAPINFOHEADER fields per the BMP
  * spec, and the parser reads them back with no shared code path.
  */
object MediaKernel {

  val PngSignature: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  /** PNG header overhead: 8 signature + 25 IHDR chunk (4 length,
    * 4 type, 13 data, 4 CRC).
    */
  val PngHeaderBytes = 33

  /** BMP header overhead: 14 BITMAPFILEHEADER + 40 BITMAPINFOHEADER. */
  val BmpHeaderBytes = 54

  /** Deterministic fixture dimensions (mirrored arithmetically by the
    * DuckDB oracle): the wrap stamps these into the header, the
    * parser recovers them from bytes alone.
    */
  def widthOf(docId: Long): Int = (64 + docId % 577).toInt
  def heightOf(docId: Long): Int = (64 + docId % 417).toInt

  private def beInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
    out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
  }

  private def leInt(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
  }

  /** Wrap content bytes in a real container header: even ids → PNG
    * (signature + IHDR: width/height big-endian, 8-bit RGBA, real
    * CRC32 over type+data), odd ids → BMP (BM file header + 40-byte
    * info header: width/height little-endian i32, 24 bpp). The
    * content stands in for the compressed pixel stream.
    */
  def wrap(docId: Long, content: Array[Byte]): Array[Byte] =
    wrapDims(docId % 2 == 0, widthOf(docId), heightOf(docId), content)

  /** The header-assembly half with explicit dimensions — shared by
    * the fixture wrap and the resize transform (which re-wraps the
    * same content under new dims).
    */
  def wrapDims(png: Boolean, w: Int, h: Int,
      content: Array[Byte]): Array[Byte] = {
    if (png) {
      val out = new Array[Byte](PngHeaderBytes + content.length)
      System.arraycopy(PngSignature, 0, out, 0, 8)
      beInt(out, 8, 13)                       // IHDR data length
      out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
      beInt(out, 16, w)
      beInt(out, 20, h)
      out(24) = 8                             // bit depth
      out(25) = 6                             // color type RGBA
      // compression / filter / interlace = 0 (already zeroed)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 12, 4 + 13)             // over type + data per spec
      beInt(out, 29, crc.getValue.toInt)
      System.arraycopy(content, 0, out, PngHeaderBytes, content.length)
      out
    } else {
      val out = new Array[Byte](BmpHeaderBytes + content.length)
      out(0) = 'B'; out(1) = 'M'
      leInt(out, 2, BmpHeaderBytes + content.length)  // file size
      leInt(out, 10, BmpHeaderBytes)          // pixel-data offset
      leInt(out, 14, 40)                      // info-header size
      leInt(out, 18, w)
      leInt(out, 22, h)
      out(26) = 1                             // planes
      out(28) = 24                            // bits per pixel
      System.arraycopy(content, 0, out, BmpHeaderBytes, content.length)
      out
    }
  }

  /** Fit (w, h) into a `box`×`box` square preserving aspect ratio,
    * downscale only — exact integer arithmetic (floor division), so
    * the DuckDB oracle reproduces it with `//`.
    */
  def fitInto(w: Int, h: Int, box: Int): (Int, Int) =
    if (math.max(w, h) <= box) (w, h)
    else if (w >= h) (box, (h.toLong * box / w).toInt)
    else ((w.toLong * box / h).toInt, box)

  /** Parsed header metadata: (width, height, format). Bytes that
    * match no known magic — or are too short for their format's
    * header — parse as ("unknown", 0, 0) rather than throwing: a
    * corrupt payload in a 100 TB corpus must degrade to a filterable
    * row, not fail the job. CRC is not validated (dimension recovery,
    * not integrity checking).
    */
  def parse(payload: Array[Byte]): (Int, Int, String) = {
    if (payload.length >= PngHeaderBytes &&
        (0 until 8).forall(i => payload(i) == PngSignature(i))) {
      val w = ((payload(16) & 0xff) << 24) | ((payload(17) & 0xff) << 16) |
        ((payload(18) & 0xff) << 8) | (payload(19) & 0xff)
      val h = ((payload(20) & 0xff) << 24) | ((payload(21) & 0xff) << 16) |
        ((payload(22) & 0xff) << 8) | (payload(23) & 0xff)
      (w, h, "png")
    } else if (payload.length >= BmpHeaderBytes &&
        payload(0) == 'B' && payload(1) == 'M') {
      val w = (payload(18) & 0xff) | ((payload(19) & 0xff) << 8) |
        ((payload(20) & 0xff) << 16) | ((payload(21) & 0xff) << 24)
      val h = (payload(22) & 0xff) | ((payload(23) & 0xff) << 8) |
        ((payload(24) & 0xff) << 16) | ((payload(25) & 0xff) << 24)
      (w, h, "bmp")
    } else (0, 0, "unknown")
  }
}

/** `media_wrap(docId, contentBytes)` → the content wrapped in a real
  * PNG/BMP header ([[MediaKernel.wrap]]) — the fixture-payload
  * builder as a codegen'd scan-projection expression, so q32's
  * byte-level stats run over the same payload column the typed
  * decode path consumes.
  */
case class MediaWrap(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, BinaryType)
  override def dataType: DataType = BinaryType

  override def nullSafeEval(id: Any, content: Any): Any =
    MediaKernel.wrap(id.asInstanceOf[Long], content.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.MediaKernel.wrap($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `avg_hash64(content)` → the 64-bit average-hash (aHash) perceptual
  * fingerprint of a byte buffer: the buffer is divided into 64
  * contiguous cells (the byte-stream analogue of downscaling an image
  * to 8×8), bit (63−i) is set iff cell i's byte sum is above the
  * global mean — stated as the EXACT integer compare
  * `cell_sum · 64 > total` so no float mean exists. Small content
  * edits perturb few cells, so near-duplicate media land within a
  * small Hamming distance — the property perceptual dedup exploits.
  * One tight loop per payload ([[SignBits64]]'s lesson: per-row loops
  * belong in kernel expressions, not wide expression trees).
  */
object AvgHashKernel {
  def avgHash64(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = new Array[Long](64)
    var i = 0
    while (i < n) {
      cells(((i.toLong * 64) / n).toInt) += (bytes(i) & 0xff).toLong
      i += 1
    }
    var total = 0L
    var j = 0
    while (j < 64) { total += cells(j); j += 1 }
    var acc = 0L
    j = 0
    while (j < 64) {
      if (cells(j) * 64 > total) acc |= 1L << (63 - j)
      j += 1
    }
    acc
  }
}

case class AvgHash64(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    AvgHashKernel.avgHash64(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AvgHashKernel.avgHash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MediaFunctions {
  import GraftSqlBridge.{column, expression}

  def media_wrap(docId: Column, content: Column): Column =
    column(MediaWrap(expression(docId), expression(content)))

  def avg_hash64(content: Column): Column =
    column(AvgHash64(expression(content)))
}
