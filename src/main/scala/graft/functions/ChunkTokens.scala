package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Context-window chunking UDTF — a genuine Catalyst [[Generator]]
  * (the table-function extension point `explode`/`posexplode`/`inline`
  * are built on), not an explode over a pre-built array. The
  * distinction matters at scale: an explode formulation first
  * MATERIALIZES every chunk string into one array value per document
  * (peak memory ∝ document size × overlap factor, all live at once
  * inside a single row), while a Generator emits chunk rows one at a
  * time from the token array with no intermediate per-document
  * collection. This is the standard LLM-training preprocessing step —
  * split each document into fixed-token windows with overlap (stride <
  * window) so no boundary context is lost — and the one place a row
  * blow-up is the OUTPUT, not an implementation artifact.
  *
  * Window i covers tokens [i*stride, min(i*stride + chunk, n)): every
  * token position appears in at least one chunk, trailing windows may
  * be short, a document with no tokens emits no rows (same absence
  * semantics as the corpus explode formulations).
  *
  * Generators sit outside whole-stage codegen by design (GenerateExec
  * only fuses the built-in collection generators); the token-array
  * projection feeding this stays codegen'd, and the per-row work here
  * is a single pass over the token bytes.
  */
case class ChunkTokens(child: Expression, chunkTokens: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"chunk_tokens expects array<string>, got ${other.sql}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("n_chunk_toks", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val n = arr.numElements()
    if (n == 0) return Nil
    // Lazy: GenerateExec pulls this iterator row by row, so only ONE
    // chunk string is live at a time — the incremental-emission claim
    // in the scaladoc holds because nothing here pre-buffers chunks.
    val nChunks = ((n - 1) / stride) + 1
    Iterator.range(0, nChunks).map { c =>
      val start = c * stride
      val end = math.min(start + chunkTokens, n)
      val sb = new java.lang.StringBuilder()
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(arr.getUTF8String(i).toString)
        i += 1
      }
      InternalRow(c.toLong, (end - start).toLong,
        UTF8String.fromString(sb.toString))
    }
  }

  override def prettyName: String = "chunk_tokens"

  override protected def withNewChildInternal(newChild: Expression): ChunkTokens =
    copy(child = newChild)
}

object ChunkTokens {

  /** DataFrame-side handle: `df.select(col("doc_id"), chunkTokens(...))`
    * — the analyzer's ExtractGenerator moves the generator out of the
    * Project into a Generate node, yielding the [[ChunkTokens
    * .elementSchema]] columns alongside the untouched ones.
    */
  def chunkTokens(tokens: Column, chunk: Int, stride: Int): Column =
    GraftSqlBridge.column(
      ChunkTokens(GraftSqlBridge.expression(tokens), chunk, stride))
}
