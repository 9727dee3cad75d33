package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal — the classic "does this text
  * carry information?" detector (a RedPajama-v2 / Dolma signal-family
  * member the length/punctuation/stopword stats can't replace):
  * templated boilerplate, keyword stuffing, and generator spam
  * compress far below natural prose, while base64/binary junk barely
  * compresses at all — so BOTH tails of the ratio flag junk, and the
  * signal is robust to the surface tricks (synonym swaps, entity
  * renames) that fool token-level repetition counters because DEFLATE
  * matches raw byte runs.
  *
  * ==Declared semantics==
  * `deflate_ratio(text)` = `len(deflate(utf8(text), level 6,
  * nowrap)) · 2²⁰ div len(utf8(text))` — an integer fixed-point ratio
  * in units of 1/2²⁰ (the [[Exact]] grid posture: engine-portable,
  * golden-pinnable; float division would not be). Empty text → null
  * (no bytes, no evidence — callers quarantine or pass). DEFLATE
  * output for a fixed level/strategy is deterministic for a given
  * zlib implementation — the signature is pinned by committed goldens
  * and regenerates via `GRAFT_REGEN_GOLDEN` if the JDK's zlib ever
  * changes (declared, same posture as the image-decode goldens).
  *
  * ==Why an Expression==
  * The kernel allocates a `Deflater` per ROW if written naively; the
  * shared kernel reuses a thread-local instance (Deflater is
  * JNI-backed — per-row allocation is a malloc + finalizer storm at
  * 100 TB). Stays inside whole-stage codegen via `defineCodeGen`;
  * cost is the deflate itself, a map over the scan. */
case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratio(input.asInstanceOf[UTF8String])

  // empty input yields null — propagate into isNull (boxed Long from
  // the kernel; unbox on the non-null path)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long r = graft.functions.DeflateRatio.ratio($c);
      ${ev.isNull} = r == null;
      ${ev.value} = ${ev.isNull} ? -1L : r.longValue();
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : DeflateRatio = copy(child = newChild)
}

object DeflateRatio {

  /** Column API: `deflate_ratio(text)` → BIGINT ratio ·2²⁰, null on
    * empty/null text. */
  def deflateRatio(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))

  private val Scale = 1L << 20

  // Deflater is JNI-backed: reuse one per thread (reset between
  // rows), never one per row
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true) // nowrap: no zlib header
  }

  /** Shared interpreted/codegen kernel: boxed so callers can see the
    * empty-input null. */
  def ratio(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    if (bytes.length == 0) return null
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var compressed = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) compressed += d.deflate(buf)
    java.lang.Long.valueOf(compressed * Scale / bytes.length)
  }
}
