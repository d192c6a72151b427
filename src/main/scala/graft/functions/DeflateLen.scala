package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string's UTF-8 bytes — the
  * building block of the compression-ratio quality signal (a low
  * compressed/raw ratio flags templated/repetitive text; used alongside
  * the Gopher repetition heuristics in public pipeline descriptions,
  * e.g. Rae et al. 2021, arXiv:2112.11446). Deterministic: level-6
  * zlib DEFLATE of the exact UTF-8 bytes, no dictionary — the same
  * bytes always compress to the same length on any JVM (java.util.zip
  * wraps the bundled zlib with fixed parameters).
  *
  * A native expression rather than a UDF so the per-doc map stays
  * inside whole-stage codegen (the generated code calls the static
  * kernel below — the same shape Spark's own `XxHash64` uses for its
  * non-inlinable kernel).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len requires string, got $t")
    }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compressedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateLen.compressedLength($c)")

  override def prettyName: String = "graft_deflate_len"

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  /** Static kernel shared by eval and codegen: DEFLATE (level 6, zlib
    * wrapper) the UTF-8 bytes, return the compressed length. A fresh
    * Deflater per call keeps the expression stateless and thread-safe;
    * the allocation is dwarfed by the compression itself.
    */
  def compressedLength(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
