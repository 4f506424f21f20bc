package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level tokenizer kernel: the same token rule as
  * [[Analyzer.tokenize]] (lowercase → split on non-alphanumeric → drop
  * empties → 255 cap) but operating directly on UTF-8 bytes for ASCII
  * input — no UTF-16 String materialization, no regex — with an exact
  * fallback to the regex path when any non-ASCII byte is present.
  * Tokenization is the dominant CPU + allocation cost of the index
  * build; this kernel exists to cut memory bandwidth, the measured
  * scaling limiter (see PLANS.md / BASELINE.md).
  *
  * Equivalence with the composed-builtins column and the Scala function
  * is property-tested (AnalyzerSpec).
  */
object TokenizeKernel {

  private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Static entry used from both eval and generated code. */
  def tokenize(input: UTF8String): ArrayData = {
    val n = input.numBytes()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // fallback for non-ASCII (needs Unicode \p{L}\p{N} classes)
    var i = 0
    var ascii = true
    while (i < n && ascii) {
      if (input.getByte(i) < 0) ascii = false
      i += 1
    }
    if (!ascii) {
      val toks = Analyzer.tokenize(input.toString)
      return new GenericArrayData(toks.map(UTF8String.fromString(_): Any))
    }
    // ASCII fast path: one lowercased copy of the bytes; tokens are
    // zero-copy slices over it
    val buf = new Array[Byte](n)
    i = 0
    while (i < n) {
      val b = input.getByte(i)
      buf(i) = if (b >= 'A' && b <= 'Z') (b + 32).toByte else b
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    i = 0
    while (i < n) {
      while (i < n && !isAlnum(buf(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && isAlnum(buf(i))) i += 1
        val len = math.min(i - start, Analyzer.MaxTokenLen)
        out += UTF8String.fromBytes(buf, start, len)
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native Catalyst expression wrapping [[TokenizeKernel]]; stays inside
  * whole-stage codegen (emits a static call).
  */
case class Tokenize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  protected override def nullSafeEval(input: Any): Any =
    TokenizeKernel.tokenize(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.TokenizeKernel.tokenize($c)")

  protected override def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)

  override def prettyName: String = "graft_tokenize"
}

object Tokenize {
  def col(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      Tokenize(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
