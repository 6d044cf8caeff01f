package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: canonical dedup normalization of a STRING —
  * ASCII case-fold, strip everything outside [a-z0-9 ], collapse space runs,
  * trim — in ONE byte-level pass (the C4 / Lee et al. 2021 pre-dedup
  * normalization behind q89).
  *
  * Exactly equivalent to the declarative chain
  * `trim(regexp_replace(regexp_replace(translate(c, A-Z, a-z),
  * "[^a-z0-9 ]", ""), " +", " "))` — which is what the DuckDB oracle still
  * runs — but without two Java backtracking-regex passes per document
  * (VERDICT r9 #1: that chain was the engine's worst real constant factor,
  * 25× DuckDB at sf1.0). Byte-level is safe against multi-byte UTF-8: the
  * regex strips non-matching CODEPOINTS, and every byte of a multi-byte
  * codepoint is ≥ 0x80, i.e. individually outside [a-z0-9 ], so dropping
  * bytes one at a time deletes exactly the codepoints the regex deletes.
  * Space collapse + trim fold into the same pass via a pending-space flag:
  * a space is emitted only when a kept character follows it and output has
  * begun — so runs collapse, leading spaces never emit, and a trailing
  * space is left pending forever. Stays inside whole-stage codegen via a
  * static call (the [[WordNGrams]] pattern); allocates only the output.
  *
  * NULL in → NULL out; all-noise input → empty string (what trim returns).
  */
final case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(text: Any): Any =
    NormalizeText.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(c)))

  /** The shared kernel (called from both eval and generated code): one pass,
    * one output buffer (never longer than the input). */
  def compute(text: UTF8String): UTF8String = {
    val b = text.getBytes
    val len = b.length
    val out = new Array[Byte](len)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val c = b(i)
      if (c >= 'a' && c <= 'z' || c >= '0' && c <= '9') {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = c; n += 1
      } else if (c >= 'A' && c <= 'Z') {
        if (pendingSpace) { out(n) = ' '; n += 1; pendingSpace = false }
        out(n) = (c + 32).toByte; n += 1
      } else if (c == ' ') {
        if (n > 0) pendingSpace = true
      }
      // anything else (punctuation, control, every byte of a multi-byte
      // codepoint) drops — see class doc for why byte-wise == codepoint-wise
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }
}
