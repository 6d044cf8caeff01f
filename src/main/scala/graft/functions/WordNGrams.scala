package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: space-delimited word n-grams of a STRING
  * column — the gram kernel behind the decontamination / repetition /
  * chunk-fingerprint family.
  *
  * Exactly equivalent to the declarative idiom
  * `transform(sequence(1, size(w) - n + 1), i -> concat_ws(' ', slice(w, i, n)))`
  * with `w = split(text, ' ')` (split keeps empty tokens, limit -1), but in
  * ONE byte-level pass: because the delimiter is a single ASCII space —
  * which UTF-8 guarantees never appears inside a multi-byte sequence — each
  * n-gram is a contiguous byte slice of the source string between two token
  * boundaries, so the kernel just scans for 0x20 once and emits zero-copy
  * slices. The higher-order-function chain is CodegenFallback (interpreted
  * lambda per element, per doc) and allocates a token array + per-gram
  * concat; this expression stays inside whole-stage codegen via a static
  * call (the [[NearestCellLong]] pattern) and allocates only the output.
  *
  * Returns fewer-than-n-token inputs as an EMPTY array (the callers'
  * `size(w) >= n` pre-filters become optional — explode drops empties).
  * NULL text yields NULL. `n` must be a foldable positive INT.
  */
final case class WordNGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
      right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, foldable INT), " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    WordNGrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, n) =>
      s"${ev.value} = graft.functions.WordNGrams.compute($text, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): WordNGrams = copy(left = newLeft, right = newRight)
}

object WordNGrams {

  /** Column-API entry point (n as a plan-time constant). */
  def apply(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(text),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(n))))
  }

  /** The shared kernel (called from both eval and generated code): one scan
    * for space positions, then one contiguous byte slice per gram. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val b = text.getBytes
    val len = b.length
    var tokens = 1
    var i = 0
    while (i < len) { if (b(i) == 0x20) tokens += 1; i += 1 }
    val grams = tokens - n + 1
    if (grams <= 0 || n < 1) return new GenericArrayData(Array.empty[Any])
    // starts(j) = byte offset where token j begins; ends(j) = exclusive end
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var tok = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (b(i) == 0x20) { ends(tok) = i; tok += 1; starts(tok) = i + 1 }
      i += 1
    }
    ends(tok) = len
    val out = new Array[Any](grams)
    var g = 0
    while (g < grams) {
      out(g) = UTF8String.fromBytes(b, starts(g), ends(g + n - 1) - starts(g))
      g += 1
    }
    new GenericArrayData(out)
  }
}
