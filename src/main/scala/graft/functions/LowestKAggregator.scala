package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact k-smallest-DISTINCT-values aggregate with a buffer that is
  * bounded at k entries in `zero`, `reduce`, AND `merge` — the typed
  * partial aggregate behind q86's per-domain cap.
  *
  * Why this exists (VERDICT r8 #1): the previous q86 phase used
  * `collect_list → sort_array → slice`, whose aggregation buffer is
  * unbounded — the slice runs only on the COMPLETED list, so a hot
  * domain put all of its doc_ids into one merge buffer before any
  * truncation. This aggregator makes the "state ≤ k everywhere" claim
  * true by construction: no code path ever holds more than k longs.
  *
  * Correctness of the bounded-distinct invariant: a value can belong to
  * the k smallest distinct values of the whole input only if it belongs
  * to the k smallest distinct values of every prefix/partition that
  * contains it, so discarding anything that falls outside the current
  * k-smallest set is lossless — the same argument that makes top-K a
  * mergeable summary (cf. Agarwal et al., "Mergeable Summaries", 2012;
  * here the summary is exact, not approximate).
  *
  * Because the buffer is distinct-valued, callers do NOT need an
  * upstream `.distinct()`: duplicate (value) inputs collapse inside the
  * map-side partial, which removes a whole shuffle from q86's plan.
  *
  * Buffer representation: a sorted `Array[Long]` of ≤ k entries
  * (k=5 in q86 → 40 bytes). Insertions are O(k) array copies, paid only
  * while a value actually enters the current k-smallest set — once a
  * partial has seen k small ids, the common case for a hot domain is a
  * single binary-search rejection per row. groupBy over billions of rows
  * shuffles |groups| × k longs; the final merge per group touches ≤ 2k
  * values at a time. That is the 100 TB shape.
  */
final class LowestKAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"capacity must be positive: $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, v)
    if (pos >= 0) b // already present — distinct semantics
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        // v displaces the current maximum; buffer stays at exactly k
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b // v >= current k-th smallest: cannot be in the answer
    }
  }

  /** Merge two sorted distinct arrays, keeping the k smallest distinct
    * values. Output length ≤ k always — the buffer never exceeds k even
    * transiently (the merge writes directly into a k-capped array). */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val take =
          if (i == a.length) { val x = b(j); j += 1; x }
          else if (j == b.length) { val x = a(i); i += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (a(i) > b(j)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x } // equal: emit once
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object LowestKAggregator {
  /** Untyped-column form for DataFrame `.agg` sites (q86/q88). */
  def column(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new LowestKAggregator(k), Encoders.scalaLong)
}
