package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY §2.C "UDAF" row): element-wise sum of
  * milli-quantized embedding vectors, the building block for label
  * centroids / IVF coarse quantizers over the embeddings table.
  *
  * Quantization (x -> round(x*1000) as Long) makes the aggregation exact
  * integer math: merge order cannot change the result, so distributed
  * partial aggregation is bit-deterministic — and DuckDB-checkable.
  *
  * Buffer is (elementwise sums, count); merge is O(dims). Registered via
  * `udaf(...)` this runs as a real two-phase HashAggregate at any scale.
  */
final case class CentroidBuffer(sums: Array[Long], n: Long)

object CentroidAggregator extends Aggregator[Seq[Float], CentroidBuffer, Seq[Long]] {

  override def zero: CentroidBuffer = CentroidBuffer(Array.empty, 0L)

  private def addInto(sums: Array[Long], v: Seq[Float]): Array[Long] = {
    val out = if (sums.isEmpty) new Array[Long](v.length) else sums
    require(out.length == v.length, s"dim mismatch: ${out.length} vs ${v.length}")
    var i = 0
    while (i < v.length) {
      // HALF_UP (away from zero), matching SimilarityQueries.quantizeExpr
      // and the DuckDB oracle's round(): math.round alone is
      // half-toward-+infinity, which diverges on negative exact halves
      // (-0.0625f * 1000 == -62.5 exactly -> -63, not -62)
      val d = v(i).toDouble * 1000
      out(i) += (if (d < 0) -math.round(-d) else math.round(d))
      i += 1
    }
    out
  }

  override def reduce(b: CentroidBuffer, v: Seq[Float]): CentroidBuffer =
    CentroidBuffer(addInto(b.sums, v), b.n + 1)

  override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      val out = a.sums.clone()
      var i = 0
      while (i < out.length) { out(i) += b.sums(i); i += 1 }
      CentroidBuffer(out, a.n + b.n)
    }
  }

  /** Milli-scaled mean per element (truncating integer division — exact,
    * engine-stable, and matching SQL integer `/` / DuckDB `//` semantics,
    * which truncate toward zero for negative sums; callers wanting floats
    * divide by 1000.0 downstream). */
  override def finish(b: CentroidBuffer): Seq[Long] =
    if (b.n == 0) Seq.empty else b.sums.toSeq.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuffer] = Encoders.product[CentroidBuffer]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
