package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed UDAF — the mergeable
  * heavy-hitter summary (Misra & Gries 1982; mergeability per Agarwal et
  * al., "Mergeable Summaries", PODS 2012).
  *
  * Invariant carried by both `reduce` and `merge`: for every token t,
  *   trueCount(t) - weightProcessed/(k+1)  <=  sketch(t)  <=  trueCount(t)
  * so ANY token with true count > N/(k+1) has a strictly positive entry in
  * the final sketch — the sketch is a guaranteed SUPERSET of the
  * heavy-hitter set at threshold N/(k+1). q93 exploits exactly that: the
  * sketch proposes candidates (<= k of them, a bounded broadcast), a
  * second exact pass counts only the candidates, and an exact-count filter
  * keeps the final answer deterministic even though the sketch's surplus
  * entries depend on partition/merge order.
  *
  * reduce: classic MG — increment if present; insert if < k entries;
  * otherwise decrement ALL entries by 1 (amortized O(1) per token via the
  * O(k) sweep paid at most once per k increments). merge: add counts, then
  * if over k entries subtract the (k+1)-largest count from every entry and
  * drop the non-positive ones — the offset trick that preserves the error
  * bound additively across arbitrary merge trees, which is what makes this
  * a real distributed partial aggregate (map-side partials on every
  * executor, one tiny buffer per group on the shuffle).
  *
  * Buffer is a Map[String,Long] capped at k entries (~k * avg-token bytes;
  * k=64 → a few KiB), so a groupBy over billions of rows shuffles only
  * |groups| * k entries — the 100 TB shape for "top tokens per language".
  *
  * Allocation cost (ADVICE r8, accepted trade): `reduce` returns a fresh
  * immutable Map per input row (`updated` is O(log k) path-copying; the
  * rare decrement branch rebuilds all k entries, amortized O(1)/token by
  * the k-increments-per-sweep argument). A mutable HashMap buffer would
  * cut the per-token allocation but forces a Kryo/ObjectType encoder in
  * place of the ExpressionEncoder, and q93's wall-clock is dominated by
  * the upstream explode + shuffle, not this buffer — so the simpler
  * value-semantics buffer stays until a profile says otherwise.
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, s"capacity must be positive: $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], token: String): Map[String, Long] =
    b.get(token) match {
      case Some(c) => b.updated(token, c + 1L)
      case None if b.size < k => b.updated(token, 1L)
      case None =>
        // decrement-all: drops the k-way "everything else" weight
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val sum = b.foldLeft(a) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everyone; <= k survive
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.flatMap { case (t, c) => if (c > cut) Some(t -> (c - cut)) else None }
      }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
