package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins for the bounded k-smallest-distinct aggregate behind q86:
  * the buffer-bound invariant (state ≤ k in reduce AND merge — the
  * VERDICT r8 #1 contract), distinct semantics, merge-order
  * independence, and end-to-end agreement with sort-then-take truth. */
class LowestKSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("reduce never grows the buffer past k and keeps it sorted-distinct") {
    val agg = new LowestKAggregator(5)
    val rnd = new Random(7)
    var buf = agg.zero
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    (1 to 10000).foreach { _ =>
      val v = rnd.nextLong() % 1000
      seen += v
      buf = agg.reduce(buf, v)
      assert(buf.length <= 5)
      assert(buf.sameElements(buf.distinct.sorted))
    }
    assert(buf.toSeq === seen.distinct.sorted.take(5))
  }

  test("merge is bounded at k, deduplicates, and matches union truth") {
    val agg = new LowestKAggregator(4)
    val a = Array(1L, 3L, 5L, 7L)
    val b = Array(2L, 3L, 6L, 9L)
    val m = agg.merge(a, b)
    assert(m.toSeq === Seq(1L, 2L, 3L, 5L))
    assert(agg.merge(a, agg.zero).toSeq === a.toSeq)
    assert(agg.merge(agg.zero, b).toSeq === b.toSeq)
  }

  test("merge-tree shape cannot change the result (mergeable-summary law)") {
    val agg = new LowestKAggregator(3)
    val rnd = new Random(11)
    val parts = Seq.fill(8)(Array.fill(rnd.nextInt(6))(rnd.nextLong() % 40))
    val bufs = parts.map(_.foldLeft(agg.zero)(agg.reduce))
    val leftFold = bufs.reduceLeft(agg.merge)
    val pairTree = bufs.grouped(2).map(g => g.reduce(agg.merge)).reduce(agg.merge)
    val truth = parts.flatten.distinct.sorted.take(3)
    assert(leftFold.toSeq === truth.toSeq)
    assert(pairTree.toSeq === truth.toSeq)
  }

  test("as a grouped Spark aggregate it equals sort-distinct-take truth") {
    val rnd = new Random(3)
    val rows = Seq.tabulate(5000)(i => (s"g${i % 7}", rnd.nextLong() % 500))
    val df = rows.toDF("g", "v").repartition(13)
    val got = df.groupBy($"g")
      .agg(LowestKAggregator.column(6)($"v").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(6)
    }
    assert(got.view.mapValues(_.toSeq).toMap === want)
  }
}
