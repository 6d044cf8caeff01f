package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q94 (unigram-LM perplexity split): rare-token documents must
  * score strictly higher cross-entropy than common-token documents, the
  * tercile buckets must follow the H ordering, and H must match a direct
  * JVM recomputation (the sequential-fold determinism contract). */
class PerplexitySpec extends AnyFunSuite with SparkTestSession {

  test("q94 orders rare-token docs above common-token docs and buckets by H") {
    val out = TextQueries.q94Perplexity(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.nonEmpty)
    // buckets partition ~evenly and respect the (h, doc_id) order
    val byBucket = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byBucket.keySet === Set(1, 2, 3))
    assert(byBucket.values.max - byBucket.values.min <= 1)
    val sorted = out.sortBy(r => (r._3, r._1))
    assert(sorted.map(_._4).toSeq === sorted.map(_._4).toSeq.sorted,
      "bucket must be monotone in (h_nats, doc_id) order")
  }

  test("q94 H matches a direct recomputation on sf0.001") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("text IS NOT NULL").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.split(" ").exists(_.nonEmpty))
    val allToks = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
    val counts = allToks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val n = allToks.length.toDouble
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val sumLn = toks.foldLeft(0.0)((a, t) => a + math.log(counts(t).toDouble))
      id -> BigDecimal(math.log(n) - sumLn / toks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = TextQueries.q94Perplexity(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, h) =>
      assert(math.abs(h - expected(id)) < 1e-9, s"doc $id: $h vs ${expected(id)}")
    }
  }
}
