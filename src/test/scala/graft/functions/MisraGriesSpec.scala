package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Pins for the Misra–Gries heavy-hitter sketch: the superset guarantee
  * (every token with count > N/(k+1) survives) under sequential reduce AND
  * under adversarial merge trees, the never-overestimate bound, the
  * capacity cap, and the UDAF plumbing through a real grouped aggregate.
  */
class MisraGriesSpec extends AnyFunSuite with SparkTestSession {

  private def exact(stream: Seq[String]): Map[String, Long] =
    stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  /** Zipf-flavored random stream over a vocab larger than the capacity. */
  private def stream(rnd: Random, n: Int, vocab: Int): Seq[String] =
    Seq.fill(n) {
      // token i drawn with weight ~ 1/(i+1): a few heavy, a long tail
      val u = rnd.nextDouble()
      val i = math.min(vocab - 1, (math.exp(u * math.log(vocab.toDouble)) - 1).toInt)
      s"t$i"
    }

  test("sequential reduce keeps every token above N/(k+1) and never overestimates") {
    val k = 8
    val agg = new MisraGriesAggregator(k)
    for (seed <- Seq(1, 2, 3, 4, 5)) {
      val rnd = new Random(seed)
      val s = stream(rnd, 5000, 40)
      val sketch = s.foldLeft(agg.zero)(agg.reduce)
      assert(sketch.size <= k, s"seed $seed: capacity exceeded (${sketch.size})")
      val truth = exact(s)
      val threshold = s.size.toLong / (k + 1)
      truth.foreach { case (t, c) =>
        if (c > threshold)
          assert(sketch.contains(t), s"seed $seed: heavy token $t (count $c > $threshold) lost")
        assert(sketch.getOrElse(t, 0L) <= c, s"seed $seed: $t overestimated")
      }
    }
  }

  test("random merge trees preserve the superset guarantee") {
    val k = 8
    val agg = new MisraGriesAggregator(k)
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new Random(seed)
      val s = stream(rnd, 6000, 40)
      // split into uneven chunks, sketch each, merge in shuffled pair order
      val chunks = {
        var rest = s; val out = Seq.newBuilder[Seq[String]]
        while (rest.nonEmpty) {
          val take = 1 + rnd.nextInt(900)
          out += rest.take(take); rest = rest.drop(take)
        }
        out.result()
      }
      var sketches = rnd.shuffle(chunks.map(c => c.foldLeft(agg.zero)(agg.reduce)))
      while (sketches.size > 1)
        sketches = sketches.grouped(2).map {
          case Seq(a, b) => agg.merge(a, b)
          case Seq(a)    => a
        }.toSeq
      val merged = sketches.head
      assert(merged.size <= k)
      val truth = exact(s)
      val threshold = s.size.toLong / (k + 1)
      truth.foreach { case (t, c) =>
        if (c > threshold)
          assert(merged.contains(t), s"seed $seed: heavy token $t (count $c > $threshold) lost in merge")
        assert(merged.getOrElse(t, 0L) <= c, s"seed $seed: $t overestimated after merge")
      }
    }
  }

  test("merge with empty buffers and exact-when-vocab-fits behavior") {
    val agg = new MisraGriesAggregator(4)
    val a = Seq("x", "y", "x").foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, agg.zero) === a)
    assert(agg.merge(agg.zero, a) === a)
    // vocab (2) <= k (4): the sketch is the exact census
    assert(a === Map("x" -> 2L, "y" -> 1L))
  }

  test("UDAF runs as a grouped aggregate and proposes a heavy superset per group") {
    import spark.implicits._
    val k = 4
    val rows =
      (1 to 60).map(i => ("g1", if (i % 3 == 0) "heavy" else s"rare$i")) ++
      (1 to 40).map(i => ("g2", if (i % 2 == 0) "dom" else s"tail$i"))
    val mg = F.udaf(new MisraGriesAggregator(k), Encoders.STRING)
    val out = rows.toDF("g", "token")
      .groupBy($"g").agg(mg($"token").as("sk"))
      .collect().map(r => r.getString(0) -> r.getMap[String, Long](1)).toMap
    // g1: "heavy" has 20 of 60 > 60/5=12 -> must be present
    assert(out("g1").contains("heavy"))
    // g2: "dom" has 20 of 40 > 40/5=8 -> must be present
    assert(out("g2").contains("dom"))
    assert(out.values.forall(_.size <= k))
  }

  test("q93 sketch-then-verify equals the direct exact census (determinism pin)") {
    // the sketch's surplus candidates depend on merge order; the exact
    // second pass must erase that nondeterminism completely
    val dir = "/root/testdata/sf0.001"
    val got = graft.operators.FunctionQueries.q93HeavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val tokens = graft.operators.Tables.documents(spark, dir)
      .filter(F.col("text").isNotNull)
      .select(F.col("doc_id"), F.col("lang"),
        F.explode(F.split(F.col("text"), " ")).as("token"))
      .filter(F.col("token") =!= "")
    val totals = tokens.groupBy("lang").agg(F.count(F.lit(1)).as("n_total"))
    val expected = tokens.groupBy("lang", "token")
      .agg(F.count(F.lit(1)).as("n_occ"), F.countDistinct(F.col("doc_id")).as("n_docs"))
      .join(totals, "lang")
      .filter(F.col("n_occ") * 100 > F.col("n_total"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "corpus should surface heavy hitters")
  }

  test("sketch-then-verify is stable across shuffle-partition counts on a Zipf corpus") {
    // the MG sketch is merge-order-dependent BY DESIGN: changing the
    // partition count changes which surplus candidates survive pass 1.
    // The exact second pass must make the FINAL answer identical anyway —
    // run the full two-pass pipeline under 1, 7, and 200 shuffle
    // partitions over an adversarial Zipf stream (hot head exactly at the
    // reporting threshold, long tail churning the buffer) and require
    // set-identical results (VERDICT r8 #9).
    import spark.implicits._
    val rnd = new Random(42)
    val rows = (1 to 3) flatMap { g =>
      // per group: one token at ~2× threshold, one just above, heavy tail
      val hot = Seq.fill(400)(s"g${g}_hot") ++ Seq.fill(110)(s"g${g}_edge")
      val tail = Seq.fill(9490)(s"g${g}_t${rnd.nextInt(3000)}")
      rnd.shuffle(hot ++ tail).map(t => (s"lang$g", t))
    }
    val df = rows.toDF("lang", "token").repartition(17)
    val k = 128
    def runOnce(parts: Int): Set[(String, String, Long)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try {
        val mg = F.udaf(new MisraGriesAggregator(k), Encoders.STRING)
        val sketches = df.groupBy("lang")
          .agg(mg(F.col("token")).as("sketch"), F.count(F.lit(1)).as("n_total"))
        val candidates = sketches
          .select(F.col("lang"), F.explode(F.map_keys(F.col("sketch"))).as("token"))
        val totals = sketches.select(F.col("lang"), F.col("n_total"))
        df.join(F.broadcast(candidates), Seq("lang", "token"))
          .groupBy("lang", "token").agg(F.count(F.lit(1)).as("n_occ"))
          .join(F.broadcast(totals), "lang")
          .filter(F.col("n_occ") * 100 > F.col("n_total"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val results = Seq(1, 7, 200).map(p => p -> runOnce(p))
    val exactTruth = rows.groupBy(identity).collect {
      case ((lang, tok), xs) if xs.size * 100L > rows.count(_._1 == lang) =>
        (lang, tok, xs.size.toLong)
    }.toSet
    results.foreach { case (p, got) =>
      assert(got === exactTruth, s"partition count $p diverged from exact truth")
    }
    assert(exactTruth.exists(_._2.endsWith("_hot")), "hot tokens must be reported")
    assert(exactTruth.exists(_._2.endsWith("_edge")), "edge tokens must be reported")
  }
}
