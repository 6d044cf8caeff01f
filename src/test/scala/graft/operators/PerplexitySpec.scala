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

  test("q109 Stupid Backoff: hand-computed seen and backoff terms") {
    import spark.implicits._
    // train (src0): "a b a c" -> uni a:2 b:1 c:1 (N=4, V=3);
    //   bigrams (a,b)(b,a)(a,c) each 1; left margins a:2 b:1.
    // doc 1 (in-domain): terms ln1-ln2, ln1-ln1, ln1-ln2 -> h = 2ln2/3.
    // doc 2 (crawl "a b z"): (a,b) = -ln2; (b,z) backoff, z unseen ->
    //   ln(2*(0+1)) - ln(5*(4+3)) = ln2 - ln35; h = ln35/2, oov 1.
    val docs = Seq(
      (1L, "src0", "a b a c"),
      (2L, "src42", "a b z")).toDF("doc_id", "source", "text")
    val got = TextQueries.bigramLmScores(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 3L, 0L, r6(2 * math.log(2) / 3)),
      (2L, 2L, 1L, r6(math.log(35) / 2))))
  }

  test("q109 matches a direct recomputation on sf0.001; curated docs never back off") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("text IS NOT NULL").select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val train = rows.filter(_._2.replace("src", "").toInt < 10).map(t => toks(t._3))
    val uni = train.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (nTot, vTot) = (train.flatten.length.toLong, uni.size.toLong)
    val cp = train.flatMap(tk => tk.zip(tk.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val ra = cp.toSeq.groupBy(_._1._1).map { case (a, xs) => a -> xs.map(_._2).sum }
    val expected = rows.flatMap { case (id, _, text) =>
      val tk = toks(text)
      if (tk.length < 2) None else {
        val terms = tk.zip(tk.drop(1)).map { case (a, b) =>
          cp.get((a, b)) match {
            case Some(c) => (math.log(c.toDouble) - math.log(ra(a).toDouble), 0L)
            case None => (math.log(2.0 * (uni.getOrElse(b, 0L) + 1)) -
              math.log(5.0 * (nTot + vTot)), 1L)
          }
        }
        val h = BigDecimal(-terms.foldLeft(0.0)(_ + _._1) / (tk.length - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> ((tk.length - 1).toLong, terms.map(_._2).sum, h))
      }
    }.toMap
    val got = TextQueries.q109BigramLm(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, oov, h)) =>
      val (en, eoov, eh) = expected(id)
      assert(n == en && oov == eoov, s"doc $id counts: ($n,$oov) vs ($en,$eoov)")
      assert(math.abs(h - eh) < 1e-9, s"doc $id: $h vs $eh")
    }
    // a curated doc's own bigrams are in the census by construction
    val curated = rows.filter(_._2.replace("src", "").toInt < 10).map(_._1).toSet
    assert(got.collect { case (id, (_, oov, _)) if curated(id) => oov }.forall(_ == 0L))
    // the crawl side genuinely exercises backoff on this corpus
    assert(got.exists { case (id, (_, oov, _)) => !curated(id) && oov > 0 })
  }

  test("q112 trigram Stupid Backoff: hand-computed terms at all three levels") {
    import spark.implicits._
    // train (src0 "a b a c"): uni a:2 b:1 c:1 (N=4, V=3);
    //   bigrams (a,b)(b,a)(a,c):1, rb a:2 b:1;
    //   trigrams (a,b,a)(b,a,c):1, rab (a,b):1 (b,a):1.
    // doc 1 (curated): both trigrams seen, terms ln1-ln1 = 0 -> h = 0.
    // doc 2 ("a b z"): trigram (a,b,z) unseen, bigram (b,z) unseen ->
    //   alpha^2 level: ln(4*(c(z)+1)) - ln(25*(N+V)) = ln4 - ln175; h = ln(175/4).
    // doc 3 ("b a b"): trigram (b,a,b) unseen, bigram (a,b) SEEN ->
    //   alpha level: ln(2*1) - ln(5*r_b(a)=10) = -ln5; h = ln5.
    val docs = Seq(
      (1L, "src0", "a b a c"),
      (2L, "src42", "a b z"),
      (3L, "src42", "b a b")).toDF("doc_id", "source", "text")
    val got = TextQueries.trigramLmScores(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 2L, 0L, 0L, r6(0.0)),
      (2L, 1L, 0L, 1L, r6(math.log(175.0 / 4))),
      (3L, 1L, 1L, 0L, r6(math.log(5)))))
  }

  test("q112 matches a direct recomputation on sf0.001; curated docs never back off at any level") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("text IS NOT NULL").select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val train = rows.filter(_._2.replace("src", "").toInt < 10).map(t => toks(t._3))
    val uni = train.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (nTot, vTot) = (train.flatten.length.toLong, uni.size.toLong)
    val cbg = train.flatMap(tk => tk.zip(tk.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val rb = cbg.toSeq.groupBy(_._1._1).map { case (b, xs) => b -> xs.map(_._2).sum }
    val ct = train.flatMap(tk => tk.lazyZip(tk.drop(1)).lazyZip(tk.drop(2)).toSeq)
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val rab = ct.toSeq.groupBy(g => (g._1._1, g._1._2))
      .map { case (ab, xs) => ab -> xs.map(_._2).sum }
    val expected = rows.flatMap { case (id, _, text) =>
      val tk = toks(text)
      if (tk.length < 3) None else {
        val terms = tk.lazyZip(tk.drop(1)).lazyZip(tk.drop(2)).toSeq.map { case (a, b, c) =>
          ct.get((a, b, c)) match {
            case Some(n) => (math.log(n.toDouble) - math.log(rab((a, b)).toDouble), 0L, 0L)
            case None => cbg.get((b, c)) match {
              case Some(n) => (math.log(2.0 * n) - math.log(5.0 * rb(b)), 1L, 0L)
              case None => (math.log(4.0 * (uni.getOrElse(c, 0L) + 1)) -
                math.log(25.0 * (nTot + vTot)), 0L, 1L)
            }
          }
        }
        val h = BigDecimal(-terms.foldLeft(0.0)(_ + _._1) / (tk.length - 2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> ((tk.length - 2).toLong, terms.map(_._2).sum, terms.map(_._3).sum, h))
      }
    }.toMap
    val got = TextQueries.q112TrigramLm(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, (n, bo1, bo2, h)) =>
      val (en, e1, e2, eh) = expected(id)
      assert(n == en && bo1 == e1 && bo2 == e2,
        s"doc $id counts: ($n,$bo1,$bo2) vs ($en,$e1,$e2)")
      assert(math.abs(h - eh) < 1e-9, s"doc $id: $h vs $eh")
    }
    // a curated doc's trigrams AND bigrams are in the censuses by construction
    val curated = rows.filter(_._2.replace("src", "").toInt < 10).map(_._1).toSet
    assert(got.collect { case (id, (_, b1, b2, _)) if curated(id) => b1 + b2 }
      .forall(_ == 0L))
    // the crawl side exercises BOTH backoff levels on this corpus
    assert(got.exists { case (id, (_, b1, _, _)) => !curated(id) && b1 > 0 })
    assert(got.exists { case (id, (_, _, b2, _)) => !curated(id) && b2 > 0 })
  }

  test("q116 domain mixture matches an exact fixed-point recomputation; crawl domains upweight") {
    val rows = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter("text IS NOT NULL").select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val train = rows.filter(_._2.replace("src", "").toInt < 10).map(t => toks(t._3))
    val uni = train.flatten.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (nTot, vTot) = (train.flatten.length.toLong, uni.size.toLong)
    val cp = train.flatMap(tk => tk.zip(tk.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val ra = cp.toSeq.groupBy(_._1._1).map { case (a, xs) => a -> xs.map(_._2).sum }
    // per-source EXACT fixed-point sums (the engine's own int64 encoding)
    val perSrc = rows.flatMap { case (_, src, text) =>
      val tk = toks(text)
      if (tk.length < 2) None else {
        val tsum = tk.zip(tk.drop(1)).map { case (a, b) =>
          val t = cp.get((a, b)) match {
            case Some(c) => math.log(c.toDouble) - math.log(ra(a).toDouble)
            case None => math.log(2.0 * (uni.getOrElse(b, 0L) + 1)) -
              math.log(5.0 * (nTot + vTot))
          }
          math.floor(t * 1e9).toLong
        }.sum
        Some((src, (tk.length - 1).toLong, tsum))
      }
    }.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum))
    }
    val hFix = perSrc.map { case (s, (_, nb, ts)) => s -> (-ts) / nb }
    val hMin = hFix.values.min
    val sx = hFix.values.sum - hFix.size * hMin
    val expected = perSrc.map { case (s, (nd, nb, ts)) =>
      val h = BigDecimal(-ts.toDouble / 1e9 / nb)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ex = hFix(s) - hMin
      s -> ((nd, nb, h, ex, if (sx == 0) 0L else ex * 1000 / sx))
    }
    val got = TextQueries.q116DomainMixture(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (s, (nd, nb, h, ex, w)) =>
      val (end, enb, eh, eex, ew) = expected(s)
      assert(nd == end && nb == enb && ex == eex && w == ew,
        s"source $s: ($nd,$nb,$ex,$w) vs ($end,$enb,$eex,$ew)")
      assert(math.abs(h - eh) < 1e-9, s"source $s: $h vs $eh")
    }
    // mixture semantics: the best domain has zero excess, weights bound to
    // a permille budget, and every crawl domain outweighs every curated one
    assert(got.values.exists(_._4 == 0L))
    assert(got.values.map(_._5).sum <= 1000L)
    val (curated, crawl) = got.partition(_._1.stripPrefix("src").toInt < 10)
    assert(crawl.values.map(_._5).min > curated.values.map(_._5).max)
  }

  test("q120 DoReMi iteration matches a plain-Scala multiplicative-weights " +
      "recomputation; trajectory concentrates on high-excess domains") {
    // seed from the engine's own q116 excess (pinned against plain Scala in
    // the q116 test above) — this test pins the ITERATION arithmetic
    val ex = TextQueries.q116DomainMixture(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(4) / 1000000L).toMap
    val srcs = ex.keys.toSeq.sorted
    var w = srcs.map(s => s -> 1000000L / srcs.length).toMap
    val expected = scala.collection.mutable.ArrayBuffer[(String, Int, Long)]()
    srcs.foreach(s => expected += ((s, 0, w(s))))
    for (t <- 1 to TextQueries.DoremiRounds) {
      val m = srcs.map(s => s -> w(s) * (TextQueries.DoremiEtaScale + ex(s))).toMap
      val tot = m.values.sum
      w = srcs.map(s => s -> m(s) * 1000000L / tot).toMap
      srcs.foreach(s => expected += ((s, t, w(s))))
    }
    val got = TextQueries.q120DoremiIterate(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got === expected.sortBy(p => (p._2, p._1)).toSeq)
    // Group-DRO semantics: the max-excess domain's weight rises every
    // round; a zero-excess domain's weight falls monotonically
    val hot = ex.maxBy(_._2)._1
    val cold = ex.minBy(_._2)._1
    val byRound = got.groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._3).toMap)
    (1 to TextQueries.DoremiRounds).foreach { t =>
      assert(byRound(t)(hot) > byRound(t - 1)(hot), s"round $t hot")
      assert(byRound(t)(cold) <= byRound(t - 1)(cold), s"round $t cold")
    }
    // the budget stays a budget: ppm sums never exceed 1e6 (truncation
    // shrinks, never grows)
    (0 to TextQueries.DoremiRounds).foreach(t =>
      assert(byRound(t).values.sum <= 1000000L))
  }

  test("q124 refreshed DoReMi matches a plain-Scala recomputation from the " +
      "engine's own h_fix; the moving baseline reacts to the weights") {
    val hfix = TextQueries.domainExcess(spark, "/root/testdata/sf0.001")
      .select("source", "h_fix")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcs = hfix.keys.toSeq.sorted
    var w = srcs.map(s => s -> 1000000L / srcs.length).toMap
    val expected = scala.collection.mutable.ArrayBuffer[(String, Int, Long, Long)]()
    srcs.foreach(s => expected += ((s, 0, w(s), 0L)))
    val baselines = scala.collection.mutable.ArrayBuffer[Long]()
    for (t <- 1 to TextQueries.DoremiRounds) {
      val sumW = srcs.map(w).sum
      val b = srcs.map(s => w(s) * hfix(s)).sum / sumW
      baselines += b
      val em = srcs.map(s => s -> math.max(0L, hfix(s) - b) / 1000000L).toMap
      val m = srcs.map(s => s -> w(s) * (TextQueries.DoremiEtaScale + em(s))).toMap
      val tot = m.values.sum
      w = srcs.map(s => s -> m(s) * 1000000L / tot).toMap
      srcs.foreach(s => expected += ((s, t, w(s), em(s))))
    }
    val got = TextQueries.q124DoremiRefresh(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected.sortBy(p => (p._2, p._1)).toSeq)
    // the refresh is REAL: as weight concentrates on high-entropy domains,
    // the weighted baseline rises monotonically, so the hottest domain's
    // refreshed excess shrinks round over round — the Group-DRO
    // self-limiting dynamic the frozen-excess q120 cannot show
    assert(baselines.toSeq == baselines.sorted.toSeq,
      s"baseline must rise as weight moves to hot domains: $baselines")
    val hot = hfix.maxBy(_._2)._1
    val hotEm = (1 to TextQueries.DoremiRounds)
      .map(t => got.find(r => r._1 == hot && r._2 == t).get._4)
    assert(hotEm.zip(hotEm.tail).forall { case (a, b) => b <= a },
      s"hot-domain refreshed excess must not rise: $hotEm")
    // budget discipline carried over
    val byRound = got.groupBy(_._2)
    (0 to TextQueries.DoremiRounds).foreach(t =>
      assert(byRound(t).map(_._3).sum <= 1000000L))
  }

  test("q125 proxy RETRAIN adapts: upweighting a hard domain lowers its " +
      "loss under the retrained proxy — the dynamic q124 cannot show") {
    import spark.implicits._
    // two domains with disjoint vocabularies: 'big' dominates the corpus,
    // 'rare' is a sliver. Under the uniform seed the proxy's data budget
    // (one mixture's worth of grams) models rare poorly vs the full-corpus
    // reference → positive excess → DoReMi upweights rare → rare's counts
    // flow into the NEXT round's retrained proxy → its loss falls. q124's
    // h_fix is frozen by construction, so this trajectory is unreachable
    // there — exactly the stated-gap closure this entry exists for.
    val bigDocs = (0 until 60).map { i =>
      ("big", (0 until 30).map(j => s"alpha${(i * 7 + j) % 40}").mkString(" "))
    }
    val rareDocs = (0 until 3).map { i =>
      ("rare", (0 until 30).map(j => s"zeta${(i * 11 + j) % 25}").mkString(" "))
    }
    val docs = (bigDocs ++ rareDocs).toDF("source", "text")
    val got = WebCurationQueries.doremiProxyRetrain(spark, docs)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byRd = got.groupBy(_._2).view
      .mapValues(_.map(r => r._1 -> (r._3, r._4, r._5)).toMap).toMap
    // round 1: rare's excess exceeds big's (the undertrained proxy hurts
    // the underrepresented domain more)
    assert(byRd(1)("rare")._3 > byRd(1)("big")._3,
      s"rare must carry the larger round-1 excess: ${byRd(1)}")
    // weights move toward rare every round
    (1 to TextQueries.DoremiRounds).foreach { t =>
      assert(byRd(t)("rare")._1 > byRd(t - 1)("rare")._1, s"round $t rare weight")
    }
    // THE retrain pin: rare's loss under the final retrained proxy is
    // strictly below its loss under the round-1 (uniform-mixture) proxy,
    // and the h trajectory is not frozen
    assert(byRd(TextQueries.DoremiRounds)("rare")._2 < byRd(1)("rare")._2,
      s"retrained proxy must improve on the upweighted domain: " +
        (1 to TextQueries.DoremiRounds).map(t => byRd(t)("rare")._2))
    // budget + round-0 shape
    (0 to TextQueries.DoremiRounds).foreach(t =>
      assert(byRd(t).values.map(_._1).sum <= 1000000L))
    assert(byRd(0).values.forall(_._3 == 0L))
  }

  test("q125 is deterministic and preserves symmetry between identical domains") {
    import spark.implicits._
    // two domains with the SAME document multiset: every round's proxy is
    // indifferent between them, so seed symmetry must survive the loop
    val docA = (0 until 20).map(i => ("mirror_a", s"tok${i % 9} tok${(i + 1) % 9} tok${(i + 2) % 9}"))
    val docB = docA.map { case (_, t) => ("mirror_b", t) }
    val docs = (docA ++ docB).toDF("source", "text")
    val run1 = WebCurationQueries.doremiProxyRetrain(spark, docs).collect().map(_.toString).toSeq
    val run2 = WebCurationQueries.doremiProxyRetrain(spark, docs).collect().map(_.toString).toSeq
    assert(run1 == run2, "driver loop must be order-independent (BigInt sums)")
    val rows = WebCurationQueries.doremiProxyRetrain(spark, docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._2).foreach { case (t, rs) =>
      val ws = rs.map(r => r._1 -> r._3).toMap
      assert(ws("mirror_a") == ws("mirror_b"), s"round $t symmetry: $ws")
      val hs = rs.map(r => r._1 -> r._4).toMap
      assert(hs("mirror_a") == hs("mirror_b"))
    }
  }
}
