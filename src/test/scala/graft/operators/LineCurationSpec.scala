package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the line-level curation layer (q90/q91) and the URL
  * canonicalizer (q92): rule classification on constructed pages, the
  * strict boilerplate threshold edge, order-preserving rebuilds, and
  * canonical-form unit cases the enriched corpus can't isolate. */
class LineCurationSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // ---- q90 ----

  test("q90 classifies every stratum of an all-strata page") {
    // doc 0 hits every even/3/5/7/11/13 stratum (0 % k == 0) but not the
    // odd fox line: base-with-dot, js, lorem, brace, short, extra
    val r = LineCurationQueries.lineQuality(docs(0L -> "alpha beta gamma delta"))
      .collect().head
    assert(r.getLong(1) === 6, "n_lines")
    assert(r.getLong(2) === 3, "n_kept: base., lorem (line-legal!), extra")
    assert(r.getLong(3) === 1, "n_drop_js")
    assert(r.getLong(4) === 1, "n_drop_punct: brace line ends in }")
    assert(r.getLong(5) === 1, "n_drop_words: 'ok fine.' has 2 words")
    assert(r.getBoolean(6) && r.getBoolean(7), "page flags lorem+brace")
    assert(!r.getBoolean(8), "page dropped despite 3 kept lines")
    // rebuild preserves original line order
    assert(r.getString(9) ===
      "alpha beta gamma delta.\nlorem ipsum dolor sit amet.\na second fine sentence appears right here.")
  }

  test("q90 page keep needs LMinKept kept lines and both page flags clear") {
    // doc 1: odd -> base line unterminated (dropped), fox kept -> 1 kept < 2
    val r1 = LineCurationQueries.lineQuality(docs(1L -> "one two three")).collect().head
    assert(r1.getLong(2) === 1 && !r1.getBoolean(8))
    // doc 7: odd, %7 -> fox + extra kept = 2, no lorem/brace -> page keeps
    val r7 = LineCurationQueries.lineQuality(docs(7L -> "one two three")).collect().head
    assert(r7.getLong(2) === 2 && r7.getBoolean(8))
    // doc 77: %7 and %11 -> 2 kept but lorem flag -> dropped
    val r77 = LineCurationQueries.lineQuality(docs(77L -> "one two three")).collect().head
    assert(r77.getLong(2) === 3 && r77.getBoolean(6) && !r77.getBoolean(8))
  }

  test("q90 drop-reason counts partition the dropped lines") {
    val out = LineCurationQueries.lineQuality(
      docs((0L to 200L).map(i => i -> "some words here again"): _*)).collect()
    out.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5),
        s"doc ${r.getLong(0)}: reasons don't partition")
    }
  }

  // ---- q91 ----

  test("q91 boilerplate threshold is strict (> 1/10 of docs, not >=)") {
    // 10 docs, ids 1 mod 30030 so the only enrichment line is the fox line
    // (odd, not divisible by 3/5/7/11/13): fox appears in 10/10 docs ->
    // boiler; each base text is unique (1/10 -> exactly AT the threshold,
    // 1*10 > 10 is false -> kept)
    val ids = (0 until 10).map(i => 30030L * i + 1)
    val out = LineCurationQueries.boilerplateLines(
      docs(ids.map(id => id -> s"unique base line $id"): _*)).collect()
    assert(out.length === 10)
    out.foreach { r =>
      assert(r.getLong(1) === 2, "n_lines: base + fox")
      assert(r.getLong(2) === 1, "only the fox line is boilerplate")
      assert(r.getString(3).startsWith("unique base line"), "base survives, in order")
      assert(!r.getString(3).contains("fox"))
    }
  }

  test("q91 crossing the threshold drops a shared base line everywhere") {
    // 10 docs, 2 of them share a base text: 2*10 > 10 -> that line is boiler
    val ids = (0 until 10).map(i => 30030L * i + 1)
    val rows = ids.zipWithIndex.map { case (id, i) =>
      id -> (if (i < 2) "shared header text" else s"unique base line $id")
    }
    val out = LineCurationQueries.boilerplateLines(docs(rows: _*))
      .orderBy("doc_id").collect()
    assert(out.take(2).forall(_.getLong(2) === 2), "shared base + fox both boiler")
    assert(out.take(2).forall(_.getString(3) === ""), "nothing survives for the shared docs")
    assert(out.drop(2).forall(_.getLong(2) === 1))
  }

  // ---- q92 ----

  private def canon(u: String): String =
    Seq(u).toDF("u").select(WebCurationQueries.canonicalizeUrl(col("u"))).collect().head.getString(0)

  test("q92 canonicalizer: case-folds scheme+host only, path case preserved") {
    assert(canon("HTTPS://Host.COM/Path/File?x=1#frag") === "https://host.com/Path/File?x=1")
  }

  test("q92 canonicalizer: strips default ports only, scheme-relative") {
    assert(canon("https://h.com:443/x") === "https://h.com/x")
    assert(canon("http://h.com:80/x") === "http://h.com/x")
    assert(canon("https://h.com:8443/x") === "https://h.com:8443/x")
    // RFC 3986 §6.2.3: a NON-default port is part of the identity even
    // when it is the other scheme's default
    assert(canon("http://h.com:443/x") === "http://h.com:443/x")
    assert(canon("https://h.com:80/x") === "https://h.com:80/x")
  }

  test("q92 canonicalizer: sorts params, strips utm_*, drops empty query") {
    assert(canon("https://h.com/x?b=2&a=1") === "https://h.com/x?a=1&b=2")
    assert(canon("https://h.com/x?utm_source=f&utm_medium=m") === "https://h.com/x")
    assert(canon("https://h.com/x?z=9&utm_campaign=c&a=1") === "https://h.com/x?a=1&z=9")
    assert(canon("https://h.com/x") === "https://h.com/x")
    assert(canon("https://h.com/x#only-frag") === "https://h.com/x")
  }

  test("q92 canonicalizer: a '?' INSIDE the query is kept, not truncated") {
    // RFC 3986 §3.4 allows '?' in the query; split-on-second-'?' silently
    // dropped '?b=2' here and collapsed distinct URLs into one canonical
    // family (ADVICE r8)
    assert(canon("https://h.com/x?a=1?b=2") === "https://h.com/x?a=1?b=2")
    assert(canon("https://h.com/x?redir=/p%3Fq?z=1") === "https://h.com/x?redir=/p%3Fq?z=1")
    // distinct inner-'?' queries must stay distinct canonical forms
    assert(canon("https://h.com/x?a=1?b=2") !== canon("https://h.com/x?a=1?c=3"))
  }

  // ---- q105 ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def para(rows: (Long, String)*) =
    LineCurationQueries.paraDedup(docs(rows: _*)).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq

  test("q105 injects both strata for doc_id % 6 == 0 and removes them keep-first") {
    // 7 words -> paras [p0='a b c d e f', p1='g']; %2 appends p0, %3
    // appends p1 -> [p0,p1,p0,p1]; keep-first -> [p0,p1]
    assert(para(6L -> "a b c d e f g") ===
      Seq((6L, 4L, 2L, md5hex("a b c d e f | g"))))
  }

  test("q105 single-stratum and no-stratum docs") {
    // doc 1: no injection at all
    assert(para(1L -> "x y") === Seq((1L, 1L, 1L, md5hex("x y"))))
    // doc 2: %2 only -> p0 appended; 12 words -> 2 paras
    val p0 = "a b c d e f"; val p1 = "g h i j k l"
    assert(para(2L -> s"$p0 $p1") ===
      Seq((2L, 3L, 2L, md5hex(s"$p0 | $p1"))))
    // doc 3: %3 wants para 2 — but a 1-para doc has none to inject
    assert(para(3L -> "only five words right here x").head match {
      case (3L, 1L, 1L, _) => true; case _ => false
    })
  }

  test("q105 removes naturally repeated paragraphs, preserving first-occurrence order") {
    // words 1-6 == words 13-18; doc 1 -> no injection. paras [A, B, A]
    val a = "w1 w2 w3 w4 w5 w6"; val b = "x1 x2 x3 x4 x5 x6"
    assert(para(1L -> s"$a $b $a") ===
      Seq((1L, 3L, 2L, md5hex(s"$a | $b"))))
  }

  test("q105 is a single narrow projection: no shuffle in the plan") {
    val plan = LineCurationQueries.paraDedup(docs(1L -> "a b c"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
