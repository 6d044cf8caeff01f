package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-handshake contract for graft.Bench's FINAL stdout line
  * (VERDICT r14 #1): the driver captures only ~2 KB of process tail, and
  * five consecutive rounds of `parsed: null` traced to the full 124-entry
  * per-query JSON (~3.5 KB) being truncated mid-object. The compact
  * summary is the one line the driver is guaranteed to see whole, so its
  * size budget and JSON shape are contracts, not style.
  */
class BenchSummarySpec extends AnyFunSuite {

  /** The full current catalog as a worst-case results vector. */
  private def fullResults: Seq[(String, Double)] =
    SparkEntry.queries.keys.toSeq.sorted.map(_ -> 123.4567)

  private def paired = Bench.Paired(
    fragment = "", sparkTotal = 12345.6789, duckTotal = 9876.5432,
    n = 122, ratio = 1.250, ratioExNaive = Some(0.931),
    ratioExTva = Some(0.912))

  test("compact summary stays under 1 KB at full catalog size") {
    val line = Bench.compactSummary(fullResults, Nil, "0.1",
      loadBefore = 31.97, loadAfter = 32.01, forked = true, Some(paired),
      cpus = 32, master = "local[32]")
    assert(line.getBytes("UTF-8").length < 1024,
      s"compact line must fit the driver's tail capture, was ${line.length}B: $line")
  }

  test("compact summary stays bounded even when many queries fail") {
    val failed = SparkEntry.queries.keys.toSeq.sorted // disaster run: all fail
    val line = Bench.compactSummary(fullResults, failed, "1.0",
      loadBefore = 0.0, loadAfter = 0.0, forked = false, Some(paired),
      cpus = 8, master = "local[8]")
    assert(line.getBytes("UTF-8").length < 1400,
      s"failed-list must be truncated, was ${line.length}B")
    assert(line.contains("\"failed_n\":" + failed.size))
  }

  test("compact summary is one line of well-formed JSON with the driver's fields") {
    val line = Bench.compactSummary(fullResults, Seq("q99_x"), "0.1",
      31.5, 30.2, forked = false, Some(paired), cpus = 32,
      master = "local-cluster[2,16,8192]")
    assert(!line.contains("\n"))
    // structural JSON check without a JSON library: balanced braces/brackets
    // outside strings, and the documented driver fields present
    var depth = 0; var inStr = false; var esc = false
    line.foreach { c =>
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ => ()
      }
      assert(depth >= 0)
    }
    assert(depth == 0 && !inStr, s"unbalanced JSON: $line")
    Seq("\"metric\":\"total\"", "\"value\":", "\"unit\":\"sec\"", "\"sf\":\"0.1\"",
      "\"queries\":{", "\"ratio\":1.250", "\"ratio_ex_naive\":0.931",
      "\"ratio_ex_tva\":0.912", "\"detail\":\"target/bench.json\"",
      // VERDICT r16 #1: the scaling probe is only adjudicable when the
      // line itself says what it ran with
      "\"cpus\":32", "\"master\":\"local-cluster[2,16,8192]\"")
      .foreach(f => assert(line.contains(f), s"missing $f in $line"))
  }

  test("compact summary headline queries are real catalog keys") {
    val line = Bench.compactSummary(fullResults, Nil, "0.1", 0, 0,
      forked = false, None, cpus = 32, master = "local[32]")
    val qBlock = """"queries":\{(.*?)\}""".r.findFirstMatchIn(line)
      .map(_.group(1)).getOrElse(fail("no queries object"))
    val keys = """"([^"]+)":""".r.findAllMatchIn(qBlock).map(_.group(1)).toSeq
    // all 14 headline keys must resolve — a stale key silently drops out of
    // the flatMap (r15: q12_window_rank was a phantom name and the line
    // shipped with 5 entries before this pin; r17 expanded 6 -> 14 per
    // VERDICT r16 #1, keeping the original 6)
    assert(keys.size == 14, s"headline keys drifted from the catalog: $keys")
    Seq("q01_scan_count", "q09_hash_agg", "q12_topk_per_group",
      "q22_dedup_exact_hash", "q23_dedup_minhash_lsh", "q27_ann_lsh")
      .foreach(k => assert(keys.contains(k), s"original headline key $k removed"))
    keys.foreach(k => assert(SparkEntry.queries.contains(k), s"$k not in catalog"))
  }

  test("unpaired summary omits ratio fields but keeps the core shape") {
    val line = Bench.compactSummary(fullResults, Nil, "0.01", 1, 1,
      forked = false, None, cpus = 32, master = "local[32]")
    // field-name match, not a bare substring: the headline key
    // q88_web_cuRATIOn would otherwise trip this
    assert(!line.contains("\"ratio\":") && !line.contains("\"ratio_ex"))
    assert(line.contains("\"metric\":\"total\""))
    assert(line.getBytes("UTF-8").length < 1024)
  }
}
