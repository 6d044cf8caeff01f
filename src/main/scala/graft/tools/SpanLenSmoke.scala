package graft.tools

import graft.Sessions
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Span-length smoke (dev tool; VERDICT r6 #7 "done" criterion): run the
  * exact-span census (q71) and the span-level drop stage (q77) at the
  * default 8-token span and at the published ~50-token setting
  * (`spark.graft.spans.tokens`) on a real corpus, recording wall time and
  * the removed-token fraction — evidence that the operators are
  * length-PARAMETERIZED, not length-dependent: only the ngram kernel's
  * window width changes, every shuffle key and plan shape is identical.
  *
  * Usage: runMain graft.tools.SpanLenSmoke [sfDir]
  */
object SpanLenSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("local[32]", 32, "graft-spanlen-smoke")
    def runAt(tokens: Int): (Double, Double, Long, Double) = {
      spark.conf.set(DedupQueries.SpanTokensKey, tokens.toString)
      val t0 = System.nanoTime()
      DedupQueries.q71ExactSpans(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val censusSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val agg = DedupQueries.q77SpanDedup(spark, dir)
        .agg(sum(col("n_words")).as("w"), sum(col("n_removed")).as("r"))
        .head()
      val dedupSec = (System.nanoTime() - t1) / 1e9
      val (w, r) = (agg.getLong(0), agg.getLong(1))
      (censusSec, dedupSec, r, r.toDouble / w)
    }
    val results = Seq(8, 50).map { t =>
      val (c, d, removed, frac) = runAt(t)
      f"""{"tokens":$t,"census_sec":$c%.2f,"dedup_sec":$d%.2f,"removed_tokens":$removed,"removed_frac":$frac%.5f}"""
    }
    spark.conf.unset(DedupQueries.SpanTokensKey)
    println(s"""{"metric":"spanlen_smoke","dir":"$dir","runs":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
