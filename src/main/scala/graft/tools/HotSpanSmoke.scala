package graft.tools

import graft.Sessions
import graft.operators.DedupQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew smoke for the q71 exact-span census (dev tool): construct a corpus
  * where ONE span occurs in half the docs — the universal-boilerplate shape
  * (license header) that VERDICT r5 flagged as the window form's 100 TB
  * failure mode (every row of the hot span lands in one window partition;
  * AQE cannot split windows) — and time the window form against the
  * skew-safe census+rejoin form (`spark.graft.spans.skewSafe`), which gets
  * map-side partial aggregation on the census and AQE skew-join handling
  * on the rejoin.
  *
  * Usage: runMain graft.tools.HotSpanSmoke [nDocs]
  */
object HotSpanSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(400000)
    val spark = Sessions.build("local[32]", 32, "graft-hotspan-smoke")
    import spark.implicits._
    val header = (1 to DedupQueries.SpanTokens).map(i => s"lic$i").mkString(" ")
    // even ids: hot 8-word header + 2 unique tail words = 10 words -> 3
    // sliding 8-token spans/doc, one hot (ADVICE r6 comment fix);
    // odd ids: fully unique 12-word text (5 spans/doc, none shared)
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0,
        concat(lit(header + " "),
          concat_ws(" ", (0 until 2).map(j =>
            concat(lit(s"u${j}_"), col("id"))): _*)))
        .otherwise(concat_ws(" ", (0 until 12).map(j =>
          concat(lit(s"w${j}_"), col("id"))): _*))
        .as("text"))
      .repartition(32)
      .localCheckpoint() // time the census, not the generator
    def timed(skewSafe: Boolean): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        DedupQueries.spanDupFlags(docs, skewSafe)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      math.min(run(), run())
    }
    val (win, safe) = (timed(skewSafe = false), timed(skewSafe = true))
    // the auto probe (VERDICT r6 #6) must pick census+rejoin here and the
    // window form on a skew-free corpus; mirror q71's probe exactly
    def autoPick(frame: DataFrame): Boolean =
      graft.operators.SkewProbe.hasHotKey(
        DedupQueries.docSpans(graft.operators.SkewProbe.sampleByHash(
          frame, "doc_id",
          graft.operators.SkewProbe.sampleFraction(spark))).select(col("h")))
    val skewFree = docs.filter(col("doc_id") % 2 === 1)
    val (pickHot, pickFree) = (autoPick(docs), autoPick(skewFree))
    println(f"""{"metric":"hotspan_smoke","n_docs":$nDocs,"hot_share":0.5,"window_sec":$win%.2f,"skew_safe_sec":$safe%.2f,"auto_picks_skew_safe_on_hot":$pickHot,"auto_picks_skew_safe_on_skew_free":$pickFree}""")
    spark.stop()
  }
}
