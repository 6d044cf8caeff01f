package graft.tools

import graft.Sessions
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Skew smoke for the q71 exact-span census (dev tool): construct a corpus
  * where ONE span occurs in half the docs — the universal-boilerplate shape
  * (license header) that VERDICT r5 flagged as a window formulation's
  * 100 TB failure mode (every row of the hot span lands in one window
  * partition; AQE cannot split windows) — and time the shipped
  * census-arithmetic form (r13: skew-safe by construction — the hot span
  * collapses to one census row per map task and is dropped by the count-1
  * filter) against an inline window twin.
  *
  * Usage: runMain graft.tools.HotSpanSmoke [nDocs]
  */
object HotSpanSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(400000)
    val spark = Sessions.build("local[32]", 32, "graft-hotspan-smoke")
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
    def windowTwin() = {
      val spans = DedupQueries.docSpans(docs)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      spans.withColumn("n_docs_with", count(lit(1)).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("n_docs_with") >= 2L, 1L).otherwise(0L)).as("n_dup_spans"))
    }
    def timed(f: => org.apache.spark.sql.DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      math.min(run(), run())
    }
    val win = timed(windowTwin())
    val census = timed(DedupQueries.spanDupFlags(docs))
    println(f"""{"metric":"hotspan_smoke","n_docs":$nDocs,"hot_share":0.5,"window_sec":$win%.2f,"census_arith_sec":$census%.2f}""")
    spark.stop()
  }
}
