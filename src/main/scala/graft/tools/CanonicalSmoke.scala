package graft.tools

import graft.Sessions
import graft.operators.DedupQueries
import org.apache.spark.sql.functions._

/** Hot-FAMILY smoke for canonical-copy selection (dev tool; VERDICT r6
  * next-round #1 "done" criterion): construct the corpus shape the curation
  * pipelines actually face — ONE boilerplate text (error page / empty
  * template) exactly duplicated across half the docs — and time the window
  * form (`row_number() OVER (PARTITION BY md5(text))`, whole family in one
  * AQE-unsplittable partition) against the census+rejoin form the pipelines
  * now default to (map-side-collapsed `groupBy(md5(text)).agg(min(doc_id))`
  * + AQE-skew-splittable equi-rejoin).
  *
  * Usage: runMain graft.tools.CanonicalSmoke [nDocs]
  */
object CanonicalSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000000)
    val spark = Sessions.build("local[32]", 32, "graft-canonical-smoke")
    val boiler = (1 to 40).map(i => s"boiler$i").mkString(" ")
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit(boiler))
        .otherwise(concat_ws(" ", (0 until 40).map(j =>
          concat(lit(s"w${j}_"), col("id"))): _*))
        .as("text"))
      .repartition(32)
      .localCheckpoint() // time the selection, not the generator
    def timed(skewSafe: Boolean): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        // count(is_canonical) forces the full selection without an
        // output-side sink cost difference between forms
        DedupQueries.withCanonicalFlag(docs, skewSafe)
          .filter(col("is_canonical")).select(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      math.min(run(), run())
    }
    val (win, safe) = (timed(skewSafe = false), timed(skewSafe = true))
    val canon = DedupQueries.withCanonicalFlag(docs, skewSafe = true)
      .filter(col("is_canonical")).count()
    println(f"""{"metric":"canonical_smoke","n_docs":$nDocs,"hot_family_share":0.5,"n_canonical":$canon,"window_sec":$win%.2f,"census_rejoin_sec":$safe%.2f}""")
    spark.stop()
  }
}
