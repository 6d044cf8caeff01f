package graft.tools

import graft.Sessions
import graft.operators.WebCurationQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-DOMAIN smoke for the per-domain cap (dev tool; VERDICT r8 #1
  * "done" evidence at scale): construct the crawl-skew corpus the cap
  * exists for — ONE domain carrying 90% of N (doc_id, domain) pairs, the
  * rest spread over many cold domains — and time three formulations that
  * produce row-identical output:
  *
  *   1. window  — row_number() OVER (PARTITION BY domain): the textbook
  *      form; the hot domain serializes onto ONE task;
  *   2. salted  — the r8 two-phase collect_list → sort → slice: bounded
  *      second shuffle but an UNBOUNDED merge buffer per (domain, salt)
  *      (N/16 ids of the hot domain in one aggregation buffer);
  *   3. bounded — the r9 LowestKAggregator groupBy: state ≤ K in reduce
  *      AND merge, map-side collapse, one shuffle.
  *
  * Equality of the three outputs is asserted before timing is reported.
  *
  * Usage: runMain graft.tools.DomainCapSmoke [nPairs] [k]
  */
object DomainCapSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000000)
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.build("local[32]", 32, "graft-domaincap-smoke")

    // Each (doc_id, domain) pair appears TWICE (a doc links a domain from
    // two URLs — the real crawl shape), so the legacy forms' `.distinct()`
    // is genuinely required work, not dead work charged only to them; the
    // bounded aggregator dedupes inside its partial instead (that removed
    // shuffle is part of the r9 design, and this generator makes the
    // comparison honest — review r9). Cold domains: 5000 distinct values
    // via id/10 so the mod is not constrained by the hot-selection mod.
    val pairs = spark.range(n).select(
      expr("id DIV 2").as("doc_id"),
      when(expr("id DIV 2 % 10") < 9, lit("hot.example"))
        .otherwise(concat(lit("cold"), expr("(id DIV 2 DIV 10) % 5000").cast("string"),
          lit(".example"))).as("domain"))
      .repartition(32)
      .localCheckpoint() // time the cap, not the generator

    def windowForm(p: DataFrame): DataFrame =
      p.select(col("doc_id"), col("domain")).distinct()
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("domain")).orderBy(col("doc_id"))).cast("int"))
        .filter(col("rank") <= k)
        .select(col("domain"), col("rank"), col("doc_id"))

    def saltedForm(p: DataFrame): DataFrame =
      p.select(col("doc_id"), col("domain")).distinct()
        .withColumn("salt", col("doc_id") % 16)
        .groupBy(col("domain"), col("salt"))
        .agg(slice(sort_array(collect_list(col("doc_id"))), 1, k).as("part"))
        .groupBy(col("domain"))
        .agg(slice(array_sort(flatten(collect_list(col("part")))), 1, k).as("top"))
        .select(col("domain"), posexplode(col("top")).as(Seq("pos", "doc_id")))
        .select(col("domain"), (col("pos") + 1).cast("int").as("rank"), col("doc_id"))

    def timed(name: String)(f: => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val best = math.min(run(), run())
      System.err.println(f"[smoke] $name%-8s $best%.2f s")
      best
    }

    // row-identical first, then race
    val bounded = WebCurationQueries.domainCap(pairs, k)
      .collect().map(_.toString).sorted
    val win = windowForm(pairs).collect().map(_.toString).sorted
    val salt = saltedForm(pairs).collect().map(_.toString).sorted
    require(bounded.sameElements(win), "bounded != window output")
    require(bounded.sameElements(salt), "bounded != salted output")

    val tWin = timed("window")(windowForm(pairs))
    val tSalt = timed("salted")(saltedForm(pairs))
    val tBound = timed("bounded")(WebCurationQueries.domainCap(pairs, k))
    println(
      f"""{"metric":"domaincap_smoke","n_pairs":$n,"k":$k,"hot_share":0.9,"n_out":${bounded.length},"window_sec":$tWin%.2f,"salted_sec":$tSalt%.2f,"bounded_sec":$tBound%.2f}""")
    spark.stop()
  }
}
