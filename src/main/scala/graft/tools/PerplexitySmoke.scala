package graft.tools

import graft.Sessions
import graft.operators.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocab-scale smoke for the perplexity split (dev tool; VERDICT r8 #2
  * "done" evidence): construct the corpus shape that killed the r8 plan —
  * a LARGE vocabulary (mostly-unique tokens, the Zipf tail that dominates
  * real web corpora) — and race the retired r8 form (whole vocab folded
  * into a ONE-ROW broadcast map + a global ntile window) against the r9
  * form (tokens⋈census equi-join + per-doc pos-ordered fold +
  * partition-offset exact rank, [[TextQueries.perplexitySplit]]).
  *
  * The r8 form's costs compound: one aggregation buffer holding EVERY
  * distinct token, a vocab-sized broadcast, and — the sleeper —
  * `element_at(map, token)` on a non-literal map is a LINEAR SCAN of
  * ArrayBasedMapData, so scoring costs O(tokens × vocab). On the sf0.1
  * corpus the vocab is small enough to hide all three; on a mostly-unique
  * vocab the form turns quadratic. The smoke therefore measures BOTH
  * forms at two corpus sizes and reports the growth: r8 grows ~(size)²,
  * r9 ~linear. (A first attempt raced them at vocab=1.5M directly; the r8
  * side did not finish in 10 minutes — that non-termination IS the
  * finding, but a smoke must terminate, hence the growth-curve design.)
  * Output equality is asserted at the smaller size.
  *
  * Usage: runMain graft.tools.PerplexitySmoke [smallDocs] [bigDocs]
  */
object PerplexitySmoke {
  private val PerDoc = 40

  private def corpus(spark: SparkSession, nDocs: Int): DataFrame =
    spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until PerDoc).map { p =>
        when((col("id") + p) % 4 === 0,
          concat(lit("common"), ((col("id") + p) % 50).cast("string")))
          .otherwise(concat(lit("w"), (col("id") * PerDoc + p).cast("string")))
      }: _*).as("text"))
      .repartition(32)
      .localCheckpoint() // time the split, not the generator

  /** The retired r8 formulation, verbatim. */
  private def r8Form(d: DataFrame): DataFrame = {
    val toks = d.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) > 0)
    val counts = toks.select(explode(col("toks")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val model = counts.agg(
      map_from_entries(collect_list(struct(col("token"), col("cnt")))).as("mp"),
      sum(col("cnt")).as("n_corpus"))
    toks.crossJoin(broadcast(model))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        round(
          log(col("n_corpus")) -
            // r12: the shipping form switched to fixed-point int64 term
            // sums; the retired twin mirrors the encoding so the
            // row-identity assertion keeps holding exactly (the plan
            // pathologies being raced — one-row map, linear element_at —
            // are untouched)
            expr("aggregate(toks, 0L, (a, tk) -> a + CAST(floor(ln(CAST(element_at(mp, tk) AS DOUBLE)) * 1000000000.0D) AS BIGINT))").cast("double")
              / lit(1.0e9) / size(col("toks")),
          6).as("h_nats"))
      .withColumn("bucket",
        ntile(3).over(Window.orderBy(col("h_nats").asc, col("doc_id").asc)).cast("int"))
      .orderBy(col("doc_id").asc)
  }

  /** Warm once, then min-of-2 — the repo's bench discipline (review r9:
    * a single timed run let one GC pause scale the committed growth
    * ratio; both sizes are warmed identically now). */
  private def timed(f: => DataFrame): Double = {
    def run(): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    math.min(run(), run())
  }

  def main(args: Array[String]): Unit = {
    val small = args.headOption.map(_.toInt).getOrElse(1000)
    val big = args.lift(1).map(_.toInt).getOrElse(4000)
    val spark = Sessions.build("local[32]", 32, "graft-perplexity-smoke")

    val ds = corpus(spark, small)
    val db = corpus(spark, big)
    val vocabS = ds.select(explode(split(col("text"), " "))).distinct().count()
    val vocabB = db.select(explode(split(col("text"), " "))).distinct().count()

    // row-identical at the small size
    val r9out = TextQueries.perplexitySplit(ds).collect().map(_.toString).sorted
    val r8out = r8Form(ds).collect().map(_.toString).sorted
    require(r9out.sameElements(r8out), "r9 output != r8 output")

    val t8s = timed(r8Form(ds))
    val t9s = timed(TextQueries.perplexitySplit(ds))
    val t8b = timed(r8Form(db))
    val t9b = timed(TextQueries.perplexitySplit(db))
    println(
      f"""{"metric":"perplexity_smoke","small_docs":$small,"big_docs":$big,"vocab_small":$vocabS,"vocab_big":$vocabB,"r8_small_sec":$t8s%.2f,"r8_big_sec":$t8b%.2f,"r9_small_sec":$t9s%.2f,"r9_big_sec":$t9b%.2f,"r8_growth":${t8b / t8s}%.1f,"r9_growth":${t9b / t9s}%.1f}""")
    spark.stop()
  }
}
