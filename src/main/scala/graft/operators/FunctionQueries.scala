package graft.operators

import graft.functions.CentroidAggregator
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UDAF / generator / approx-distinct coverage (SURVEY §2.C rows "UDAF",
  * "UDTF/generator", "Approx distinct"; VERDICT r1 "next round" #9).
  */
object FunctionQueries {

  /** Q35 — label centroids via the typed Aggregator (a genuine two-phase
    * HashAggregate: partial buffers merge associatively because the math is
    * exact integer). Result exploded to (label, dim, centroid_milli) rows
    * so the oracle aligns column-for-column. */
  def q35LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val centroid = udaf(CentroidAggregator)
    Tables.embeddings(spark, dir)
      .groupBy(col("label"))
      .agg(centroid(col("embedding")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("dim", "centroid_milli")))
      .orderBy(col("label").asc, col("dim").asc)
  }

  /** Q36 — a real generator: explode the token array, then global token
    * frequencies (the UDTF row; q20's join fan-out stood in for this in r1).
    * Explode is pipeline-parallel; the aggregation shuffles on the token. */
  def q36ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)

  /** Q37 — approx_count_distinct with its error bound checked INSIDE the
    * gate: emits the exact distinct count plus a boolean `within_bounds`
    * (|approx-exact|/exact <= 5% at rsd 0.01 — a 5-sigma envelope; the
    * default rsd 0.05 makes 5% a one-sigma coin flip and failed at sf0.1);
    * the oracle pins the exact count and literal TRUE, so an approx drift
    * fails the hash compare. At 100 TB approx-distinct is the only
    * affordable cardinality estimator — this query is the engine's
    * contract that it stays honest. */
  def q37ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .select(
        col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users") <= 0.05).as("within_bounds"))

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q35_label_centroids" -> (q35LabelCentroids _),
    "q36_explode_tokens" -> (q36ExplodeTokens _),
    "q37_approx_distinct" -> (q37ApproxDistinct _),
  )

  val oracle: Map[String, String] = Map(
    "q35_label_centroids" ->
      """WITH q AS (SELECT label, vec_id,
        |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |e AS (SELECT label, vec_id, i - 1 AS dim, v[i] AS x
        |      FROM q, (SELECT unnest(range(1, 65)) AS i))
        |SELECT label, CAST(dim AS INT) AS dim,
        |  CAST(SUM(x) // COUNT(*) AS BIGINT) AS centroid_milli
        |FROM e GROUP BY label, dim
        |ORDER BY label NULLS FIRST, dim NULLS FIRST""".stripMargin,
    "q36_explode_tokens" ->
      ("SELECT token, COUNT(*) AS cnt FROM " +
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) t " +
        "GROUP BY token ORDER BY cnt DESC, token LIMIT 20"),
    "q37_approx_distinct" ->
      "SELECT COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_bounds FROM events",
  )
}
