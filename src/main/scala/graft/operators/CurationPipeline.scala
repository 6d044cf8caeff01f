package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q52 — the flagship TRAINING-CORPUS CURATION PIPELINE: the catalog's
  * primitives composed into the actual job a 100 TB data-curation run
  * executes, end to end in ONE Spark plan:
  *
  *   1. exact dedup   — keep the smallest doc_id per md5(text) (q22's
  *                      census as a filter; window row_number, not
  *                      self-join);
  *   2. quality gate  — token count in [20, 400] and stopword ratio >= 0.05
  *                      (q29's metrics as predicates);
  *   3. stratified    — per-lang md5 hash-mod sampling (q50's primitive):
  *      downsampling    'en' (the over-represented stratum) kept at ~50%,
  *                      everything else at 100%;
  *   4. budget report — per (lang, source): surviving docs, token sum, and
  *                      each stage's cumulative drop counts, so the run is
  *                      auditable (silent data loss is the cardinal sin of
  *                      curation pipelines).
  *
  * Every stage is a narrow predicate or a single keyed window — the whole
  * pipeline is 2 shuffles (dedup key, final group) regardless of SF, and
  * every decision is deterministic (md5, not RNG), so a re-run or a
  * per-partition retry reproduces the same corpus byte-for-byte. */
object CurationPipeline {

  val MinTokens = 20
  val MaxTokens = 400
  val MinStopRatio = 0.05
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def q52Curation(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("tokens", split(col("text"), " "))
      .withColumn("n_tokens", size(col("tokens")))
      .withColumn("stop_ratio",
        size(filter(col("tokens"), t => t.isInCollection(Stopwords)))
          .cast("double") / col("n_tokens"))

    // stage 1: exact dedup — canonical representative per content hash
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id").asc)
    val deduped = docs.withColumn("rn", row_number().over(w))
      .withColumn("is_canonical", col("rn") === 1)

    // stage 2: quality predicates
    val qualified = col("is_canonical") &&
      col("n_tokens").between(MinTokens, MaxTokens) &&
      col("stop_ratio") >= MinStopRatio

    // stage 3: deterministic per-stratum downsampling ('en' at ~50%)
    val sampled = qualified && (col("lang") =!= "en" ||
      substring(md5(concat_ws("|", col("doc_id"), col("lang"))), 1, 1) < "8")

    deduped
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_raw"),
        count(when(col("is_canonical"), 1)).as("n_unique"),
        count(when(qualified, 1)).as("n_quality"),
        count(when(sampled, 1)).as("n_kept"),
        coalesce(sum(when(sampled, col("n_tokens"))), lit(0L)).cast("long")
          .as("tokens_kept"))
      .orderBy(col("lang").asc, col("source").asc)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q52_curation_pipeline" -> (q52Curation _),
  )

  private val stopSqlList = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")

  val oracle: Map[String, String] = Map(
    "q52_curation_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, source, text,
         |    string_split(text, ' ') AS tokens,
         |    len(string_split(text, ' ')) AS n_tokens,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x IN $stopSqlList)) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS stop_ratio,
         |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM documents),
         |f AS (SELECT *,
         |    (rn = 1) AS is_canonical,
         |    (rn = 1 AND n_tokens BETWEEN $MinTokens AND $MaxTokens
         |       AND stop_ratio >= $MinStopRatio) AS qualified
         |  FROM t),
         |s AS (SELECT *,
         |    (qualified AND (lang <> 'en' OR
         |       substr(md5(concat_ws('|', doc_id, lang)), 1, 1) < '8')) AS sampled
         |  FROM f)
         |SELECT lang, source, COUNT(*) AS n_raw,
         |  COUNT(CASE WHEN is_canonical THEN 1 END) AS n_unique,
         |  COUNT(CASE WHEN qualified THEN 1 END) AS n_quality,
         |  COUNT(CASE WHEN sampled THEN 1 END) AS n_kept,
         |  CAST(COALESCE(SUM(CASE WHEN sampled THEN n_tokens END), 0) AS BIGINT) AS tokens_kept
         |FROM s GROUP BY lang, source
         |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
  )
}
