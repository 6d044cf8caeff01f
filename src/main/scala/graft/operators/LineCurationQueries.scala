package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Line-level corpus curation — the intra-document structural stage of a
  * crawl pipeline, complementing [[WebCurationQueries]]'s document-level
  * rules: C4's line filters (Raffel et al. 2020 §2.2 — keep lines ending
  * in terminal punctuation with enough words, drop javascript boilerplate
  * lines, drop pages containing "lorem ipsum" or "{") and CCNet/Dolma-style
  * cross-document repeated-line removal (a line occurring in a large share
  * of documents is boilerplate — headers, footers, cookie banners — and is
  * stripped from every document that carries it).
  *
  * The synthetic corpus is single-line word salad, so — the q38/q84
  * pattern — each operator first reshapes the text into lines with
  * doc_id-derived strata (a terminal-punctuation flip, a javascript line,
  * a lorem-ipsum line, a brace line, a too-short line, two clean filler
  * lines), and the DuckDB oracle rebuilds the identical enrichment; every
  * count, flag, and rebuilt text is value-checked, not vacuously empty.
  *
  * Scale shape: q90 is a pure codegen'd projection over higher-order
  * array functions — it rides the scan, zero shuffles before the output
  * sort. q91 is explode → one map-side-partial census at |unique lines|
  * cardinality → a provably tiny broadcast back: a boilerplate line must
  * appear in > 1/[[BoilerDen]] of all documents, so by pigeonhole there
  * are at most BoilerDen × (avg lines/doc) such lines in ANY corpus —
  * the broadcast is bounded by construction, never by luck. Rebuilds use
  * order-preserving `filter` over the original line array (no
  * position bookkeeping, no window).
  */
object LineCurationQueries {

  // ---- line rules (C4 §2.2, re-parameterized like q87's Gopher rules) ----
  private[operators] val LMinWords = 3  // C4: >= 3 words per line
  private[operators] val LMinKept  = 2  // page keep: >= LMinKept surviving lines
  private[operators] val PunctRe   = "[.!?\"]$" // terminal punctuation
  // boilerplate: line present in > 1/BoilerDen of all docs (integer-decided)
  private[operators] val BoilerDen = 10

  // ---- enrichment strata (pure functions of doc_id; oracle recomputes) ----
  private val LineJs    = "you need javascript enabled to view it."
  private val LineLorem = "lorem ipsum dolor sit amet."
  private val LineBrace = "function() { return 0; }"
  private val LineShort = "ok fine."
  private val LineFox   = "the quick brown fox jumps over the lazy dog."
  private val LineExtra = "a second fine sentence appears right here."

  /** Reshape the single-line corpus text into a multi-line page: the base
    * text (terminal '.' only for even ids — exercising the punctuation
    * rule both ways), plus stratified noise/filler lines. */
  private[operators] def lineText: Column = {
    def nl(cond: Column, line: String): Column =
      when(cond, concat(lit("\n"), lit(line))).otherwise(lit(""))
    concat(col("text"),
      when(col("doc_id") % 2 === 0, lit(".")).otherwise(lit("")),
      nl(col("doc_id") % 3 === 0, LineJs),
      nl(col("doc_id") % 11 === 0, LineLorem),
      nl(col("doc_id") % 13 === 0, LineBrace),
      nl(col("doc_id") % 5 === 0, LineShort),
      nl(col("doc_id") % 2 === 1, LineFox),
      nl(col("doc_id") % 7 === 0, LineExtra))
  }

  private def lineEnrichSql: String =
    s"""SELECT doc_id, concat(text,
       |  CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END,
       |  CASE WHEN doc_id % 3 = 0 THEN concat(chr(10), '$LineJs') ELSE '' END,
       |  CASE WHEN doc_id % 11 = 0 THEN concat(chr(10), '$LineLorem') ELSE '' END,
       |  CASE WHEN doc_id % 13 = 0 THEN concat(chr(10), '$LineBrace') ELSE '' END,
       |  CASE WHEN doc_id % 5 = 0 THEN concat(chr(10), '$LineShort') ELSE '' END,
       |  CASE WHEN doc_id % 2 = 1 THEN concat(chr(10), '$LineFox') ELSE '' END,
       |  CASE WHEN doc_id % 7 = 0 THEN concat(chr(10), '$LineExtra') ELSE '' END
       |  ) AS etext FROM documents WHERE text IS NOT NULL""".stripMargin

  // ---- Q90: C4-style line quality filter ----

  /** The per-line keep rule (C4 §2.2): no javascript mention, terminal
    * punctuation, >= [[LMinWords]] words. Shared by q90, [[cleanLines]],
    * and [[pageKeepCol]] so the batch operator and the production/stream
    * forms cannot drift apart. */
  private[operators] def lineKeep(l: Column): Column =
    !l.contains("javascript") && l.rlike(PunctRe) && size(split(l, " ")) >= LMinWords

  /** Production form: strip rule-failing lines from a raw text column,
    * preserving line order (null in -> null out). Pure projection —
    * streaming-safe, the line-level twin of
    * [[WebCurationQueries.scrubText]]. */
  def cleanLines(c: Column): Column =
    array_join(filter(split(c, "\n"), l => lineKeep(l)), "\n")

  /** Production page gate over a raw text column: >= [[LMinKept]] kept
    * lines and neither page-level flag (lorem ipsum / brace). Null in ->
    * null out (callers decide the null policy). */
  def pageKeepCol(c: Column): Column =
    size(filter(split(c, "\n"), l => lineKeep(l))) >= LMinKept &&
      !c.contains("lorem ipsum") && !c.contains("{")

  /** The composed production form over a document frame's `text` column:
    * drop pages failing the gate, rewrite survivors to their kept lines.
    * Splits and filters each text ONCE (review r8: calling [[pageKeepCol]]
    * and [[cleanLines]] separately re-runs the split + per-line rules —
    * Catalyst does not CSE higher-order lambdas). Null-text rows pass
    * through untouched. Pure projection + filter — batch and streaming
    * safe. */
  def cleanPages(docs: DataFrame): DataFrame =
    docs
      .withColumn("__kept", filter(split(col("text"), "\n"), l => lineKeep(l)))
      .filter(col("text").isNull ||
        (size(col("__kept")) >= LMinKept &&
          !col("text").contains("lorem ipsum") && !col("text").contains("{")))
      .withColumn("text",
        when(col("text").isNull, col("text"))
          .otherwise(array_join(col("__kept"), "\n")))
      .drop("__kept")

  // DuckDB rule fragments ('l' is the line); drop-reason classification
  // is priority-ordered (js > punctuation > word count) so each dropped
  // line is counted exactly once.
  private val dIsJs    = "contains(l, 'javascript')"
  private val dIsPunct = s"regexp_matches(l, '$PunctRe')"
  private val dIsWords = s"len(string_split(l, ' ')) >= $LMinWords"
  private val dKeep    = s"NOT $dIsJs AND $dIsPunct AND $dIsWords"

  /** Q90 — C4 line-level cleaning (Raffel et al. 2020 §2.2): per page,
    * classify every line (keep / javascript / no terminal punctuation /
    * too few words), flag the page-level "lorem ipsum" and "{" drops,
    * decide page retention (>= [[LMinKept]] kept lines and neither page
    * flag), and rebuild the cleaned text from the kept lines in order.
    * One codegen'd projection over array higher-order functions — at
    * 100 TB this is scan-bound like q29/q84/q87. */
  def q90LineQuality(spark: SparkSession, dir: String): DataFrame =
    // r16: sort below the projection (the q84 ruling) — the raw
    // (doc_id, text) rows range-sort first, the per-line rule projection
    // runs once after the sort instead of twice (sampling + shuffle).
    lineQuality(Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc))

  private[graft] def lineQuality(docs: DataFrame): DataFrame = {
    val lines = col("lines")
    def cnt(p: Column => Column) = size(filter(lines, p)).cast("long")
    // the keep-filter is materialized ONCE per row ("kept") — Catalyst
    // does not CSE higher-order lambdas, so repeating filter(lines,
    // lineKeep) in n_kept/page_keep/clean_text would run the regex +
    // word split three times over every line (review r8)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), lineText.as("etext"))
      .withColumn("lines", split(col("etext"), "\n"))
      .withColumn("kept", filter(lines, l => lineKeep(l)))
      .select(
        col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        cnt(l => l.contains("javascript")).as("n_drop_js"),
        cnt(l => !l.contains("javascript") && !l.rlike(PunctRe)).as("n_drop_punct"),
        cnt(l => !l.contains("javascript") && l.rlike(PunctRe) &&
          size(split(l, " ")) < LMinWords).as("n_drop_words"),
        col("etext").contains("lorem ipsum").as("page_lorem"),
        col("etext").contains("{").as("page_brace"),
        (size(col("kept")) >= LMinKept &&
          !col("etext").contains("lorem ipsum") && !col("etext").contains("{"))
          .as("page_keep"),
        array_join(col("kept"), "\n").as("clean_text"))
  }

  // ---- Q91: cross-document repeated-line (boilerplate) removal ----

  /** Q91 — repeated-line boilerplate removal (CCNet, Wenzek et al. 2020;
    * Dolma's paragraph dedup): a line appearing in more than
    * 1/[[BoilerDen]] of all documents is corpus boilerplate and is
    * stripped from every page; per doc this reports line/boilerplate
    * counts and the rebuilt text. The census groups on md5(line) (uniform
    * 32-char shuffle keys, map-side partials collapse hot lines — the q52
    * census discipline); the resulting boilerplate set is pigeonhole-
    * bounded (<= BoilerDen × avg-lines-per-doc entries) so it travels as a
    * one-row broadcast array and the rebuild is a shuffle-free projection
    * over the original line order. */
  def q91BoilerplateLines(spark: SparkSession, dir: String): DataFrame =
    // r16 note: the q84 sort-below-projection restructure was tried here
    // and REVERTED — the sort would sit below the boiler crossJoin, and
    // EliminateSorts drops both orderBy and sortWithinPartitions under a
    // join (verified on the r16 plan, which came back sortless — an
    // order-contract break the oracle only catches when scan order
    // diverges). The top-level sort and its sampling double-eval stay.
    boilerplateLines(Tables.documents(spark, dir)).orderBy(col("doc_id").asc)

  private[graft] def boilerplateLines(docs: DataFrame): DataFrame = {
    val pages = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), lineText.as("etext"))
      .withColumn("lines", split(col("etext"), "\n"))
    val exploded = pages.select(col("doc_id"), explode(col("lines")).as("line"))
      .select(col("doc_id"), md5(col("line")).as("h"))
    val census = exploded.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    val total = pages.agg(count(lit(1)).as("n_total"))
    // bounded-by-pigeonhole boilerplate set as a single-row array (empty
    // array when nothing crosses the threshold — agg over zero rows still
    // yields one row)
    val boiler = census.crossJoin(broadcast(total))
      .filter(col("nd") * BoilerDen > col("n_total"))
      .agg(collect_list(col("h")).as("bl"))
    // md5 is computed ONCE per line (hs), not once per consumer — the
    // n_boiler filter and the clean_text rebuild both read the same hash
    // array (ADVICE r8: the previous form hashed every line twice). The
    // membership probe stays array_contains: Spark map values are
    // array-backed (ArrayBasedMapData), so element_at(map, k) is the same
    // linear scan — and |bl| is pigeonhole-bounded (<= BoilerDen ×
    // avg-lines-per-doc), a small constant at any corpus scale.
    pages.crossJoin(broadcast(boiler))
      .withColumn("hs", expr("transform(lines, l -> md5(l))"))
      .select(
        col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        expr("size(filter(hs, h -> array_contains(bl, h)))")
          .cast("long").as("n_boiler"),
        expr("array_join(filter(lines, (l, i) -> NOT array_contains(bl, element_at(hs, i + 1))), chr(10))")
          .as("clean_text"))
  }

  // ---- Q105: intra-document repeated-paragraph removal ----

  /** Words per synthetic paragraph for q105's enrichment. */
  private[operators] val ParaWords = 6

  /** Q105 — INTRA-document repeated-paragraph removal with order-preserving
    * reassembly (the RefinedWeb/Dolma in-page dedup step — crawled pages
    * repeat nav blocks and footers WITHIN a page; q91 removes lines that
    * repeat ACROSS pages, this removes paragraphs that repeat INSIDE one).
    * Keep-first semantics: a paragraph survives iff its first occurrence
    * index equals its own index.
    *
    * The word-salad corpus has no paragraph structure, so — the q38/q84
    * enrichment pattern — each doc is reshaped into [[ParaWords]]-word
    * paragraphs and deterministic duplicates are injected from its own
    * doc_id strata (doc_id%2: para 1 re-appended; doc_id%3: para 2 — both
    * 1-based, mirrored exactly in the oracle), covering none/one/both and
    * keep-first across the corpus.
    *
    * Scale shape: ONE narrow codegen'd projection — split, chunk, inject,
    * index-aware `filter` (first-position == index), md5 of the rejoined
    * survivors — zero shuffles until the output sort. The in-array
    * first-position probe is O(paras²) per doc with paras bounded by
    * page size: at 100 TB this rides the scan for free, the cheapest
    * possible shape (contrast q91, which must census across docs). */
  def q105ParaDedup(spark: SparkSession, dir: String): DataFrame =
    // r16: sort below the projection (the q84 ruling) — raw rows
    // range-sort first, the chunk/inject/dedup/md5 projection runs once.
    paraDedup(Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc))

  private[graft] def paraDedup(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("w", split(col("text"), " "))
      .withColumn("paras", expr(
        s"transform(sequence(0, cast((size(w) + $ParaWords - 1) div $ParaWords as int) - 1), " +
          s"i -> concat_ws(' ', slice(w, i * $ParaWords + 1, $ParaWords)))"))
      .withColumn("paras", concat(col("paras"),
        when(col("doc_id") % 2 === 0 && size(col("paras")) >= 1,
          array(element_at(col("paras"), 1)))
          .otherwise(expr("cast(array() as array<string>)")),
        when(col("doc_id") % 3 === 0 && size(col("paras")) >= 2,
          array(element_at(col("paras"), 2)))
          .otherwise(expr("cast(array() as array<string>)"))))
      .withColumn("keep",
        expr("filter(paras, (p, i) -> array_position(paras, p) = i + 1)"))
      .select(col("doc_id"),
        size(col("paras")).cast("long").as("n_paras"),
        size(col("keep")).cast("long").as("n_kept"),
        md5(concat_ws(" | ", col("keep"))).as("doc_md5"))

  // ---- catalog wiring ----

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q90_line_quality" -> (q90LineQuality _),
    "q91_boilerplate_lines" -> (q91BoilerplateLines _),
    "q105_para_dedup" -> (q105ParaDedup _),
  )

  val oracle: Map[String, String] = Map(
    "q90_line_quality" ->
      s"""WITH e AS ($lineEnrichSql),
         |x AS (SELECT doc_id, string_split(etext, chr(10)) AS lines, etext FROM e)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(lines, l -> $dKeep)) AS BIGINT) AS n_kept,
         |  CAST(len(list_filter(lines, l -> $dIsJs)) AS BIGINT) AS n_drop_js,
         |  CAST(len(list_filter(lines, l -> NOT $dIsJs AND NOT $dIsPunct)) AS BIGINT) AS n_drop_punct,
         |  CAST(len(list_filter(lines, l -> NOT $dIsJs AND $dIsPunct AND NOT ($dIsWords))) AS BIGINT) AS n_drop_words,
         |  contains(etext, 'lorem ipsum') AS page_lorem,
         |  contains(etext, '{') AS page_brace,
         |  (len(list_filter(lines, l -> $dKeep)) >= $LMinKept
         |    AND NOT contains(etext, 'lorem ipsum') AND NOT contains(etext, '{')) AS page_keep,
         |  array_to_string(list_filter(lines, l -> $dKeep), chr(10)) AS clean_text
         |FROM x ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q91_boilerplate_lines" ->
      s"""WITH e AS ($lineEnrichSql),
         |x AS (SELECT doc_id, string_split(etext, chr(10)) AS lines FROM e),
         |u AS (SELECT doc_id, unnest(lines) AS line FROM x),
         |c AS (SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS nd FROM u GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n FROM e),
         |b AS (SELECT COALESCE(list(h), []) AS bl FROM c, tot WHERE c.nd * $BoilerDen > tot.n)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(list_filter(lines, l -> list_contains(b.bl, md5(l)))) AS BIGINT) AS n_boiler,
         |  array_to_string(list_filter(lines, l -> NOT list_contains(b.bl, md5(l))), chr(10)) AS clean_text
         |FROM x, b ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q105_para_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |     WHERE text IS NOT NULL),
         |p AS (SELECT doc_id, list_transform(range((len(w) + $ParaWords - 1) // $ParaWords),
         |    i -> array_to_string(list_slice(w, i * $ParaWords + 1, i * $ParaWords + $ParaWords), ' ')) AS paras FROM t),
         |p2 AS (SELECT doc_id, paras
         |  || CASE WHEN doc_id % 2 = 0 AND len(paras) >= 1 THEN [paras[1]] ELSE [] END
         |  || CASE WHEN doc_id % 3 = 0 AND len(paras) >= 2 THEN [paras[2]] ELSE [] END AS paras FROM p),
         |k AS (SELECT doc_id, paras, list_filter(paras, (x, i) -> list_position(paras, x) = i) AS keep FROM p2)
         |SELECT doc_id, CAST(len(paras) AS BIGINT) AS n_paras,
         |  CAST(len(keep) AS BIGINT) AS n_kept,
         |  md5(array_to_string(keep, ' | ')) AS doc_md5
         |FROM k ORDER BY doc_id NULLS FIRST""".stripMargin,
  )
}
