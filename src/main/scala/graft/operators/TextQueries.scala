package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text analysis over `documents` and JSON/array handling over
  * `events.props` — the quality/language/token layer of a training-data
  * pipeline (VERDICT r1 "next round" #6).
  *
  * Every per-doc computation here is a narrow, codegen'd projection (split /
  * filter / aggregate higher-order functions, no UDFs): at 100 TB these ride
  * the scan for free; the only shuffles are the final small aggregations.
  */
object TextQueries {

  private val dec = DecimalType(18, 2)

  /** Engine-stable mean, rounded to 2 decimals: decimal sum -> exact double
    * cast, one IEEE division by the count, one rounding. AVG-over-DECIMAL
    * has engine-specific intermediate scales (Spark decimal(·,6) vs DuckDB
    * double), so it is never used directly in oracle-checked outputs. */
  private def davg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(sum(c.cast(dec)).cast("double") / count(c), 2)

  /** Stopword list for ratio scoring (tiny; inlined as a literal array —
    * a real deployment would broadcast a dictionary). */
  // shared with CurationPipeline (q52's quality gate IS q29's metric — a
  // second list would let the gate silently drift from the metric)
  private[operators] val Stopwords = Seq("the", "a", "of", "and", "is", "in", "to")
  private[operators] def stopSqlList: String = Stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
  private[operators] def stopArray: String = Stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")

  /** Word-or-symbol tokenizer ("BPE-ish" pre-tokenization: words, digits
    * runs, or single punctuation marks — the usual pre-merge split). Same
    * RE2/Java-compatible pattern on both engines. */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Q29 — per-document token/length/quality stats: whitespace token count,
    * regex (BPE-ish) token count, mean token length, stopword ratio. One
    * narrow projection + deterministic sort. */
  def q29TextStats(spark: SparkSession, dir: String): DataFrame =
    // r16: sort below the projection (the q84 ruling — range sampling
    // evaluates a map-only sort child twice; sorting the raw rows first
    // runs the split/aggregate/regex projection once, after the sort).
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc)
      .withColumn("w", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(regexp_extract_all(col("text"), lit(TokenRegex), lit(0)))
          .cast("long").as("n_tokens_re"),
        length(col("text")).cast("long").as("n_chars_calc"),
        (expr("aggregate(w, 0L, (acc, x) -> acc + length(x))").cast("double") /
          size(col("w")).cast("double")).as("avg_token_len"),
        (size(expr(s"filter(w, x -> array_contains($stopArray, x))")).cast("double") /
          size(col("w")).cast("double")).as("stopword_ratio"))

  /** Q30 — corpus census by language: doc counts, char volume, source
    * spread, mean length. Map-side partial agg into 5 groups. */
  def q30LangStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        countDistinct(col("source")).as("n_sources"),
        davg(col("n_chars")).as("avg_chars"))
      .orderBy(col("lang").asc)

  /** Q31 — language ID by stopword-profile scoring: argmax over per-language
    * marker-word hit counts with deterministic tie-break order (en > fr > es
    * > de > zh). On this synthetic corpus every language shares one
    * vocabulary, so the prediction is degenerate by construction — the
    * operator (profile scoring as pure Column arithmetic) is what is under
    * test, and the oracle pins it end-to-end. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and"),
    "fr" -> Seq("le", "la", "et"),
    "es" -> Seq("el", "los", "y"),
    "de" -> Seq("der", "die", "und"),
    "zh" -> Seq("de", "shi", "le"),
  )

  def q31LangId(spark: SparkSession, dir: String): DataFrame = {
    // r16: sort below the marker-scoring projection (the q84 ruling)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc)
      .withColumn("w", split(col("text"), " "))
    val scored = LangMarkers.foldLeft(docs) { case (df, (lang, markers)) =>
      val arr = markers.map(m => s"'$m'").mkString("array(", ", ", ")")
      df.withColumn(s"score_$lang", size(expr(s"filter(w, x -> array_contains($arr, x))")))
    }
    // argmax with fixed priority order on ties
    val best = LangMarkers.map(_._1).tail.foldLeft(
      (col("score_en"), lit("en"))) { case ((bestScore, bestLang), lang) =>
      val s = col(s"score_$lang")
      (when(s > bestScore, s).otherwise(bestScore),
        when(s > bestScore, lit(lang)).otherwise(bestLang))
    }
    scored
      .select(col("doc_id"), col("lang").as("lang_actual"), best._2.as("lang_pred"))
  }

  /** Q32 — JSON extraction + aggregation over events.props. from_json with
    * an explicit schema (single parse; get_json_object would re-parse per
    * field), then a 4-group aggregate. */
  def q32EventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("p", from_json(col("props"), lit("k INT")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p.k")).cast("long").as("sum_k"),
        davg(col("p.k")).as("avg_k"),
        min(col("p.k")).cast("long").as("min_k"),
        max(col("p.k")).cast("long").as("max_k"))
      .orderBy(col("event_type").asc)

  /** Q33 — rolling document fingerprint: min-sampled hash over 8-char
    * grams (the winnowing 'keep the minimum' rule). One typed
    * mapPartitions — per-gram md5 is hot-loop JVM code with a reused
    * digest, not an interpreted lambda; narrow, no shuffle. */
  val GramLen = 8

  def q33Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= GramLen)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      // r16 (the q84 ruling, typed-map variant): the CPU-bound md5 loop
      // used to sit UNDER the output sort, so range sampling ran it a
      // second time. Range-repartition + per-partition sort on the raw
      // rows FIRST (this is also the parallelism spreader the old
      // round-robin repartition provided), then the map — Iterator.map
      // preserves order, so the output is already globally doc_id-ordered
      // and the trailing orderBy is gone. The hot loop now runs once.
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc)
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          // windows advance by CODE POINT, not UTF-16 unit: the SQL row
          // filter (Spark length = numChars) and the DuckDB oracle
          // (substr/length) both count code points, so a UTF-16 loop
          // would emit different grams — and split surrogate pairs — on
          // any non-BMP character
          val cpCount = text.codePointCount(0, text.length)
          var min: String = null
          var i = 0
          var startIdx = 0
          var endIdx =
            if (cpCount >= GramLen) text.offsetByCodePoints(0, GramLen) else 0
          while (i + GramLen <= cpCount) {
            val h = DedupQueries.md5hex(md, text.substring(startIdx, endIdx))
            if (min == null || h.compareTo(min) < 0) min = h
            i += 1
            if (i + GramLen <= cpCount) {
              startIdx = text.offsetByCodePoints(startIdx, 1)
              endIdx = text.offsetByCodePoints(endIdx, 1)
            }
          }
          (id, min)
        }
      }
      .toDF("doc_id", "fingerprint")
  }

  /** Search terms for the lexical retrieval demo (plan-time literals; a
    * real deployment broadcasts the query set). */
  val SearchTerms: Seq[String] = Seq("spark", "window", "hash")
  private def termSqlList: String = SearchTerms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** The q53 scoring stage as oracle CTEs ending in `lexall` (doc_id,
    * score_milli) — the SQL twin of [[lexicalScores]], shared with the q83
    * hybrid-fusion oracle so the two cannot drift. */
  private[graft] def lexicalSqlCtes: String =
    s"""hits AS (SELECT doc_id, token
       |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
       |    WHERE token IN $termSqlList),
       |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
       |dfx AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |lexall AS (SELECT doc_id, CAST(SUM(tf * ((n.n * 1000) // df)) AS BIGINT) AS score_milli
       |           FROM tf JOIN dfx USING (token), n GROUP BY doc_id)""".stripMargin

  /** Q53 — lexical document search: rational tf-idf top-k. Score of doc d =
    * sum over query terms t of tf(t,d) * (N * 1000 / df(t)) in EXACT
    * integer arithmetic (truncating division) — the log in classic idf is
    * replaced by the rational inverse document frequency because ln() is
    * not guaranteed bit-identical across engines, and exactness is what
    * makes the result hash-checkable; the ranking is order-equivalent to
    * linear-idf scoring. Plan shape: explode -> filter to query terms
    * (predicate prunes the token stream BEFORE any shuffle) -> tf per
    * (doc, term) -> broadcast df join -> sum -> TakeOrderedAndProject.
    * The corpus size N enters the plan as a broadcast 1-row aggregate
    * (r5: previously a driver-side docs.count() per invocation — a second
    * scan job; the parquet-metadata count now rides inside the same job).
    * The lexical complement to the vector ANN family (q26/q27/q42). */
  def q53DocSearch(spark: SparkSession, dir: String): DataFrame =
    lexicalScores(spark, dir)
      .orderBy(col("score_milli").desc, col("doc_id").asc)
      .limit(20)

  /** The q53 scoring stage without the top-k: every matching doc's exact
    * integer tf-idf score — reused by the q83 hybrid fusion, whose lexical
    * leg ranks the same scores at a different depth. */
  private[graft] def lexicalScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val corpusN = docs.agg(count(lit(1)).as("n"))
    val hits = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").isInCollection(SearchTerms))
    val tf = hits.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = hits.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(corpusN))
      .withColumn("w", col("tf") * expr("(n * 1000) DIV df"))
      .drop("n")
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).cast("long").as("score_milli"))
  }

  /** Q60 — per-group feature normalization (z-score of document length
    * within each language): the feature-scaling primitive of a training
    * pipeline, in the group-stats-broadcast-back-to-rows shape. Stats come
    * from EXACT integer power sums (the q44 discipline — order-independent,
    * so partial aggregation cannot perturb them; DECIMAL(38,0) because
    * sum(n_chars^2) rides past Long at web-corpus scale), converted to
    * doubles once, in the same expression order as the oracle => bit-stable
    * z-scores. The stats table is |langs| rows — broadcast by AQE; each row
    * then computes z = (x - mean) / std in one codegen'd projection. */
  def q60ZScoreNormalize(spark: SparkSession, dir: String): DataFrame = {
    val big = DecimalType(38, 0)
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val stats = d.groupBy(col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("n_chars").cast(big)).as("s1"),
      sum((col("n_chars") * col("n_chars")).cast(big)).as("s2"))
    val mean = col("s1").cast("double") / col("n").cast("double")
    val variance = (col("n").cast(big) * col("s2") - col("s1") * col("s1")).cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double"))
    val std = sqrt(variance)
    d.join(stats, "lang")
      .select(
        col("doc_id"), col("lang"),
        when(variance > 0.0,
          (col("n_chars").cast("double") - mean) / std).otherwise(0.0).as("z"))
      .orderBy(col("doc_id").asc)
  }

  /** Q63 — sequence packing: assign documents to fixed token-budget bins
    * (the batch-construction step before LLM training — minimize padding by
    * filling each context window with consecutive docs). Contiguous greedy
    * packing: within each (lang, shard) stream, docs in deterministic
    * doc_id order, bin = floor(pre-sum / budget) over the running token
    * count — each bin fills to the budget (+ at most one doc of overhang,
    * the standard streaming-packing contract). Sharding by doc_id % 32
    * bounds every window partition and makes the parallelism width
    * explicit: at 100 TB the shard count scales with the cluster while
    * each shard remains one ordered stream — no global sort anywhere. */
  val PackBudget = 2048L // tokens per bin

  def q63SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        // sign-preserving %, matching the oracle's DuckDB `doc_id % 32`
        // (pmod would shift every negative id into a different shard)
        (col("doc_id") % 32L).as("shard"),
        size(split(col("text"), " ")).cast("long").as("tokens"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("bin", floor((sum(col("tokens")).over(w) - col("tokens")) / PackBudget))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("sum_tokens"))
      .orderBy(col("lang").asc, col("shard").asc, col("bin").asc)
  }

  /** Benchmark-set membership for decontamination: held-out eval docs are
    * doc_id % 10 == 7 (a deterministic ~10% split standing in for the eval
    * suites a production pipeline loads from a side table). */
  val DecontamMod = 10L
  val DecontamRes = 7L

  /** Q66 — benchmark decontamination: for every training document, count the
    * distinct word-3-grams it shares with the held-out benchmark set — the
    * pre-training step that keeps eval data out of the training corpus
    * (n-gram overlap is the standard contamination test). Plan shape:
    * 3-grams via the native [[graft.functions.WordNGrams]] kernel riding
    * the scan, per-doc array_distinct
    * BEFORE the explode (caps the exploded stream at distinct grams),
    * benchmark grams distinct-ed then BROADCAST — eval suites are MBs even
    * when the corpus is 100 TB, so the contamination probe is a map-side
    * hash lookup; the only shuffles are the two per-doc count aggregates on
    * uniform doc_id keys. Integer hit-rate (permille, truncating DIV) keeps
    * the output hash-checkable. */
  /** (doc_id, gram) stream of per-document DISTINCT word-3-grams — the
    * contamination probe's unit of comparison. One codegen'd projection
    * over the native [[graft.functions.WordNGrams]] kernel (r5: replaced
    * the transform/slice/concat_ws HOF chain, which is CodegenFallback —
    * interpreted lambdas per gram per doc; the kernel emits zero-copy byte
    * slices in one scan). Rides the scan; works identically on a batch or
    * streaming frame; short/empty docs vanish at the explode. */
  /** Gram length for the decontamination family. Default 3 — the oracle
    * pin (short grams are the sf-testdata-visible setting); published
    * decontamination runs 8–13-word grams (GPT-3's 13-gram overlap filter
    * and its descendants), one conf away. Plan shape is
    * length-independent: longer grams mean FEWER rows after the per-doc
    * distinct (fewer docs clear the n-word floor) and a smaller benchmark
    * gram set to broadcast. */
  private[graft] val DecontamGramsKey = "spark.graft.decontam.grams"
  private[graft] def decontamGrams(df: DataFrame): Int =
    df.sparkSession.conf.get(DecontamGramsKey, "3").toInt

  def docGrams3(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.WordNGrams(col("text"), decontamGrams(docs)))).as("gram"))

  /** Distinct word-3-gram set of a benchmark/eval frame — needs only a
    * `text` column, so ANY external eval-suite table (its own parquet, a
    * registry snapshot) plugs in directly. Eval suites stay MBs at any
    * corpus scale, hence the broadcast in [[contaminationCounts]]. */
  def benchmarkGrams(benchmark: DataFrame): DataFrame =
    benchmark.filter(col("text").isNotNull)
      .select(explode(array_distinct(
        graft.functions.WordNGrams(col("text"), decontamGrams(benchmark)))).as("gram"))
      .distinct()

  /** Per-train-doc contamination counts against an EXTERNAL benchmark
    * frame: (doc_id, n_hits, n_grams), zero-hit docs included. This is the
    * production decontamination probe — the benchmark is a parameter, not
    * a carve-out of the corpus (VERDICT r5 next-round #5); [[q66Decontamination]]
    * and q75 keep the `doc_id % 10 == 7` split as their oracle pin and
    * route through here, so the pinned form and the external form cannot
    * drift. */
  def contaminationCounts(train: DataFrame, benchmark: DataFrame): DataFrame = {
    val grams = docGrams3(train)
    val tot = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val hits = grams.join(broadcast(benchmarkGrams(benchmark)), "gram")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    tot.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_grams"))
  }

  def q66Decontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % DecontamMod === DecontamRes)
    val train = docs.filter(col("doc_id") % DecontamMod =!= DecontamRes)
    contaminationCounts(train, bench)
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_hits"), col("n_grams"),
        expr("n_hits * 1000 DIV n_grams").as("hit_permille"))
      .orderBy(col("doc_id").asc)
  }

  /** Q67 — repetition signal (the Gopher-style quality filter): per-document
    * duplicate word-2-gram counts — highly repetitive documents (boilerplate,
    * keyword spam, generation loops) are dropped before training. Per-doc
    * work stays PER-DOC: one narrow projection sorts each doc's gram array
    * and folds a run-length pass over it (max run = the top gram's count) —
    * NO shuffle anywhere but the final presentation sort. The first form
    * exploded to (doc, gram) rows and aggregated twice — 3M shuffled rows
    * at sf0.1 recomputing what each row already knows. Measured: a wash at
    * sf0.1 (~1.3 s both forms — job floor), 2x at 10x data (3.25 ->
    * 1.63 s), and the gap widens with scale: the projection rides the scan
    * with perfect data parallelism while the explode form's shuffle grows
    * with the token stream. Exact integers + a thresholded flag (repetitive =
    * >20% duplicate 2-grams, integer cross-multiplication — no floats). */
  val RepetitivePermille = 200L

  def q67Repetition(spark: SparkSession, dir: String): DataFrame =
    // r16: sort below the projection (the q84 ruling) — the raw filtered
    // rows range-sort first; the ngram/array_sort/aggregate chain runs
    // once, above the sort, instead of twice (range sampling + shuffle).
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= 2)
      .select(col("doc_id"), col("text"))
      .repartitionByRange(spark.sparkContext.defaultParallelism, col("doc_id").asc)
      .sortWithinPartitions(col("doc_id").asc)
      .withColumn("g", array_sort(graft.functions.WordNGrams(col("text"), 2)))
      .withColumn("n_grams", size(col("g")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("g"))).cast("long"))
      // longest equal-adjacent run in the sorted array = max gram count
      .withColumn("top_gram_n", when(col("n_grams") < 2L, col("n_grams"))
        .otherwise(expr(
          """aggregate(sequence(1, size(g) - 1),
            |  named_struct('run', 1L, 'best', 1L),
            |  (acc, i) -> IF(element_at(g, i + 1) = element_at(g, i),
            |    named_struct('run', acc.run + 1L,
            |      'best', greatest(acc.best, acc.run + 1L)),
            |    named_struct('run', 1L, 'best', acc.best)),
            |  acc -> acc.best)""".stripMargin)))
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        (col("n_grams") - col("n_distinct")).as("n_repeated"), col("top_gram_n"))
      .withColumn("repetitive",
        col("n_repeated") * 1000L >= col("n_grams") * RepetitivePermille)

  /** Q68 — BPE merge-pair census: corpus-wide adjacent character-pair
    * frequencies — one training round of byte-pair encoding, the tokenizer-
    * construction primitive (the most frequent pair is the next BPE merge).
    * Collapse-first at the VOCAB level: words aggregate to (word, freq)
    * BEFORE any character-level work (natural text is Zipf-duplicated, so
    * the unique vocabulary is orders of magnitude smaller than the token
    * stream — the same principle as q61/q62's collapse-first dedup), then
    * pairs explode from unique words only, weighted by word frequency.
    * Two shuffles on uniform keys (word, then pair), map-side partials on
    * both, TakeOrderedAndProject for the top-k; ties broken by pair text so
    * the result is deterministic on both engines. */
  val BpeTopK = 50

  def q68BpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("freq"), explode(
        expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(BpeTopK)

  // ---- Q101: iterative BPE tokenizer training ----

  /** Merge rounds for q101 (a real tokenizer trains to a vocab budget of
    * tens of thousands; 8 rounds exercise the full iterate-census-merge
    * loop the budget just repeats). */
  val BpeRounds = 8

  /** Q101 — iterative BPE tokenizer TRAINING (Sennrich et al. 2016): q68
    * computes one merge round; this runs the actual training loop — N
    * rounds of (adjacent-pair census over the vocabulary → pick the most
    * frequent pair → apply the merge everywhere) — and returns the merge
    * table, i.e. the tokenizer. Ties break on (count desc, pair asc),
    * integer-exact on both engines.
    *
    * Representation: the corpus is [[WebCurationQueries.normalizeText]]-
    * normalized (symbols ⊂ [a-z0-9] — also what makes the encoding
    * delimiters collision-free), words collapse to a (word, freq) vocab
    * census FIRST (q68's collapse-first: merges operate on unique words
    * weighted by frequency, so per-round cost scales with VOCAB size, not
    * the token stream), and each word is encoded as bracket-delimited
    * symbols: "chat" → "&lt;c&gt;&lt;h&gt;&lt;a&gt;&lt;t&gt;". A merge of
    * pair (a,b) is then a plain string replace of "&lt;a&gt;&lt;b&gt;"
    * with "&lt;ab&gt;" — both engines' `replace` is left-to-right
    * non-overlapping, which IS BPE's greedy merge order, and the brackets
    * make a symbol-boundary-crossing match impossible.
    *
    * Scale shape: one corpus scan builds the vocab census; every round is
    * one vocab-sized census job + a 1-ROW collect (the argmax — the q95
    * bounded-collect discipline) + a narrow projection, with the vocab
    * [[Materialize]]d every [[BpeCheckpointEvery]] rounds (bounded-depth
    * lineage cut — ≤ 3 chained `replace` projections — so the loop stays
    * reliable-checkpoint safe on a cluster without paying a checkpoint
    * round-trip per round; r17, VERDICT r16 #3).
    * Like q94, the entry is EAGER at construction (the loop must run to
    * know the merges). Early-exhaustion (no pairs left) stops the loop;
    * the oracle's per-round scalar subqueries go empty at the same round,
    * so both engines emit the same short table. */
  def q101BpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeTrain(Tables.documents(spark, dir).filter(col("text").isNotNull), BpeRounds)

  /** The q101 body over ANY (text) frame — tools/BpeSmoke races its
    * per-round cost across corpus scales. */
  private[graft] def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab = Materialize.materialize(docs
      .select(explode(split(WebCurationQueries.normalizeText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("word"), "(.)", "<$1>").as("enc"), col("freq")))
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var r = 1
    var exhausted = false
    // r17 (VERDICT r16 #3, guide §2.4/§5): the r16 form Materialized the
    // vocab after EVERY merge — 8 synchronous vocab-sized checkpoint jobs
    // per call, one of them (after the final round) never read again. A
    // merge is ONE narrow `replace` projection, so letting up to
    // [[BpeCheckpointEvery]] of them chain keeps lineage bounded (≤ 3
    // projections above the last checkpoint — still reliable-checkpoint
    // safe on a cluster) while each round's census job re-evaluates at most
    // 2 cheap replaces instead of paying a checkpoint round-trip per round.
    // The data is identical at every round (same logical vocab), so merges
    // — and the oracle hashes — are bit-for-bit unchanged.
    var sinceCheckpoint = 0
    while (r <= rounds && !exhausted) {
      val top = vocab
        .select(col("freq"),
          split(expr("substring(enc, 2, length(enc) - 2)"), "><").as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(s) - 1), i -> concat('<', element_at(s, i), '><', element_at(s, i + 1), '>'))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val mergedEnc = pair.replace("><", "") // "<a><b>" -> "<ab>"
        merges += ((r, pair, mergedEnc.substring(1, mergedEnc.length - 1),
          top(0).getLong(1)))
        val next = vocab.select(
          replace(col("enc"), lit(pair), lit(mergedEnc)).as("enc"), col("freq"))
        sinceCheckpoint += 1
        // no checkpoint after the final round: the loop exits and the
        // frame is never read again (the r16 form paid that job for nothing)
        vocab =
          if (sinceCheckpoint >= BpeCheckpointEvery && r < rounds) {
            sinceCheckpoint = 0
            Materialize.materialize(next)
          } else next
        r += 1
      }
    }
    merges.toSeq.toDF("step", "pair", "merged", "n").orderBy(col("step").asc)
  }

  /** Merge rounds allowed to chain lazily between vocab checkpoints in
    * [[bpeTrain]] — bounds lineage depth (cluster restartability) while
    * cutting the per-round checkpoint round-trip (r17, VERDICT r16 #3). */
  private val BpeCheckpointEvery = 3

  /** DuckDB twin of [[q101BpeTrain]], generated by the same round loop
    * (the q95 CTE-stage discipline): per round a pair census, a LIMIT 1
    * argmax, and a `replace` re-encoding — MATERIALIZED CTEs, because
    * e(r) is referenced by both p(r+1) and e(r+1) and inlining would
    * double the expression tree per round. */
  private[operators] def bpeOracleSql(rounds: Int): String = {
    val norm = s"trim(regexp_replace(regexp_replace(translate(text, " +
      s"'${WebCurationQueries.Upper}', '${WebCurationQueries.Lower}'), " +
      "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    val head = Seq(
      s"w AS (SELECT $norm AS t FROM documents WHERE text IS NOT NULL)",
      "v0 AS (SELECT word, COUNT(*) AS freq FROM (SELECT unnest(string_split(t, ' ')) AS word FROM w) WHERE word <> '' GROUP BY word)",
      "e0 AS MATERIALIZED (SELECT regexp_replace(word, '(.)', '<\\1>', 'g') AS enc, freq FROM v0)")
    val perRound = (1 to rounds).flatMap { r =>
      val p = r - 1
      Seq(
        s"p$r AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (" +
          "SELECT freq, unnest(list_transform(range(len(s)-1), i -> '<' || s[i+1] || '><' || s[i+2] || '>')) AS pair " +
          s"FROM (SELECT string_split(substr(enc, 2, length(enc)-2), '><') AS s, freq FROM e$p)) GROUP BY pair)",
        s"t$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair ASC LIMIT 1)",
        s"e$r AS MATERIALIZED (SELECT replace(enc, (SELECT pair FROM t$r), " +
          s"(SELECT replace(pair, '><', '') FROM t$r)) AS enc, freq FROM e$p)")
    }
    val unions = (1 to rounds).map { r =>
      s"SELECT CAST($r AS INT) AS step, pair, " +
        s"replace(replace(pair, '<', ''), '>', '') AS merged, n FROM t$r"
    }.mkString(" UNION ALL ")
    (head ++ perRound).mkString("WITH ", ",\n", "\n") +
      s"SELECT * FROM ($unions) ORDER BY step NULLS FIRST"
  }

  // ---- Q104: BPE tokenizer APPLY (train -> encode the corpus) ----

  /** Q104 — apply the q101-trained tokenizer to the corpus: per-document
    * BPE token counts, the number every budget/packing/mixture decision
    * downstream actually consumes (q63 packs and q70 mixes by WHITESPACE
    * tokens today; a real pipeline budgets by tokenizer output — this is
    * the train→apply half q101 was missing).
    *
    * Shape: train once (the q101 loop; the merge table is ≤ [[BpeRounds]]
    * rows — a bounded collect, the codebook discipline), then encoding is
    * a CHAIN OF LITERAL `replace`s compiled into one codegen'd projection
    * — the tokenizer travels inside the plan like the IVF codebook, not
    * as a joined table. The chain runs per occurrence INSIDE the scan
    * stage and the plan's only shuffle is the map-side-combined per-doc
    * aggregate (r13 — the full ladder of collapse-first alternatives
    * measured slower; numbers in [[bpeTokenCountsWith]]).
    *
    * Greedy-merge parity with a symbol-walking tokenizer is inherited
    * from q101's bracket encoding (left-to-right non-overlapping replace
    * IS BPE's application order; validated against an independent Python
    * symbol-tuple implementation at sf0.01, exact match). Like q101/q94
    * the entry is EAGER at construction (training must run to know the
    * merge literals). Early exhaustion just means a shorter chain; the
    * oracle's sentinel-guarded replaces (coalesce to '|', absent from the
    * enc alphabet `&lt;&gt;a-z0-9`) degrade to identity in the same
    * rounds, so both engines encode with the same effective merge list. */
  def q104BpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)

  // ---- The persisted tokenizer ARTIFACT (train-once / apply-many) ----

  /** One trained BPE merge, in application order. The whole tokenizer is
    * `rounds` of these — a bounded artifact like an IVF codebook. */
  final case class BpeMerge(step: Int, pair: String, merged: String, n: Long)

  /** Set to a directory to make q104/q106/q108 apply a FROZEN tokenizer
    * loaded from `<dir>/merges` (written by [[buildBpeTokenizer]])
    * instead of training on the scored corpus — the production shape:
    * the tokenizer is versioned with the model, not re-derived per batch. */
  private[graft] val BpeDirKey = "spark.graft.bpe.dir"

  /** Train on the corpus at `dir` and persist the merge table as the
    * tokenizer artifact — the [[SimilarityQueries.buildIvfIndex]]
    * lifecycle discipline applied to the tokenizer (VERDICT r10 #1): the
    * expensive pass (N census rounds over the vocabulary) runs ONCE at
    * build time; every downstream consumer loads ≤ `rounds` rows and is
    * pure apply. coalesce(1): the artifact is ≤ `rounds` rows. */
  def buildBpeTokenizer(spark: SparkSession, dir: String,
      tokenizerDir: String, rounds: Int = BpeRounds): Unit =
    bpeTrain(Tables.documents(spark, dir).filter(col("text").isNotNull), rounds)
      .coalesce(1).write.mode("overwrite").parquet(s"$tokenizerDir/merges")

  /** Load a persisted tokenizer: ≤ `rounds` rows, ordered by step — the
    * bounded-collect discipline (an IVF codebook read, not a data read). */
  def loadBpeMerges(spark: SparkSession, tokenizerDir: String): Seq[BpeMerge] =
    spark.read.parquet(s"$tokenizerDir/merges")
      .orderBy(col("step").asc).collect()
      .map(rowToMerge).toSeq

  /** Row → BpeMerge BY NAME, not ordinal: a parquet read is only
    * incidentally in write order, so a future column reorder in the
    * artifact would mis-bind ordinal reads silently (ADVICE r11). Shared
    * by every merge-collecting path so none can drift. */
  private def rowToMerge(r: org.apache.spark.sql.Row): BpeMerge =
    BpeMerge(r.getAs[Int]("step"), r.getAs[String]("pair"),
      r.getAs[String]("merged"), r.getAs[Long]("n"))

  /** Session-scoped train-once cache for the catalog entries: q104, q106
    * and q108 all tokenize the SAME corpus with the SAME tokenizer, so
    * training runs once per (corpus dir, rounds) per JVM instead of once
    * per entry (VERDICT r10 "What's wrong" #1 — the trio used to retrain
    * inline, 3 × 8 Materialize rounds in their timed windows). Keyed by
    * the corpus PATH: the testdata dirs are immutable inputs, and the
    * merge sequence is a deterministic function of (corpus, rounds), so
    * a cached tokenizer is bit-identical to a retrained one (BpeSpec pins
    * the round trip). q101 — the entry whose JOB is to time training —
    * calls [[bpeTrain]] directly and never reads this cache. */
  private val trainedTokenizers =
    scala.collection.concurrent.TrieMap.empty[(String, Int), Seq[BpeMerge]]

  /** Resolve the tokenizer for a catalog entry: the frozen artifact when
    * [[BpeDirKey]] is set, else the session cache (training on first
    * touch). */
  private[graft] def tokenizerFor(spark: SparkSession, dir: String,
      rounds: Int): Seq[BpeMerge] =
    spark.conf.getOption(BpeDirKey) match {
      case Some(td) => loadBpeMerges(spark, td)
      case None => trainedTokenizers.getOrElseUpdate((dir, rounds),
        bpeTrain(Tables.documents(spark, dir).filter(col("text").isNotNull), rounds)
          .collect().map(rowToMerge).toSeq)
    }

  /** Test hook: drop cached tokenizers (specs that train on constructed
    * corpora go through the explicit-merges forms and never need this;
    * it exists so a spec can pin that the cache is a pure memoization). */
  private[graft] def clearTokenizerCache(): Unit = trainedTokenizers.clear()

  /** The q104 catalog body: resolve the tokenizer (artifact / cache),
    * then pure apply. */
  private[graft] def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeTokenCountsWith(
      Tables.documents(spark, dir).filter(col("text").isNotNull),
      tokenizerFor(spark, dir, BpeRounds))
      .orderBy(col("doc_id"))

  /** Train-inline form kept for specs that exercise constructed corpora
    * end-to-end (train + apply in one call). */
  private[graft] def bpeEncode(docs: DataFrame, rounds: Int): DataFrame =
    bpeTokenCounts(docs, rounds).orderBy(col("doc_id"))

  /** Train-inline twin of [[bpeTokenCountsWith]] for constructed-corpus
    * specs. */
  private[graft] def bpeTokenCounts(docs: DataFrame, rounds: Int): DataFrame =
    bpeTokenCountsWith(docs, collectMerges(docs, rounds))

  private def collectMerges(docs: DataFrame, rounds: Int): Seq[BpeMerge] =
    // ≤ `rounds` rows by construction — the bounded-collect discipline.
    bpeTrain(docs, rounds).collect().map(rowToMerge).toSeq

  /** The merge chain as a codegen'd Column: bracket-encode, then one
    * literal `replace` per trained merge, in training order. */
  private def encChain(merges: Seq[BpeMerge]): org.apache.spark.sql.Column =
    merges.foldLeft(regexp_replace(col("word"), "(.)", "<$1>")) { (c, m) =>
      replace(c, lit(m.pair), lit(m.pair.replace("><", "")))
    }

  /** q104's per-document (n_words, n_tokens) frame WITHOUT the final
    * presentation sort — the composable form q108's packing consumes (a
    * sort under a join would either be dropped by the optimizer or, worse,
    * paid for nothing). PURE APPLY: the tokenizer arrives as data; no
    * training job hides in the plan.
    *
    * Apply shape (r13, the VERDICT r12 #2 ladder ruling): the merge chain
    * evaluates PER OCCURRENCE inside the scan's codegen stage, and the
    * only shuffle is the map-side-combined per-doc aggregate. The ladder
    * at sf1.0 (benched alone, min-of-3): census alone 1.03 s; census +
    * Materialize 1.32 s; the r11 vocab-level chain + equi-join form
    * 1.88 s; lazy-census twin 1.26 s; per-census-row chain 3.96 s
    * (r11's measured loser, reconfirmed); THIS single-shuffle
    * occurrence-inline form 0.75 s. The per-(doc, word) collapse barely
    * collapses (most words occur once per document), so the
    * census/checkpoint/distinct/join apparatus cost more than the chain
    * evaluations it saved. 100 TB shape: chain CPU is linear in corpus
    * tokens and rides the scan with full parallelism; the former shape
    * paid a corpus-sized checkpoint plus a second corpus-sized shuffle
    * for the join — the wrong trade at every scale measured. (A frozen
    * word→n_tok LOOKUP artifact — the production tokenizer-cache shape —
    * would beat both, but it moves the encode out of the timed apply;
    * the chain IS the encode.) */
  private[graft] def bpeTokenCountsWith(docs: DataFrame,
      merges: Seq[BpeMerge]): DataFrame = {
    val enc = encChain(merges)
    docs
      .select(col("doc_id"),
        explode(split(WebCurationQueries.normalizeText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col("doc_id"),
        (length(enc) - length(replace(enc, lit("<"), lit("")))).cast("long")
          .as("n_tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  /** The q104 oracle's CTE prefix (shared verbatim with q108's): the q101
    * training rounds with `word` carried through the re-encodes so the
    * final e-stage doubles as the word→token-count map (`map`), next to
    * the per-(doc, word) census (`pd`). Sentinel-guarded against early
    * exhaustion; generated by the same Scala loop as the engine's chain. */
  private def bpeApplyCtes(rounds: Int): Seq[String] = {
    val norm = s"trim(regexp_replace(regexp_replace(translate(text, " +
      s"'${WebCurationQueries.Upper}', '${WebCurationQueries.Lower}'), " +
      "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    val head = Seq(
      s"w AS (SELECT doc_id, $norm AS t FROM documents WHERE text IS NOT NULL)",
      "pd AS MATERIALIZED (SELECT doc_id, word, COUNT(*) AS cnt FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS word FROM w) WHERE word <> '' GROUP BY doc_id, word)",
      "v0 AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS freq FROM pd GROUP BY word)",
      "e0 AS MATERIALIZED (SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS enc, freq FROM v0)")
    val perRound = (1 to rounds).flatMap { r =>
      val p = r - 1
      Seq(
        s"p$r AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (" +
          "SELECT freq, unnest(list_transform(range(len(s)-1), i -> '<' || s[i+1] || '><' || s[i+2] || '>')) AS pair " +
          s"FROM (SELECT string_split(substr(enc, 2, length(enc)-2), '><') AS s, freq FROM e$p)) GROUP BY pair)",
        s"t$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair ASC LIMIT 1)",
        s"e$r AS MATERIALIZED (SELECT word, replace(enc, " +
          s"coalesce((SELECT pair FROM t$r), '|'), " +
          s"coalesce((SELECT replace(pair, '><', '') FROM t$r), '|')) AS enc, freq FROM e$p)")
    }
    val map =
      s"map AS (SELECT word, CAST(length(enc) - length(replace(enc, '<', '')) AS BIGINT) AS n_tok FROM e$rounds)"
    head ++ perRound :+ map
  }

  /** DuckDB twin of [[q104BpeEncode]]: the shared [[bpeApplyCtes]] prefix,
    * then the per-(doc, word) census joined to the map. */
  private[operators] def bpeApplyOracleSql(rounds: Int): String = {
    val tail =
      "SELECT pd.doc_id, CAST(SUM(pd.cnt) AS BIGINT) AS n_words, " +
        "CAST(SUM(pd.cnt * map.n_tok) AS BIGINT) AS n_tokens " +
        "FROM pd JOIN map USING (word) GROUP BY pd.doc_id ORDER BY pd.doc_id NULLS FIRST"
    bpeApplyCtes(rounds).mkString("WITH ", ",\n", "\n") + tail
  }

  /** DuckDB twin of [[q108TokenPacking]]: the shared [[bpeApplyCtes]]
    * prefix reduced to per-doc token counts, then exactly q63's packing
    * SQL with the tokenizer counts in place of whitespace counts. */
  private[operators] def bpePackingOracleSql(rounds: Int, budget: Long): String = {
    val tail =
      "tok AS (SELECT pd.doc_id, CAST(SUM(pd.cnt * map.n_tok) AS BIGINT) AS n_tokens " +
        "FROM pd JOIN map USING (word) GROUP BY pd.doc_id),\n" +
        "tl AS (SELECT t.doc_id, d.lang, t.doc_id % 32 AS shard, t.n_tokens " +
        "FROM tok t JOIN documents d ON d.doc_id = t.doc_id),\n" +
        "c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM tl)\n" +
        s"SELECT lang, shard, CAST((cum - n_tokens) // $budget AS BIGINT) AS bin, " +
        "COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens " +
        "FROM c GROUP BY lang, shard, bin " +
        "ORDER BY lang NULLS FIRST, shard NULLS FIRST, bin NULLS FIRST"
    (bpeApplyCtes(rounds) :+ tail).mkString("WITH ", ",\n", "")
  }

  // ---- Q108: context-window packing by TRAINED-tokenizer counts ----

  /** Context-window token budget for q108's bins. 4096 is a real context
    * length; at the measured sf0.01 per-doc mean of ~203 BPE tokens it
    * packs ~20 docs per bin, so the bins are genuinely multi-document at
    * every gate SF. */
  val TokenPackBudget = 4096L

  /** Q108 — sequence packing by TRAINED-tokenizer counts: q63's
    * greedy sequential fill (shard by doc_id, cumulative token sum within
    * (lang, shard), bin = offset div budget), but budgeted by the q104
    * BPE token counts instead of whitespace counts — the number a training
    * job actually packs context windows by. Composes q101 (train) → q104
    * (apply) → q63 (pack): the merge table is a bounded collect, the
    * apply chain is one codegen'd projection over the per-(doc, word)
    * census, and the only additions over q104 are a doc-grain equi-join
    * (for `lang`) and the q63 window whose parallelism knob is the shard
    * count — no new scale surface. EAGER at construction like q101/q104
    * (training must run to know the merge literals).
    *
    * Like q63 this is sequential FILL, not bin packing: a doc larger than
    * the budget spans bins by its start offset, and bins are per
    * (lang, shard) so packing never crosses a language (a training batch
    * shouldn't either). Output is the per-bin census (n_docs, sum_tokens)
    * — the shard manifest a packing job writes. */
  def q108TokenPacking(spark: SparkSession, dir: String): DataFrame =
    tokenPackingWith(Tables.documents(spark, dir).filter(col("text").isNotNull),
      tokenizerFor(spark, dir, BpeRounds), TokenPackBudget)

  /** Train-inline form for constructed-corpus specs. */
  private[graft] def tokenPacking(docs: DataFrame, rounds: Int,
      budget: Long): DataFrame =
    tokenPackingWith(docs, collectMerges(docs, rounds), budget)

  /** The q108 body over ANY (doc_id, lang, text) frame with an explicit
    * tokenizer — pure apply + q63's packing. */
  private[graft] def tokenPackingWith(docs: DataFrame, merges: Seq[BpeMerge],
      budget: Long): DataFrame = {
    val toks = bpeTokenCountsWith(docs, merges).select(col("doc_id"), col("n_tokens"))
    packingFromCounts(
      toks.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id")), budget)
  }

  /** q108's packing MANIFEST from already-computed token counts — a
    * (doc_id, lang, n_tokens) frame in, the (lang, shard, bin) manifest
    * out. Factored (r12) so the fused q108 and the ingest composition
    * (shards landed with counts by the frozen tokenizer; see
    * StreamingOps.tokenizedArrivals) derive bins from ONE definition:
    * a training job packs context windows from the STORED counts, never
    * by re-tokenizing the corpus. */
  private[graft] def packingFromCounts(counts: DataFrame,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sharded = counts
      .select(col("doc_id"), col("lang"),
        // sign-preserving %, matching the oracle's `doc_id % 32` (q63 pin)
        (col("doc_id") % 32L).as("shard"), col("n_tokens"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded
      .withColumn("bin", floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("lang").asc, col("shard").asc, col("bin").asc)
  }

  // ---- Q106: per-language tokenizer fertility audit ----

  /** Q106 — per-language tokenizer FERTILITY (chars/token, milli fixed-
    * point): the standard tokenizer-eval table a vocab team reads before
    * shipping a tokenizer — a language whose chars-per-token is low pays
    * more tokens per character of text, i.e. the tokenizer under-serves
    * it (Rust et al. 2021's fertility metric, applied corpus-side).
    * Composes the q101 trained merges with the q104 apply chain, grouped
    * by the corpus `lang` column instead of doc.
    *
    * Shape: training is the q101 loop (bounded merge collect); the
    * fertility table is ONE (lang, word) census — map-side partials
    * collapse each language's Zipf head before the shuffle — under the
    * same codegen'd literal-replace chain, re-aggregated to |langs| rows.
    * cpt_milli is integer fixed-point (chars×1000 div tokens), so both
    * engines derive every cell bit-for-bit. EAGER at construction like
    * q101/q104 (training must run first). */
  def q106TokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    tokenizerFertilityWith(
      Tables.documents(spark, dir).filter(col("text").isNotNull),
      tokenizerFor(spark, dir, BpeRounds))

  /** Train-inline form for constructed-corpus specs. */
  private[graft] def tokenizerFertility(docs: DataFrame, rounds: Int): DataFrame =
    tokenizerFertilityWith(docs, collectMerges(docs, rounds))

  /** The q106 body over ANY (lang, text) frame with an explicit
    * tokenizer (trained on the WHOLE corpus — one tokenizer, per-lang
    * audit); a null lang is its own group on both engines. */
  private[graft] def tokenizerFertilityWith(docs: DataFrame,
      merges: Seq[BpeMerge]): DataFrame = {
    val enc = encChain(merges)
    docs
      .select(col("lang"),
        explode(split(WebCurationQueries.normalizeText(col("text")), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("n_tok",
        (length(enc) - length(replace(enc, lit("<"), lit("")))).cast("long"))
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_tok")).as("n_tokens"),
        sum(col("cnt") * length(col("word"))).as("n_chars"))
      .withColumn("cpt_milli", expr("n_chars * 1000 div n_tokens"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** DuckDB twin of [[q106TokenizerFertility]]: the q104 CTE training
    * prefix with the census keyed by (lang, word); the training vocab
    * aggregates the SAME census over word, so both tokenizers are
    * identical by construction. Generated by the same Scala loop. */
  private[operators] def bpeFertilityOracleSql(rounds: Int): String = {
    val norm = s"trim(regexp_replace(regexp_replace(translate(text, " +
      s"'${WebCurationQueries.Upper}', '${WebCurationQueries.Lower}'), " +
      "'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
    val head = Seq(
      s"w AS (SELECT lang, $norm AS t FROM documents WHERE text IS NOT NULL)",
      "pl AS MATERIALIZED (SELECT lang, word, COUNT(*) AS cnt FROM (SELECT lang, unnest(string_split(t, ' ')) AS word FROM w) WHERE word <> '' GROUP BY lang, word)",
      "v0 AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS freq FROM pl GROUP BY word)",
      "e0 AS MATERIALIZED (SELECT word, regexp_replace(word, '(.)', '<\\1>', 'g') AS enc, freq FROM v0)")
    val perRound = (1 to rounds).flatMap { r =>
      val p = r - 1
      Seq(
        s"p$r AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (" +
          "SELECT freq, unnest(list_transform(range(len(s)-1), i -> '<' || s[i+1] || '><' || s[i+2] || '>')) AS pair " +
          s"FROM (SELECT string_split(substr(enc, 2, length(enc)-2), '><') AS s, freq FROM e$p)) GROUP BY pair)",
        s"t$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair ASC LIMIT 1)",
        s"e$r AS MATERIALIZED (SELECT word, replace(enc, " +
          s"coalesce((SELECT pair FROM t$r), '|'), " +
          s"coalesce((SELECT replace(pair, '><', '') FROM t$r), '|')) AS enc, freq FROM e$p)")
    }
    val tail =
      s"map AS (SELECT word, CAST(length(enc) - length(replace(enc, '<', '')) AS BIGINT) AS n_tok FROM e$rounds)\n" +
        "SELECT pl.lang, CAST(SUM(pl.cnt) AS BIGINT) AS n_words, " +
        "CAST(SUM(pl.cnt * map.n_tok) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(pl.cnt * length(pl.word)) AS BIGINT) AS n_chars, " +
        "CAST(SUM(pl.cnt * length(pl.word)) * 1000 // SUM(pl.cnt * map.n_tok) AS BIGINT) AS cpt_milli " +
        "FROM pl JOIN map USING (word) GROUP BY pl.lang ORDER BY pl.lang NULLS FIRST"
    (head ++ perRound :+ tail).mkString("WITH ", ",\n", "")
  }

  /** Q69 — document chunking: fixed token windows with stride overlap
    * (64-token windows every 48 tokens) — the segmentation step before the
    * embedding stage of a RAG/training pipeline (long docs exceed the
    * encoder context; overlap preserves cross-boundary semantics). One
    * narrow HOF projection builds each doc's chunk descriptors inline
    * (start, clamped length, md5 content fingerprint — the hash makes the
    * per-chunk CONTENT verifiable without shipping chunk text through the
    * shuffle or the gate), then posexplode; narrow, no shuffle until the
    * final sort. chunk_id = start/stride, so ids are stable under
    * re-chunking with the same stride. */
  val ChunkTokens = 64
  val ChunkStride = 48

  def q69Chunking(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, size(w) - 1, $ChunkStride),
           |  s -> named_struct(
           |    'start_tok', s,
           |    'n_tok', least($ChunkTokens, size(w) - s),
           |    'chunk_md5', md5(concat_ws(' ', slice(w, s + 1, $ChunkTokens)))))"""
          .stripMargin)).as(Seq("chunk_id", "c")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("c.start_tok").cast("long").as("start_tok"),
        col("c.n_tok").cast("long").as("n_tok"), col("c.chunk_md5"))
      .orderBy(col("doc_id").asc, col("chunk_id").asc)

  /** Per-token rarity weights are capped at one-in-a-billion so a hapax in
    * a 10^13-token corpus cannot push a document sum past Long range
    * (max doc sum <= 10^9 x doc tokens — Long-safe for any real document). */
  val RarityCap = 1000000000L

  /** Q72 — unigram rarity score: per-document mean inverse corpus frequency
    * of its words — the integer-exact stand-in for the LM-perplexity quality
    * filter (CCNet-style): rare-word-dense documents (typos, codes, junk
    * tails) score high, fluent common-vocabulary text scores low. Exact
    * integers end to end (ln() is not bit-portable across engines; rational
    * inverse frequency is order-equivalent to linear-likelihood scoring, the
    * q53 idf discipline).
    *
    * Shape (r13, VERDICT r12 #6 — the q104 occurrence-grain ruling applied
    * here): the token stream feeds the vocabulary census directly
    * (groupBy(word) with map-side partials — the Zipf head collapses per
    * map task) and the scoring join runs at OCCURRENCE grain into the
    * per-doc aggregate. The r12 collapse-first form built a (doc, word)
    * tf census + Materialize first; the ladder at sf1.0 (benched alone,
    * min-of-3): tf census alone 1.03 s, tf + checkpoint 1.29 s, the full
    * r12 form 1.85–2.83 s across sessions, a lazy-tf twin 1.92 s, THIS
    * occurrence-grain form 0.66 s — like q104, the per-(doc, word)
    * collapse barely collapses on real text (most words occur once per
    * doc), so the tf shuffle + checkpoint + narrower join bought less
    * than they cost. The vocabulary census is corpus-sized and CANNOT
    * broadcast at 100 TB (~10^8 distinct words), so the occurrence⋈vocab
    * equi-join is the standard co-partitioned big-big join (AQE broadcasts
    * it at small SFs, skew-splits the Zipf head at large ones); corpus
    * token count derives from the census (sum cf) as a broadcast 1-row
    * aggregate (the q53/q60 scalar-stats shape). */
  def q72Rarity(spark: SparkSession, dir: String): DataFrame =
    rarityScores(Tables.documents(spark, dir))
      .orderBy(col("doc_id").asc)

  /** Per-doc rarity scores for ANY document frame — (doc_id, n_tokens,
    * rarity_sum, rarity_milli). Shared by q72 (whole corpus) and the q75
    * pipeline (the decontaminated corpus), so the formula cannot drift
    * between the score and the filter that applies it. Occurrence-grain
    * (r13 ruling in [[q72Rarity]]): the lazy occurrence stream is consumed
    * twice (vocab census + scoring probe) — two explode passes cost less
    * than the (doc, word) shuffle + checkpoint they replaced, measured. */
  private[operators] def rarityScores(docs: DataFrame): DataFrame = {
    val occ = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val vocab = occ.groupBy(col("word")).agg(count(lit(1)).as("cf"))
    val totN = vocab.agg(sum(col("cf")).as("corpus_tokens"))
    occ.join(vocab, "word")
      .crossJoin(broadcast(totN))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(least(expr("corpus_tokens * 1000 DIV cf"), lit(RarityCap)))
          .cast("long").as("rarity_sum"))
      .withColumn("rarity_milli", expr("rarity_sum DIV n_tokens"))
  }

  // ---- Q94: unigram-LM perplexity scoring (the CCNet quality split) ----

  /** Q94 — language-model quality scoring in the CCNet style (Wenzek et
    * al. 2020): train a unigram LM on the corpus itself (token census +
    * corpus total), score every document by its per-token cross-entropy
    *   H = ln(N) − (Σ_t ln count(t)) / n_tokens   (nats/token)
    * and split the corpus into head/middle/tail terciles of H — CCNet's
    * signature move, where "reads like common text" (low H) gates what
    * enters training.
    *
    * Scale shape (rewritten per VERDICT r8 #2 — the r7/r8 form broadcast
    * the ENTIRE vocabulary as a one-row map, contradicting q72's own
    * ruling that the corpus vocab is un-broadcastable, and ranked with a
    * global ntile window):
    *   1. explode to (doc_id, pos, token); census groupBy(token) —
    *      vocab-sized, map-side partials (the q72 shape);
    *   2. equi-join tokens⋈census on token — the standard co-partitioned
    *      big-big join; the Zipf-hot head splits under AQE skew-join. The
    *      only broadcast is the 1-row corpus total. ln(cnt) is evaluated
    *      once per VOCAB row (truncated to floor(ln·10⁹) int64), never
    *      per occurrence — the q109 r12 lesson;
    *   3. per-doc sum: exact int64s, ORDER-INDEPENDENT, map-side
    *      combinable (r12 — replaced the positional collect_list +
    *      array_sort + sequential fold, which kept per-group array state
    *      and shipped every term through the shuffle; h_nats moves
    *      < 10⁻⁹, invisible at round(6), and the oracle applies the
    *      identical fixed-point encoding);
    *   4. terciles by EXACT global rank without a single-task window:
    *      range-partition + sort on (h_nats, doc_id) (strict total
    *      order), per-partition row_number (a PARTITIONED window), plus a
    *      partition-offset join. The offsets collect is ≤
    *      shuffle-partitions rows — config-bounded like the IVF codebook
    *      collects. ntile(3)'s bucket sizes (first n%3 buckets get
    *      ⌈n/3⌉) are reproduced from the total, so output is
    *      row-identical to the window formulation (the oracle).
    *
    * CONTRACT NOTE (ADVICE r9): unlike the rest of the catalog this entry
    * is EAGER at DataFrame-construction time — step 4's Materialize + the
    * (config-bounded) partition-count collect run real jobs before the
    * returned frame is acted on, so building/explaining the q94 plan scans
    * the corpus once. Intentional: the offsets cannot be known without
    * running the rank partitioning (the same trade as the IVF index
    * builds, which are eager for the same reason). */
  def q94Perplexity(spark: SparkSession, dir: String): DataFrame =
    perplexitySplit(Tables.documents(spark, dir))

  /** The q94 body over ANY (doc_id, text) frame — q94 routes the corpus
    * here; tools/PerplexitySmoke races it against the retired r8
    * formulation on a vocab-heavy synthetic corpus. */
  private[graft] def perplexitySplit(docs: DataFrame): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) > 0)
    val tokenOcc = toks.select(col("doc_id"), explode(col("toks")).as("token"))
    // r16: the vocab census has two consumers (the 1-row total and the
    // scoring join), so lazy it re-ran the corpus tokenize+explode — three
    // occurrence passes per query. The census is VOCAB-sized (unlike the
    // q112 trigram census, where the same pin measured as a loss — see
    // OPTIMIZATION_r16.md §1.4/§1.5), so the checkpoint is tiny and both
    // consumers read it: 3 corpus passes → 2.
    val counts = Materialize.materialize(
      tokenOcc.groupBy(col("token")).agg(count(lit(1)).as("cnt")))
    val totals = counts.agg(sum(col("cnt")).as("n_corpus"))

    // r12: the q109 fixed-point contract — ln(cnt) is a function of the
    // VOCAB row alone, truncated once per unique token to floor(ln·10⁹)
    // int64 (identical on both engines); the per-doc sum is exact
    // integers, ORDER-INDEPENDENT, so the collect_list + array_sort +
    // positional fold (per-group array state, no map-side combine — every
    // term crossed the shuffle inside per-doc arrays) collapses to a
    // plain partial-aggregating SUM. h_nats moves < 10⁻⁹ (round(6)), the
    // oracle applies the identical encoding.
    val scored = tokenOcc
      .join(counts.select(col("token"),
        floor(log(col("cnt").cast("double")) * lit(1.0e9)).as("t9")), "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"), sum(col("t9")).as("tsum"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        round(
          log(col("n_corpus")) -
            col("tsum").cast("double") / lit(1.0e9) / col("n_tokens"),
          6).as("h_nats"))

    // exact rank via the shared range-partition + offset-join helper
    // (extracted to GlobalRank, VERDICT r9 #9 — property-spec'd against
    // the global-window formulation it replaces)
    val (ranked, n) = GlobalRank.withGlobalRank(scored, "rank",
      Seq(col("h_nats").asc, col("doc_id").asc))
    val (q3, rem) = (n / 3, n % 3)
    val b1 = q3 + (if (rem >= 1) 1L else 0L)
    val b2 = b1 + q3 + (if (rem >= 2) 1L else 0L)

    ranked
      .select(col("doc_id"), col("n_tokens"), col("h_nats"),
        when(col("rank") <= b1, 1).when(col("rank") <= b2, 2).otherwise(3)
          .cast("int").as("bucket"))
      .orderBy(col("doc_id").asc)
  }

  // ---- Q109: bigram Stupid Backoff LM scoring (learned quality gate) ----

  /** Q109 — bigram language-model scoring with Stupid Backoff (Brants et
    * al. 2007): train a bigram LM on the CURATED slice of the corpus
    * (q102's deterministic src0–src9 split — the CCNet/LLaMA "train on
    * wiki, score the crawl" discipline), then score EVERY document by its
    * per-bigram cross-entropy under
    *   S(b|a) = c(a,b) / r(a)                      seen bigram
    *   S(b|a) = 0.4 · (c(b)+1) / (N+V)             backoff (add-one unigram)
    *   h_nats = −(Σ_i ln S(t_i | t_{i−1})) / (n−1)
    * The learned upgrade of q94's self-trained unigram split: the model is
    * trained on a reference slice, so out-of-domain documents genuinely
    * exercise the backoff path (`oov_bigrams` reports how often).
    *
    * EXACTNESS: every ln argument is an exact integer — α = 0.4 is encoded
    * as ln(2·(c(b)+1)) − ln(5·(N+V)), both integer-valued, so neither
    * engine ever evaluates ln on a value the other rounded differently.
    * Per-doc summation is FIXED-POINT (r12): each term truncates to
    * floor(term·10⁹) — the identical int64 on both engines — and the doc
    * sums exact integers, ORDER-INDEPENDENTLY. The previous contract
    * (position-ordered double fold) needed collect_list + array_sort per
    * doc, which both dominated the runtime (profiled sf1.0: the sorted
    * fold alone cost more than scan+joins+aggregation together) and, at
    * 100 TB, shipped EVERY term across the shuffle inside per-doc arrays
    * with no map-side combine; the integer sum restores partial
    * aggregation. Precision: |term| ≤ ~37 nats, so a doc needs > ~2·10⁸
    * tokens to overflow int64, and h_nats moves < 10⁻⁹ — invisible at
    * round(6) and applied identically in the oracle.
    *
    * Scale shape: censuses are vocab-/bigram-sized with map-side partials
    * and project to TERM TABLES of the same size (r12 — every ln runs
    * once per unique census key, not once per occurrence; VERDICT r11
    * #1); scoring joins the per-occurrence pair stream to the term tables
    * by co-partitioned LEFT equi-joins (the Zipf-hot head splits under
    * AQE skew join); the only broadcast is the 1-row fallback term;
    * per-doc fold state is bounded by DOC LENGTH (the q94 collect-struct
    * shape). Measured sf1.0 benched-alone: 4.47 → see ROUND12_NOTES.
    *
    * Ratio asymmetry vs q112 (r15 ruling, VERDICT r14 #2): q109 reads
    * 2.75× DuckDB benched alone (2.07 vs 0.75 s) while the strictly
    * DEEPER q112 trigram sibling reads 0.27× — same censuses, same term
    * tables, same per-occurrence join machinery plus one more level. The
    * asymmetry is entirely the DENOMINATOR: DuckDB clears the bigram
    * twin's two censuses + one join in 0.75 s single-process, but its
    * trigram twin (two more censuses, two more joins) blows past the
    * Spark wall. Spark pays a ~2 s multi-stage fixed cost on BOTH, then
    * scales sub-linearly with depth — exactly the profile you want at
    * 100 TB, where the fixed cost amortizes and the per-occurrence work
    * parallelizes. No plan defect; floor. */
  def q109BigramLm(spark: SparkSession, dir: String): DataFrame =
    bigramLmScores(Tables.documents(spark, dir))

  /** The frozen bigram LM (r12, the q104 vocab-level lesson applied per
    * VERDICT r11 #1): the SEEN-bigram term is a function of the census
    * pair alone, so `pairTerm` (a, b, t_ab = ln c_ab − ln r_a) evaluates
    * both lns ONCE per unique pair on a census-sized frame and folds the
    * cp⋈ra pair of joins into one — occurrences equi-join it and take the
    * hot path with ZERO per-occurrence lns. The backoff path keeps the
    * per-occurrence formula over `uni` (b, c_b) + the 1-row `tot`
    * (nn, vv): it is the RARE path (out-of-census pairs), and deriving a
    * backoff term table via crossJoin(tot) measured 1.5–6× SLOWER at
    * sf1.0 — the BNLJ-cross subtree has no shuffle stage for AQE to
    * re-plan from, so the occurrence stream fell into a sort-merge join
    * instead of the broadcast the raw census gets (ROUND12_NOTES). */
  final case class BigramLmModel(pairTerm: DataFrame, uni: DataFrame,
      tot: DataFrame)

  /** The training censuses: bigram counts `cp` (a, b, c_ab), left context
    * margins `ra` (a, r_a), add-one unigram census `uni` (b, c_b), and the
    * 1-row totals `tot` (nn, vv). */
  private final case class BigramCensuses(cp: DataFrame, ra: DataFrame,
      uni: DataFrame, tot: DataFrame)

  private def lmPairExpr = expr(
    "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")

  private def lmToks(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("toks"))

  /** The training censuses as LAZY frames — the fused q109's shape. The
    * double evaluation this allows (ra aggregates cp, tot aggregates uni,
    * both also join) is CHEAPER than pinning for a one-shot batch query:
    * materializing all four frames measured sf1.0 q109 5.7 → 7.2 s and
    * q112's twin 7.7 → 9.4 s (checkpoint round-trip > census recompute),
    * so the fused entries stay lazy and only the SERVING artifact pins. */
  private def bigramLmCensuses(docs: DataFrame): BigramCensuses = {
    // q102's deterministic curated-vs-crawl split (src0–src9 = curated)
    val train = docs.filter(col("text").isNotNull)
      .filter(replace(col("source"), lit("src"), lit("")).cast("int") < 10)
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) > 0)
    // r17 (VERDICT r16 #4): the checkpoint-FREE marked-census fold (the
    // domainExcess marker algebra — one explode carrying pair + unigram
    // censuses, consumers re-aggregating the shared lazy subtree under
    // AQE runtime stage reuse) was implemented and A/B'd benched-alone,
    // interleaved old/new, min-of-3 fresh JVMs each: q109 1.337 → 1.544 s,
    // q112 1.898 → 2.005 s. REJECTED — on this low-repeat synthetic corpus
    // the marked explode (n 3-field structs/doc vs n−1 2-field pairs) plus
    // the wider census key costs more than the separate explodes it saves,
    // the same calculus that rejected the r16 §1.4 checkpointed fold. The
    // two plain explodes below stay; at a Zipf-shaped 100 TB corpus the
    // fold flips (censuses ≪ occurrences) — documented scale lever.
    val uni = train.select(explode(col("toks")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c_b"))
    val cp = train.filter(size(col("toks")) >= 2)
      .select(explode(lmPairExpr).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ra = cp.groupBy(col("a")).agg(sum(col("c_ab")).as("r_a"))
    val tot = uni.agg(sum(col("c_b")).as("nn"), count(lit(1)).as("vv"))
    BigramCensuses(cp, ra, uni, tot)
  }

  /** Censuses → the serving model: the seen-pair term table evaluates its
    * lns once per unique census pair (the SAME exact-integer arguments the
    * fused per-occurrence form used, so scores are bit-identical); uni/tot
    * pass through for the rare backoff path. Frames stay LAZY here — the
    * fused q109 keeps the lazy-census ruling; [[bigramLmModel]] pins them
    * at the model boundary. */
  private def bigramLmTerms(c: BigramCensuses): BigramLmModel = {
    val pairTerm = c.cp.join(c.ra, Seq("a"))
      .select(col("a"), col("b"),
        (log(col("c_ab").cast("double")) - log(col("r_a").cast("double")))
          .as("t_ab"))
    BigramLmModel(pairTerm, c.uni, c.tot)
  }

  /** Train q109's Stupid-Backoff model on the CURATED slice — the train
    * half of the train/serve split, [[Materialize]]d frame by frame:
    * "trained once" is the SERVING contract (a lazy census would re-run
    * the full training aggregation on EVERY scoredArrivals micro-batch —
    * review r11). The fused batch entries use the lazy
    * [[bigramLmCensuses]] instead (measured ruling there). EAGER at
    * construction like q94/q101/q102 (catalog contract note). */
  private[graft] def bigramLmModel(docs: DataFrame): BigramLmModel = {
    val t = bigramLmTerms(bigramLmCensuses(docs))
    BigramLmModel(Materialize.materialize(t.pairTerm),
      Materialize.materialize(t.uni), Materialize.materialize(t.tot))
  }

  /** The q109 body over ANY (doc_id, source, text) frame: self-train on
    * the frame's curated slice, score every ≥2-token doc. */
  private[graft] def bigramLmScores(docs: DataFrame): DataFrame =
    // presentation sort lives HERE, not in the serve path: joined inside
    // scoreIngestBatch a pre-join global sort is paid for nothing (the
    // bpeTokenCounts composability rule; review r11). Lazy censuses:
    // one-shot batch scoring, the bigramLmCensuses measured ruling.
    scoreWithBigramLm(docs, bigramLmTerms(bigramLmCensuses(docs)))
      .orderBy(col("doc_id").asc)

  /** Score ANY (doc_id, text) frame against a TRAINED bigram LM — the
    * serve half (no label/source column read; works on unlabeled
    * arrivals). The occurrence stream LEFT equi-joins the model's
    * precomputed term tables (pair → seen term, unigram → backoff term,
    * 1-row broadcast fallback) and coalesces — zero per-occurrence lns,
    * two occurrence shuffles, same position-ordered fold as always.
    * [[bigramLmScores]] IS this over a self-trained model, so the
    * oracle-pinned q109 and the streaming scorer cannot drift. Docs with
    * < 2 tokens emit no row (nothing to score); callers left-join and
    * decide pass-through policy. */
  private[graft] def scoreWithBigramLm(docs: DataFrame,
      m: BigramLmModel): DataFrame =
    bigramTermSums(docs, m)
      .select(col("doc_id"), col("n_bigrams"), col("oov_bigrams"),
        round((-col("tsum").cast("double")) / lit(1.0e9) / col("n_bigrams"), 6)
          .as("h_nats"))

  /** The scoring stage BEFORE the per-doc rounding: exact int64 fixed-
    * point term sums per doc — [[scoreWithBigramLm]] is this plus the
    * h_nats divide, and q116's per-domain aggregation re-sums these
    * EXACT integers (a rounded per-doc h would not re-aggregate). */
  private def bigramTermSums(docs: DataFrame,
      m: BigramLmModel): DataFrame = {
    lmToks(docs).filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(lmPairExpr).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .join(m.pairTerm, Seq("a", "b"), "left")
      .join(m.uni, Seq("b"), "left")
      .crossJoin(broadcast(m.tot))
      .select(col("doc_id"),
        coalesce(col("t_ab"),
          log(((coalesce(col("c_b"), lit(0L)) + lit(1L)) * lit(2L)).cast("double")) -
            log(((col("nn") + col("vv")) * lit(5L)).cast("double"))).as("term"),
        when(col("t_ab").isNotNull, lit(0L)).otherwise(lit(1L)).as("oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("oov")).as("oov_bigrams"),
        sum(floor(col("term") * lit(1.0e9))).as("tsum"))
  }

  // ---- Q116: domain mixture reweighting (DoReMi-flavored) ----

  /** Q116 — domain mixture reweighting in the DoReMi spirit (Xie et al.
    * 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — its core signal: upweight domains with high EXCESS
    * loss under a reference model). Here the reference model is q109's
    * curated-trained bigram Stupid-Backoff LM, a domain is a `source`,
    * and each domain's excess is its token-level cross-entropy above the
    * best (lowest-H) domain:
    *   h(d)      = −Σ_docs tsum / 10⁹ / n_bigrams(d)   (nats/bigram)
    *   excess(d) = h_fix(d) − min_d h_fix               (nano-nats)
    *   weight(d) = excess(d)·1000 ÷ Σ excess            (permille)
    * Crawl domains (whose text the curated LM finds surprising) get the
    * large weights — on this corpus src10–19 land ~70–120‰ while curated
    * src0–9 sit ≤ 20‰ — exactly the "train more where the reference is
    * worst" mixture a DoReMi-lite pipeline feeds its sampler. NOT full
    * DoReMi: there is no proxy-model minimax loop — the reference-excess
    * table IS the deliverable (the sampler owns the iteration), stated
    * here so the scaladoc doesn't overclaim.
    *
    * EXACTNESS: per-doc tsum int64s re-aggregate per domain (exact,
    * order-independent — a rounded per-doc h would not re-sum, hence
    * [[bigramTermSums]]); h_fix = (−tsum) DIV n_bigrams is nonnegative
    * integer division (identical truncation both engines); excess and
    * weight stay integers; only the reported h_nats divides to double,
    * in q109's exact expression shape. Σ excess = Σh − n·min(h) comes
    * from ONE 1-row broadcast aggregate. All-domains-equal degrades to
    * all-zero weights (CASE-guarded on both engines) — the "no signal"
    * reading, documented rather than divided-by.
    *
    * Scale shape (r13, the census-collapse step past q109's term tables;
    * VERDICT r12 #1): the per-domain tsum never needs the occurrence
    * grain — `term` is a pure function of the pair (a, b) and the
    * fixed-point encoding floors PER OCCURRENCE, so occurrences of the
    * same (source, a, b) contribute identical integers and
    *   Σ_occurrences floor(term·10⁹) = Σ_census cnt · floor(term·10⁹)
    * EXACTLY. The plan therefore explodes the corpus into bigrams ONCE,
    * censuses by (source, a, b) (one map-side-combinable shuffle whose
    * output is unique-pairs-per-domain — vocabulary-bounded, sub-linear
    * in the corpus), [[Materialize]]s that census, and derives BOTH the
    * training pair census (curated-slice re-aggregate of the checkpoint —
    * not a second corpus explode) and the census-grain scoring joins from
    * it. The occurrence-grain scoring joins, the per-doc groupBy, and the
    * doc_id→source rejoin of the r12 form are all gone; only the add-one
    * unigram census still reads the corpus (token grain ≠ pair grain).
    * Adjudicated at sf1.0 benched-alone, min-of-3: r12 occurrence-grain
    * 2.48 s; r12 form served from the Materialized frozen model 1.76 s;
    * census-collapse with two explodes 1.62 s; this single-explode form
    * 1.54 s — the keeper on both the measurement and the 100 TB shape
    * (one corpus-sized explode, census-sized checkpoint). The serving
    * path ([[bigramLmModel]] + streaming) is unchanged.
    *
    * OVERFLOW (ADVICE r12, medium): tsum is ~h·10⁹ nano-nats per bigram,
    * so a domain with ~4·10⁸ bigrams overflows an int64 re-sum — far
    * below the 100 TB design point. Both engines therefore sum tsum in
    * DECIMAL(38,0) and derive h_fix by integer division of the decimal
    * total (both truncate; operands nonnegative — DuckDB routes through
    * HUGEINT for the division because its `//` on DECIMAL is true
    * division). cnt casts to decimal BEFORE the cnt·floor(term·10⁹)
    * multiply — a long·long product wraps at cnt ~3·10⁸ (the q119
    * product-before-cast hazard, ADVICE r12). Output is |domains| rows. */
  def q116DomainMixture(spark: SparkSession, dir: String): DataFrame =
    domainExcess(spark, dir)
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        round((-col("tsum").cast("double")) / lit(1.0e9) / col("n_bigrams"), 6)
          .as("h_nats"),
        (col("h_fix") - col("h_min")).as("excess_nano"),
        when(col("sx") === 0L, lit(0L))
          .otherwise(expr("(h_fix - h_min) * 1000 DIV sx"))
          .as("weight_permille"))
      .orderBy(col("source").asc)

  /** q116's per-domain excess frame BEFORE the presentation select —
    * (source, n_docs, n_bigrams, tsum, h_fix, h_min, h_sum, n_dom, sx),
    * one row per domain. Shared by q116 (one-shot weights) and q120 (the
    * iterated Group-DRO update seeds from the same excess), so the
    * reference-excess definition cannot drift between them. */
  private[operators] def domainExcess(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val big = DecimalType(38, 0)
    val toks = docs.filter(col("text").isNotNull)
      .select(col("source"),
        expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
    // r16 (guide §1.2 step 1, §2.3 "aggregate before you shuffle"): the r15
    // form ran FOUR corpus-sized tokenize+explode passes per call — the pair
    // census, the lazy unigram census TWICE (its `tot` aggregate and the
    // scoring join are separate consumers), and the n_docs groupBy. All
    // three censuses are derivable from ONE marked explode: position i of an
    // n-token doc emits the (tokᵢ, tokᵢ₊₁) pair struct for i < n (kind 0 —
    // exactly lmPairExpr), and position n emits a last-token marker (kind 2
    // when the doc has ≥ 2 tokens, kind 3 for 1-token docs). From the ONE
    // materialized (source, kind, a, b) census:
    //   pair census  = kind 0 rows verbatim;
    //   n_docs(src)  = Σ cnt over kind-2 rows (one marker per ≥2-token doc);
    //   unigram c_b  = per train source, Σ over kind-0 `a` + kind-2/3
    //                  markers — every token occurrence is either the left
    //                  element of a pair or its doc's last token, so the sum
    //                  is the exact occurrence census (same integers).
    // The re-aggregations are census-sized (vocabulary-bounded), never
    // corpus-sized. Measured at sf0.1 (shared-session bench, this host):
    // q116 1.97 → see OPTIMIZATION_r16.md; the oracle SQL and every output
    // integer are unchanged (PerplexitySpec's independent plain-Scala
    // recomputation pins n_docs/n_bigrams/tsum/weights; the 4-SF gate pins
    // the hashes).
    val markedPairExpr = expr(
      """transform(sequence(1, size(toks)), i ->
        |  CASE WHEN i < size(toks) THEN
        |    struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b, 0 AS kind)
        |  WHEN size(toks) >= 2 THEN
        |    struct(element_at(toks, i) AS a, CAST(NULL AS STRING) AS b, 2 AS kind)
        |  ELSE
        |    struct(element_at(toks, i) AS a, CAST(NULL AS STRING) AS b, 3 AS kind)
        |  END)""".stripMargin)
    val isTrain = replace(col("source"), lit("src"), lit("")).cast("int") < 10
    // r17 (VERDICT r16 #6): dropping this Materialize in favor of a lazy
    // census (relying on AQE runtime stage reuse across the ~6 consumer
    // references) was A/B'd benched-alone on the trio, interleaved,
    // min-of-3 fresh JVMs: before (checkpointed) 4.81 s trio-sum vs after
    // (lazy) 6.03 s. REJECTED — the census-sized final aggregates re-run
    // per consumer against the reused shuffle output and q120/q124's
    // collect actions cannot reuse q116-style stages across their separate
    // jobs. The checkpoint stays.
    val census = Materialize.materialize(
      toks.filter(size(col("toks")) >= 1)
        .select(col("source"), explode(markedPairExpr).as("p"))
        .groupBy(col("source"), col("p.kind").as("kind"),
          col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("cnt")))
    // Also A/B'd for VERDICT r16 #6 and REJECTED (interleaved, min-of-3
    // fresh JVMs, trio-sum): repartitioning the checkpoint by `a` so the
    // cp/ra/pairTerm chain and the pairs-side join inherit one hash(a)
    // partitioning (guide §2.4) — 4.70 → 6.24 s; the extra census-sized
    // build exchange costs more than the downstream exchanges it saves on
    // this near-occurrence-sized census.
    val pairs = census.filter(col("kind") === 0)
      .select(col("source"), col("a"), col("b"), col("cnt"))
    // training pair census re-aggregated FROM the checkpoint (docs with
    // < 2 tokens emit no pairs, so the size filters agree with
    // bigramLmCensuses by construction)
    val cp = pairs.filter(isTrain)
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("c_ab"))
    val ra = cp.groupBy(col("a")).agg(sum(col("c_ab")).as("r_a"))
    val pairTerm = cp.join(ra, Seq("a"))
      .select(col("a"), col("b"),
        (log(col("c_ab").cast("double")) - log(col("r_a").cast("double")))
          .as("t_ab"))
    // unigram census from the checkpoint: kind-0 `a` occurrences + last-
    // token markers, train sources only (identical integers to the r15
    // explode(toks) census — see the derivation note above)
    val uni = census.filter(isTrain)
      .select(col("a"), col("cnt"))
      .groupBy(col("a")).agg(sum(col("cnt")).as("c_b"))
      .withColumnRenamed("a", "b")
    val tot = uni.agg(sum(col("c_b")).as("nn"), count(lit(1)).as("vv"))
    val scored = pairs
      .join(pairTerm, Seq("a", "b"), "left")
      .join(uni, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("cnt"),
        coalesce(col("t_ab"),
          log(((coalesce(col("c_b"), lit(0L)) + lit(1L)) * lit(2L)).cast("double")) -
            log(((col("nn") + col("vv")) * lit(5L)).cast("double"))).as("term"))
    val nd = census.filter(col("kind") === 2)
      .groupBy(col("source")).agg(sum(col("cnt")).as("n_docs"))
    val agg = scored
      .groupBy(col("source"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        sum(col("cnt").cast(big) * floor(col("term") * lit(1.0e9)))
          .as("tsum"))
      .join(nd, "source")
      .withColumn("h_fix", expr("(-tsum) DIV n_bigrams"))
    val stats = agg.agg(min(col("h_fix")).as("h_min"),
      sum(col("h_fix")).as("h_sum"), count(lit(1)).as("n_dom"))
    agg.crossJoin(broadcast(stats))
      .withColumn("sx", col("h_sum") - col("n_dom") * col("h_min"))
  }

  // ---- Q120: DoReMi proxy-weight ITERATION (bounded Group-DRO loop) ----

  /** Rounds for q120's multiplicative-weights loop — enough to show the
    * trajectory concentrate (the q101 bounded-rounds discipline). */
  val DoremiRounds = 5

  /** q120's step size as an integer scale: the round factor is
    * (SCALE + excess_milli) / SCALE, i.e. η = 1/SCALE per milli-nat. */
  val DoremiEtaScale = 1000L

  /** Q120 — the bounded proxy-weight ITERATION DoReMi runs on top of the
    * q116 excess signal (Xie et al. 2023 §3, Group DRO: the domain-weight
    * player ascends by exponentiated gradient on per-domain excess loss,
    * α_t ∝ α_{t−1} ⊙ exp(η·excess); VERDICT r12 #7). [[DoremiRounds]]
    * rounds of the multiplicative update over q116's per-domain excess,
    * each renormalized to parts-per-million, emitting the full weight
    * TRAJECTORY — (source, round, weight_ppm) for round 0 (uniform)
    * through [[DoremiRounds]] — the convergence curve a mixture operator
    * monitors. NOT full DoReMi, stated plainly: the minimax's proxy model
    * retrains on the current mixture every round and re-measures excess;
    * here the reference excess is FROZEN (q116's table), so the loop is
    * exponentiated-gradient ascent on static losses — the exact α-update
    * with the proxy-feedback edge stubbed to the frozen signal, which is
    * what a one-proxy-checkpoint pipeline actually iterates.
    *
    * EXACTNESS: exp(η·x) is replaced by its first-order integer factor
    * (SCALE + excess_milli) — all-integer, so both engines agree
    * bit-for-bit: w·(SCALE+e) ≤ 10⁶·(10³+~130) ~ 1.13·10⁹ and the
    * renormalizing w·10⁶ DIV Σ stays < 2⁶³; DIV and DuckDB's `//` agree
    * on nonnegative operands. All-equal domains degrade to a uniform
    * trajectory (the factor cancels in the renormalize); truncation makes
    * Σ weight_ppm ≤ 10⁶ by at most n_dom per round — deterministic on
    * both engines, documented rather than redistributed.
    *
    * Scale shape: the heavy work — q116's census chain — runs ONCE,
    * distributed; the iteration state is |domains| rows (a catalog-sized
    * dimension), so the seed COLLECTS like a codebook / q101 merge table
    * (the bounded-collect discipline; q101 itself collects one row per
    * training round) and the [[DoremiRounds]] integer rounds run
    * driver-side — a distributed loop here would pay a checkpoint
    * round-trip per round to move ≤ a few hundred integers (measured:
    * the Materialize-per-round form spent ~1.4 s of its 2.35 s sf0.1
    * wall on 20-row checkpoints). Output is (rounds+1)·|domains| rows
    * via createDataFrame. Eager at construction (the collect). */
  def q120DoremiIterate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = domainExcess(spark, dir)
      .select(col("source"), expr("(h_fix - h_min) DIV 1000000").as("excess_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val nDom = ex.length
    val hist = scala.collection.mutable.ArrayBuffer[(String, Int, Long)]()
    var w = ex.map { case (s, _) => s -> (if (nDom == 0) 0L else 1000000L / nDom) }.toMap
    ex.foreach { case (s, _) => hist += ((s, 0, w(s))) }
    for (t <- 1 to DoremiRounds) {
      val m = ex.map { case (s, e) => s -> w(s) * (DoremiEtaScale + e) }.toMap
      val tot = m.values.sum
      // tot = 0 only when every w truncated to 0 (> 1e6 domains) — hold
      // the weights rather than divide by zero; the oracle's // would
      // raise, but a >1e6-domain catalog is outside the demo grid's and
      // the mixture sampler's domain-cardinality contract anyway
      if (tot > 0L)
        w = ex.map { case (s, _) => s -> m(s) * 1000000L / tot }.toMap
      ex.foreach { case (s, _) => hist += ((s, t, w(s))) }
    }
    hist.toSeq.toDF("source", "round", "weight_ppm")
      .select(col("source"), col("round").cast("int").as("round"),
        col("weight_ppm").cast("long").as("weight_ppm"))
      .orderBy(col("round").asc, col("source").asc)
  }

  /** Q124 — DoReMi iteration with PER-ROUND EXCESS REFRESH (r14, VERDICT
    * r13 #9): where q120 iterates the exponentiated-gradient update over
    * q116's FROZEN excess (each domain's gap to the one-shot minimum),
    * this entry re-derives the excess EVERY round against the MOVING
    * mixture baseline — b_t = the α_{t−1}-weighted mean of the per-domain
    * fixed-point entropies, excess_t(d) = max(0, h_fix(d) − b_t) — so the
    * loss signal responds to the weights exactly the way DoReMi's
    * re-measured proxy loss does between rounds. Honest framing carried
    * over from q120: full DoReMi RETRAINS the proxy on the new mixture
    * each round; retraining is model fitting and out of SQL's (and a
    * census engine's) reach, so the refresh uses the fixed per-domain
    * entropies re-baselined by the current mixture — the
    * bounded-arithmetic stand-in that closes the "static losses" half of
    * the stated gap while the proxy-retrain half remains stated. Domains
    * below the mixture baseline clamp to zero excess BEFORE the integer
    * divide (negative DIV truncates toward zero on Spark but floors in
    * DuckDB's `//`; the clamp keeps every divide nonnegative so both
    * engines agree bit-for-bit). Same scale shape as q120: the census
    * chain runs once distributed, the |domains|-row seed collects, and
    * the [[DoremiRounds]] integer rounds run driver-side. Output adds
    * excess_milli per (source, round) — the refreshed signal the update
    * consumed — so the oracle checks the baseline arithmetic too. */
  def q124DoremiRefresh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ex = domainExcess(spark, dir)
      .select(col("source"), col("h_fix"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val nDom = ex.length
    val hist = scala.collection.mutable.ArrayBuffer[(String, Int, Long, Long)]()
    var w = ex.map { case (s, _) => s -> (if (nDom == 0) 0L else 1000000L / nDom) }.toMap
    ex.foreach { case (s, _) => hist += ((s, 0, w(s), 0L)) }
    for (t <- 1 to DoremiRounds) {
      val sumW = ex.map { case (s, _) => w(s) }.sum
      // sumW = 0 only past ~1e6 domains (the q120 zero-total contract):
      // hold the weights and emit zero excess rather than divide by zero
      if (sumW > 0L) {
        val b = ex.map { case (s, h) => w(s) * h }.sum / sumW
        val em = ex.map { case (s, h) =>
          s -> math.max(0L, h - b) / 1000000L
        }.toMap
        val m = ex.map { case (s, _) => s -> w(s) * (DoremiEtaScale + em(s)) }.toMap
        val tot = m.values.sum
        if (tot > 0L) w = ex.map { case (s, _) => s -> m(s) * 1000000L / tot }.toMap
        ex.foreach { case (s, _) => hist += ((s, t, w(s), em(s))) }
      } else ex.foreach { case (s, _) => hist += ((s, t, w(s), 0L)) }
    }
    hist.toSeq.toDF("source", "round", "weight_ppm", "excess_milli")
      .select(col("source"), col("round").cast("int").as("round"),
        col("weight_ppm").cast("long").as("weight_ppm"),
        col("excess_milli").cast("long").as("excess_milli"))
      .orderBy(col("round").asc, col("source").asc)
  }

  // ---- Q112: trigram Stupid-Backoff LM scoring ----

  /** Q112 — TRIGRAM Stupid Backoff (Brants et al. 2007, the full backoff
    * chain; VERDICT r10 #6): q109 with one more context level. Train on
    * the curated slice (src0–src9), score every ≥3-token document by
    *   S(c|a,b) = c(abc) / r(ab)                        seen trigram
    *            = 0.4 · c(bc) / r(b)                    backoff → bigram
    *            = 0.4 · 0.4 · (c(c)+1) / (N+V)          backoff → add-one
    *   h_nats = −(Σ ln S) / n_trigrams
    * `bo_bi` / `bo_uni` report how many positions backed off one / two
    * levels — the out-of-domain signal (at the small SFs crawl docs back
    * off thousands of times while curated docs never do; PerplexitySpec
    * pins the latter at the trigram level: a curated doc's trigrams are
    * in the census by construction).
    *
    * EXACTNESS (the q109 integer-ln encoding, extended): α = 0.4 becomes
    * ln(2·c_bc) − ln(5·r_b) and α² = 0.16 becomes ln(4·(c_c+1)) −
    * ln(25·(N+V)) — every ln argument is an exact integer on both
    * engines; per-doc summation is q109's r12 fixed-point contract
    * (floor(term·10⁹) int64s, exact order-independent sum with map-side
    * combine, one divide + round(6) at the end).
    *
    * Scale shape: q109's, with the trigram census and its (a, b) context
    * margin added — censuses are n-gram-sized with map-side partials,
    * scoring is per-occurrence LEFT equi-joins (the join fan-out doubles
    * vs q109, exactly the price the verdict priced in; AQE splits the
    * Zipf head), the only broadcast is the 1-row (N, V) total, per-doc
    * fold state is bounded by doc length. */
  def q112TrigramLm(spark: SparkSession, dir: String): DataFrame =
    trigramLmScores(Tables.documents(spark, dir))

  /** The q112 body over ANY (doc_id, source, text) frame. */
  private[graft] def trigramLmScores(docs: DataFrame): DataFrame = {
    val pairExpr = expr(
      "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))")
    val triExpr = expr(
      "transform(sequence(1, size(toks) - 2), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b, element_at(toks, i + 2) AS c))")
    val toksAll = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
    val train = toksAll
      .filter(replace(col("source"), lit("src"), lit("")).cast("int") < 10)
      .filter(size(col("toks")) > 0)
    // censuses stay LAZY although each has two consumers (margin
    // aggregate + scoring join): materializing all of them measured
    // sf1.0 7.7 -> 9.4 s (the bigramLmCensuses ruling — checkpoint
    // round-trip costs more than the census recompute).
    // r17 (VERDICT r16 #4): the checkpoint-free marked-census fold (one
    // explode carrying trigram + first-pair + first-token markers, all
    // lower censuses re-aggregated from the shared lazy subtree) was
    // implemented and A/B'd benched-alone, interleaved, min-of-3 fresh
    // JVMs: q112 1.898 → 2.005 s (q109's twin 1.337 → 1.544). REJECTED —
    // see the ruling note in bigramLmCensuses; the separate explodes stay.
    val uni = train.select(explode(col("toks")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("c_c"))
    val cbg = train.filter(size(col("toks")) >= 2)
      .select(explode(pairExpr).as("p"))
      .select(col("p.a").as("b"), col("p.b").as("c"))
      .groupBy(col("b"), col("c")).agg(count(lit(1)).as("c_bc"))
    val rb = cbg.groupBy(col("b")).agg(sum(col("c_bc")).as("r_b"))
    val ct = train.filter(size(col("toks")) >= 3)
      .select(explode(triExpr).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
      .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("c_abc"))
    val rab = ct.groupBy(col("a"), col("b")).agg(sum(col("c_abc")).as("r_ab"))
    val tot = uni.agg(sum(col("c_c")).as("nn"), count(lit(1)).as("vv"))
    // term tables for the two SEEN levels (r12, the q109 projection): the
    // trigram and backoff-bigram terms are functions of their census keys
    // alone, so each ln runs once per unique key on a census-sized frame
    // and folds a margin join away (ct⋈rab, cbg⋈rb) — the occurrence
    // stream LEFT equi-joins 3 frames instead of 5 and evaluates ZERO lns
    // on the two common paths. The add-one unigram floor stays
    // per-occurrence (the rare double-backoff path; a crossJoin(tot) term
    // table fell out of AQE's broadcast conversion and forced a sort —
    // the scoreWithBigramLm ruling, measured in ROUND12_NOTES).
    val triTerm = ct.join(rab, Seq("a", "b"))
      .select(col("a"), col("b"), col("c"),
        (log(col("c_abc").cast("double")) - log(col("r_ab").cast("double")))
          .as("t_abc"))
    val biTerm = cbg.join(rb, Seq("b"))
      .select(col("b"), col("c"),
        (log((col("c_bc") * lit(2L)).cast("double")) -
          log((col("r_b") * lit(5L)).cast("double"))).as("t_bc"))
    toksAll.filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(triExpr).as("g"))
      .select(col("doc_id"),
        col("g.a").as("a"), col("g.b").as("b"), col("g.c").as("c"))
      .join(triTerm, Seq("a", "b", "c"), "left")
      .join(biTerm, Seq("b", "c"), "left")
      .join(uni, Seq("c"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        coalesce(col("t_abc"), col("t_bc"),
          log(((coalesce(col("c_c"), lit(0L)) + lit(1L)) * lit(4L)).cast("double")) -
            log(((col("nn") + col("vv")) * lit(25L)).cast("double"))).as("term"),
        when(col("t_abc").isNotNull, lit(0L))
          .when(col("t_bc").isNotNull, lit(1L)).otherwise(lit(0L)).as("bo1"),
        when(col("t_abc").isNotNull || col("t_bc").isNotNull, lit(0L))
          .otherwise(lit(1L)).as("bo2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_trigrams"),
        sum(col("bo1")).as("bo_bi"),
        sum(col("bo2")).as("bo_uni"),
        sum(floor(col("term") * lit(1.0e9))).as("tsum"))
      .select(col("doc_id"), col("n_trigrams"), col("bo_bi"), col("bo_uni"),
        round((-col("tsum").cast("double")) / lit(1.0e9) / col("n_trigrams"), 6)
          .as("h_nats"))
      .orderBy(col("doc_id").asc)
  }

  // ---- Q97: adjacent-pair PMI (collocation mining) ----

  private[operators] val PmiMinCount = 5
  private[operators] val PmiTopK    = 200

  /** Q97 — pointwise mutual information over adjacent token pairs
    * (Church & Hanks 1990): PMI(a,b) = ln(N·c(a,b) / (c(a·)·c(·b))) with
    * the margins taken over the PAIR distribution, the word2vec-era
    * collocation statistic that still drives phrase detection in corpus
    * prep. All counts are exact integers from one pair census (the q68
    * shuffle shape — THE heavy aggregation; margins and the total derive
    * from the census, orders of magnitude smaller); the only float math
    * is one exact double multiply per side of a correctly-rounded divide
    * and one ln, rounded to 6 — no float accumulation anywhere, so both
    * engines agree bit-for-bit. Products stay < 2^53 (pair counts ×
    * corpus totals ~1e13 at 10x). Low-support pairs (< [[PmiMinCount]])
    * are dropped before ranking, the standard PMI-vs-noise guard. */
  def q97PmiPairs(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS a, element_at(toks, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cp = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = cp.groupBy(col("a")).agg(sum(col("c_ab")).as("c_a"))
    val cb = cp.groupBy(col("b")).agg(sum(col("c_ab")).as("c_b"))
    val n = cp.agg(sum(col("c_ab")).as("nn"))
    cp.join(ca, "a").join(cb, "b").crossJoin(broadcast(n))
      .filter(col("c_ab") >= PmiMinCount)
      .select(col("a"), col("b"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("nn") /
          (col("c_a").cast("double") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(PmiTopK)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q29_text_stats" -> (q29TextStats _),
    "q30_lang_stats" -> (q30LangStats _),
    "q31_lang_id" -> (q31LangId _),
    "q32_events_json" -> (q32EventsJson _),
    "q33_fingerprint" -> (q33Fingerprint _),
    "q53_doc_search" -> (q53DocSearch _),
    "q60_zscore_normalize" -> (q60ZScoreNormalize _),
    "q63_sequence_packing" -> (q63SequencePacking _),
    "q66_decontamination" -> (q66Decontamination _),
    "q67_repetition" -> (q67Repetition _),
    "q68_bpe_pairs" -> (q68BpePairs _),
    "q101_bpe_train" -> (q101BpeTrain _),
    "q104_bpe_encode" -> (q104BpeEncode _),
    "q106_tokenizer_fertility" -> (q106TokenizerFertility _),
    "q108_token_packing" -> (q108TokenPacking _),
    "q69_chunking" -> (q69Chunking _),
    "q72_rarity" -> (q72Rarity _),
    "q94_perplexity" -> (q94Perplexity _),
    "q97_pmi_pairs" -> (q97PmiPairs _),
    "q109_bigram_lm" -> (q109BigramLm _),
    "q112_trigram_lm" -> (q112TrigramLm _),
    "q116_domain_mixture" -> (q116DomainMixture _),
    "q120_doremi_iterate" -> (q120DoremiIterate _),
    "q124_doremi_refresh" -> (q124DoremiRefresh _),
  )

  /** The bigram-LM oracle's training prefix (tokenize → curated slice →
    * unigram/bigram censuses → scalar maps) — shared verbatim by the q109
    * and q116 oracles so the reference model cannot drift between the
    * per-doc score and the per-domain mixture. Ends at `m`. */
  private def bigramLmOracleCtes: String =
    """t AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |tr AS (SELECT toks FROM t WHERE CAST(replace(source, 'src', '') AS INT) < 10 AND len(toks) > 0),
      |u AS (SELECT unnest(toks) AS token FROM tr),
      |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_b FROM u GROUP BY token),
      |pr AS (SELECT unnest(list_transform(range(1, len(toks)), i -> {'a': toks[i], 'b': toks[i+1]})) AS p
      |       FROM tr WHERE len(toks) >= 2),
      |cp AS (SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM pr GROUP BY p.a, p.b),
      |ra AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS r_a FROM cp GROUP BY a),
      |m AS (SELECT (SELECT MAP(list(a || chr(1) || b ORDER BY a, b), list(c_ab ORDER BY a, b)) FROM cp) AS mab,
      |             (SELECT MAP(list(a ORDER BY a), list(r_a ORDER BY a)) FROM ra) AS ma,
      |             (SELECT MAP(list(token ORDER BY token), list(c_b ORDER BY token)) FROM c) AS mb,
      |             (SELECT SUM(c_b) FROM c) AS nn,
      |             (SELECT COUNT(*) FROM c) AS vv)""".stripMargin

  /** Per-doc fixed-point bigram term sum (exact integer) — the oracle twin
    * of [[bigramTermSums]]'s tsum, shared by q109 (÷ into h_nats) and q116
    * (re-summed per domain). */
  private def bigramTsumSql: String =
    """list_sum(list_transform(range(1, len(toks)),
      |    i -> CAST(floor((CASE WHEN map_extract(m.mab, toks[i] || chr(1) || toks[i+1])[1] IS NOT NULL
      |         THEN ln(CAST(map_extract(m.mab, toks[i] || chr(1) || toks[i+1])[1] AS DOUBLE))
      |            - ln(CAST(map_extract(m.ma, toks[i])[1] AS DOUBLE))
      |         ELSE ln(CAST(2 * (coalesce(map_extract(m.mb, toks[i+1])[1], 0) + 1) AS DOUBLE))
      |            - ln(CAST(5 * (m.nn + m.vv) AS DOUBLE)) END) * 1000000000.0) AS BIGINT)))""".stripMargin

  /** The domain-excess oracle chain shared verbatim by the q116 and q120
    * oracles (ends at `ex`) — the [[domainExcess]] twin, so the frozen
    * reference-excess definition cannot drift between the one-shot weights
    * and the iterated loop. */
  private def domainExcessOracleCtes: String =
    s"""$bigramLmOracleCtes,
      |s AS (SELECT source,
      |  CAST(len(toks) - 1 AS BIGINT) AS nb,
      |  CAST($bigramTsumSql AS BIGINT) AS tsum
      |  FROM t, m WHERE len(toks) >= 2),
      |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(nb) AS BIGINT) AS n_bigrams,
      |        SUM(CAST(tsum AS DECIMAL(38,0))) AS tsum FROM s GROUP BY source),
      |hx AS MATERIALIZED (SELECT source, n_docs, n_bigrams, tsum, CAST((-CAST(tsum AS HUGEINT)) // n_bigrams AS BIGINT) AS h_fix FROM agg),
      |mn AS (SELECT MIN(h_fix) AS h_min, SUM(h_fix) AS h_sum, COUNT(*) AS n_dom FROM hx),
      |ex AS (SELECT hx.*, hx.h_fix - mn.h_min AS excess_nano,
      |       mn.h_sum - mn.n_dom * mn.h_min AS sx FROM hx, mn)""".stripMargin

  /** The q120 oracle: the shared excess chain + [[DoremiRounds]] unrolled
    * multiplicative-weight rounds (generated by the same Scala loop that
    * drives the engine — the q101 CTE-stage discipline). Every round CTE
    * is MATERIALIZED — w_t is referenced by m_{t+1} AND the final union,
    * and m_t twice inside w_t, so default CTE inlining re-evaluates the
    * full upstream excess chain exponentially in the round count
    * (measured: 115 s at sf0.1 inlined vs sub-second materialized — the
    * exact bpeOracleSql lesson). */
  private def doremiOracleSql: String = {
    val rounds = (1 to DoremiRounds).map { t =>
      val p = t - 1
      s"""m$t AS MATERIALIZED (SELECT source, em, w * ($DoremiEtaScale + em) AS m FROM w$p),
         |w$t AS MATERIALIZED (SELECT source, em, m * 1000000 // (SELECT SUM(m) FROM m$t) AS w FROM m$t)""".stripMargin
    }.mkString(",\n")
    val unions = (0 to DoremiRounds).map { t =>
      s"SELECT source, CAST($t AS INT) AS round, CAST(w AS BIGINT) AS weight_ppm FROM w$t"
    }.mkString(" UNION ALL ")
    s"""WITH $domainExcessOracleCtes,
       |w0 AS MATERIALIZED (SELECT source, excess_nano // 1000000 AS em,
       |       1000000 // (SELECT n_dom FROM mn) AS w FROM ex),
       |$rounds
       |SELECT * FROM ($unions) ORDER BY round, source NULLS FIRST""".stripMargin
  }

  /** The q124 oracle: the q120 chain with the excess RE-DERIVED each round
    * against the weighted mixture baseline (b_t, then clamp-before-divide)
    * — four MATERIALIZED CTEs per round (b/e/m/w; same exponential-
    * re-evaluation lesson as q120's scaladoc), generated by the same Scala
    * loop that drives the engine. */
  private def doremiRefreshOracleSql: String = {
    val rounds = (1 to DoremiRounds).map { t =>
      val p = t - 1
      s"""b$t AS MATERIALIZED (SELECT (SELECT SUM(w * h_fix) FROM w$p)
         |       // (SELECT SUM(w) FROM w$p) AS b),
         |e$t AS MATERIALIZED (SELECT source, h_fix, w,
         |       greatest(0, h_fix - (SELECT b FROM b$t)) // 1000000 AS em FROM w$p),
         |m$t AS MATERIALIZED (SELECT source, h_fix, em,
         |       w * ($DoremiEtaScale + em) AS m FROM e$t),
         |w$t AS MATERIALIZED (SELECT source, h_fix, em,
         |       m * 1000000 // (SELECT SUM(m) FROM m$t) AS w FROM m$t)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to DoremiRounds).map { t =>
      s"SELECT source, CAST($t AS INT) AS round, CAST(w AS BIGINT) AS weight_ppm, " +
        s"CAST(em AS BIGINT) AS excess_milli FROM w$t"
    }.mkString(" UNION ALL ")
    s"""WITH $domainExcessOracleCtes,
       |w0 AS MATERIALIZED (SELECT source, h_fix,
       |       1000000 // (SELECT n_dom FROM mn) AS w FROM ex),
       |$rounds
       |SELECT * FROM (
       |  SELECT source, CAST(0 AS INT) AS round, CAST(w AS BIGINT) AS weight_ppm,
       |    CAST(0 AS BIGINT) AS excess_milli FROM w0
       |  UNION ALL $unions)
       |ORDER BY round, source NULLS FIRST""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q101_bpe_train" -> bpeOracleSql(BpeRounds),
    "q104_bpe_encode" -> bpeApplyOracleSql(BpeRounds),
    "q106_tokenizer_fertility" -> bpeFertilityOracleSql(BpeRounds),
    "q108_token_packing" -> bpePackingOracleSql(BpeRounds, TokenPackBudget),
    "q109_bigram_lm" ->
      s"""WITH $bigramLmOracleCtes,
        |s AS (SELECT doc_id,
        |  CAST(len(toks) - 1 AS BIGINT) AS n_bigrams,
        |  CAST(list_sum(list_transform(range(1, len(toks)),
        |    i -> CASE WHEN map_extract(m.mab, toks[i] || chr(1) || toks[i+1])[1] IS NOT NULL THEN 0 ELSE 1 END)) AS BIGINT) AS oov_bigrams,
        |  round((-CAST($bigramTsumSql AS DOUBLE))
        |    / 1000000000.0 / (len(toks) - 1), 6) AS h_nats
        |  FROM t, m WHERE len(toks) >= 2)
        |SELECT doc_id, n_bigrams, oov_bigrams, h_nats FROM s ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q116_domain_mixture" ->
      s"""WITH $domainExcessOracleCtes
        |SELECT source, n_docs, n_bigrams,
        |  round(CAST(-tsum AS DOUBLE)/1000000000.0/n_bigrams, 6) AS h_nats,
        |  CAST(excess_nano AS BIGINT) AS excess_nano,
        |  CAST(CASE WHEN sx = 0 THEN 0 ELSE excess_nano * 1000 // sx END AS BIGINT) AS weight_permille
        |FROM ex ORDER BY source NULLS FIRST""".stripMargin,
    "q120_doremi_iterate" -> doremiOracleSql,
    "q124_doremi_refresh" -> doremiRefreshOracleSql,
    "q112_trigram_lm" ->
      """WITH t AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |tr AS (SELECT toks FROM t WHERE CAST(replace(source, 'src', '') AS INT) < 10),
        |u AS (SELECT unnest(toks) AS token FROM tr WHERE len(toks) > 0),
        |c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c_b FROM u GROUP BY token),
        |pr AS (SELECT unnest(list_transform(range(1, len(toks)), i -> {'a': toks[i], 'b': toks[i+1]})) AS p
        |       FROM tr WHERE len(toks) >= 2),
        |cbg AS (SELECT p.a AS a, p.b AS b, CAST(COUNT(*) AS BIGINT) AS c_bc FROM pr GROUP BY p.a, p.b),
        |rb AS (SELECT a, CAST(SUM(c_bc) AS BIGINT) AS r_b FROM cbg GROUP BY a),
        |tg AS (SELECT unnest(list_transform(range(1, len(toks) - 1), i -> {'a': toks[i], 'b': toks[i+1], 'c': toks[i+2]})) AS g
        |       FROM tr WHERE len(toks) >= 3),
        |ct AS (SELECT g.a AS a, g.b AS b, g.c AS c, CAST(COUNT(*) AS BIGINT) AS c_abc FROM tg GROUP BY g.a, g.b, g.c),
        |rab AS (SELECT a, b, CAST(SUM(c_abc) AS BIGINT) AS r_ab FROM ct GROUP BY a, b),
        |m AS (SELECT
        |  (SELECT MAP(list(a || chr(1) || b || chr(1) || c ORDER BY a, b, c), list(c_abc ORDER BY a, b, c)) FROM ct) AS mabc,
        |  (SELECT MAP(list(a || chr(1) || b ORDER BY a, b), list(r_ab ORDER BY a, b)) FROM rab) AS mab,
        |  (SELECT MAP(list(a || chr(1) || b ORDER BY a, b), list(c_bc ORDER BY a, b)) FROM cbg) AS mbc,
        |  (SELECT MAP(list(a ORDER BY a), list(r_b ORDER BY a)) FROM rb) AS mb,
        |  (SELECT MAP(list(token ORDER BY token), list(c_b ORDER BY token)) FROM c) AS mc,
        |  (SELECT SUM(c_b) FROM c) AS nn,
        |  (SELECT COUNT(*) FROM c) AS vv),
        |s AS (SELECT doc_id,
        |  CAST(len(toks) - 2 AS BIGINT) AS n_trigrams,
        |  CAST(list_sum(list_transform(range(1, len(toks) - 1),
        |    i -> CASE WHEN map_extract(m.mabc, toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL THEN 0
        |              WHEN map_extract(m.mbc, toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL THEN 1
        |              ELSE 0 END)) AS BIGINT) AS bo_bi,
        |  CAST(list_sum(list_transform(range(1, len(toks) - 1),
        |    i -> CASE WHEN map_extract(m.mabc, toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL THEN 0
        |              WHEN map_extract(m.mbc, toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL THEN 0
        |              ELSE 1 END)) AS BIGINT) AS bo_uni,
        |  round((-CAST(list_sum(list_transform(range(1, len(toks) - 1),
        |    i -> CAST(floor((CASE WHEN map_extract(m.mabc, toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL
        |         THEN ln(CAST(map_extract(m.mabc, toks[i] || chr(1) || toks[i+1] || chr(1) || toks[i+2])[1] AS DOUBLE))
        |            - ln(CAST(map_extract(m.mab, toks[i] || chr(1) || toks[i+1])[1] AS DOUBLE))
        |         WHEN map_extract(m.mbc, toks[i+1] || chr(1) || toks[i+2])[1] IS NOT NULL
        |         THEN ln(CAST(2 * map_extract(m.mbc, toks[i+1] || chr(1) || toks[i+2])[1] AS DOUBLE))
        |            - ln(CAST(5 * map_extract(m.mb, toks[i+1])[1] AS DOUBLE))
        |         ELSE ln(CAST(4 * (coalesce(map_extract(m.mc, toks[i+2])[1], 0) + 1) AS DOUBLE))
        |            - ln(CAST(25 * (m.nn + m.vv) AS DOUBLE)) END) * 1000000000.0) AS BIGINT))) AS DOUBLE))
        |    / 1000000000.0 / (len(toks) - 2), 6) AS h_nats
        |  FROM t, m WHERE len(toks) >= 3)
        |SELECT doc_id, n_trigrams, bo_bi, bo_uni, h_nats FROM s ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q97_pmi_pairs" ->
      s"""WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents WHERE text IS NOT NULL),
         |t2 AS (SELECT toks FROM t WHERE len(toks) >= 2),
         |pr AS (SELECT unnest(list_transform(range(1, len(toks)), i -> {'a': toks[i], 'b': toks[i+1]})) AS p FROM t2),
         |pairs AS (SELECT p.a AS a, p.b AS b FROM pr),
         |cp AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM pairs GROUP BY a, b),
         |ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cp GROUP BY a),
         |cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cp GROUP BY b),
         |n AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS nn FROM cp)
         |SELECT cp.a AS a, cp.b AS b, cp.c_ab AS c_ab,
         |  round(ln(CAST(cp.c_ab AS DOUBLE) * nn / (CAST(ca.c_a AS DOUBLE) * cb.c_b)), 6) AS pmi
         |FROM cp JOIN ca ON cp.a = ca.a JOIN cb ON cp.b = cb.b CROSS JOIN n
         |WHERE cp.c_ab >= $PmiMinCount
         |ORDER BY pmi DESC, a, b LIMIT $PmiTopK""".stripMargin,
    "q94_perplexity" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |t2 AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
        |u AS (SELECT unnest(toks) AS token FROM t2),
        |c AS (SELECT token, COUNT(*) AS cnt FROM u GROUP BY token),
        |m AS (SELECT MAP(list(token ORDER BY token), list(cnt ORDER BY token)) AS mp,
        |             SUM(cnt) AS n_corpus FROM c),
        |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  round(ln(m.n_corpus) - CAST(list_sum(list_transform(toks,
        |    tk -> CAST(floor(ln(CAST(map_extract(m.mp, tk)[1] AS DOUBLE)) * 1000000000.0) AS BIGINT))) AS DOUBLE)
        |    / 1000000000.0 / len(toks), 6) AS h_nats
        |  FROM t2, m)
        |SELECT doc_id, n_tokens, h_nats,
        |  CAST(ntile(3) OVER (ORDER BY h_nats, doc_id) AS INT) AS bucket
        |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q72_rarity" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
         |vocab AS (SELECT word, SUM(tf) AS cf FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS corpus_tokens FROM toks)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(tf * least(n.corpus_tokens * 1000 // cf, $RarityCap)) AS BIGINT)
         |    AS rarity_sum,
         |  CAST(SUM(tf * least(n.corpus_tokens * 1000 // cf, $RarityCap))
         |    // SUM(tf) AS BIGINT) AS rarity_milli
         |FROM tf JOIN vocab USING (word), n
         |GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q69_chunking" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |     WHERE text IS NOT NULL),
         |c AS (SELECT doc_id, w, unnest(range(0, len(w), $ChunkStride)) AS s FROM t)
         |SELECT doc_id, CAST(s // $ChunkStride AS BIGINT) AS chunk_id,
         |  CAST(s AS BIGINT) AS start_tok,
         |  CAST(least($ChunkTokens, len(w) - s) AS BIGINT) AS n_tok,
         |  md5(array_to_string(list_slice(w, s + 1, s + $ChunkTokens), ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id NULLS FIRST, chunk_id""".stripMargin,
    "q68_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
         |  FROM documents WHERE text IS NOT NULL),
         |v AS (SELECT word, COUNT(*) AS freq FROM w
         |  WHERE length(word) >= 2 GROUP BY 1),
         |p AS (SELECT freq,
         |    unnest(list_transform(range(1, length(word)), i -> substr(word, i, 2))) AS pair
         |  FROM v)
         |SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM p GROUP BY 1
         |ORDER BY n DESC, pair LIMIT $BpeTopK""".stripMargin,
    "q66_decontamination" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |     WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
         |g AS (SELECT doc_id,
         |    unnest(list_distinct(list_transform(range(1, len(w) - 1),
         |      i -> array_to_string(list_slice(w, i, i + 2), ' ')))) AS gram
         |  FROM t),
         |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % $DecontamMod = $DecontamRes),
         |train AS (SELECT doc_id, gram FROM g WHERE doc_id % $DecontamMod <> $DecontamRes),
         |tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM train GROUP BY 1),
         |hits AS (SELECT t.doc_id, COUNT(*) AS n_hits
         |  FROM train t JOIN bench b USING (gram) GROUP BY 1)
         |SELECT h.doc_id, CAST(h.n_hits AS BIGINT) AS n_hits,
         |  CAST(tot.n_grams AS BIGINT) AS n_grams,
         |  CAST(h.n_hits * 1000 // tot.n_grams AS BIGINT) AS hit_permille
         |FROM hits h JOIN tot USING (doc_id)
         |ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q67_repetition" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
         |     WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
         |g AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(w)),
         |      i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS gram
         |  FROM t),
         |c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
         |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams,
         |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_repeated,
         |  CAST(MAX(n) AS BIGINT) AS top_gram_n,
         |  ((SUM(n) - COUNT(*)) * 1000 >= $RepetitivePermille * SUM(n)) AS repetitive
         |FROM c GROUP BY doc_id ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q63_sequence_packing" ->
      """WITH d AS (SELECT doc_id, lang, doc_id % 32 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, lang, shard, tokens,
        |    SUM(tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT lang, shard, CAST((cum - tokens) // 2048 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(tokens) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY lang, shard, bin
        |ORDER BY lang NULLS FIRST, shard NULLS FIRST, bin NULLS FIRST""".stripMargin,
    "q60_zscore_normalize" ->
      """WITH s AS (SELECT lang, COUNT(*) AS n,
        |    SUM(CAST(n_chars AS DECIMAL(38,0))) AS s1,
        |    SUM(CAST(n_chars * n_chars AS DECIMAL(38,0))) AS s2
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang,
        |  CASE WHEN CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE) /
        |            (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE)) > 0
        |  THEN (CAST(d.n_chars AS DOUBLE) - CAST(s.s1 AS DOUBLE) / CAST(s.n AS DOUBLE)) /
        |       sqrt(CAST(s.n * s.s2 - s.s1 * s.s1 AS DOUBLE) /
        |            (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE)))
        |  ELSE 0.0 END AS z
        |FROM documents d JOIN s USING (lang)
        |ORDER BY d.doc_id NULLS FIRST""".stripMargin,
    "q53_doc_search" ->
      s"""WITH $lexicalSqlCtes
         |SELECT doc_id, score_milli
         |FROM lexall ORDER BY score_milli DESC, doc_id LIMIT 20""".stripMargin,
    "q29_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '$TokenRegex')) AS BIGINT) AS n_tokens_re,
         |  CAST(length(text) AS BIGINT) AS n_chars_calc,
         |  CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len,
         |  CAST(len(list_filter(w, x -> x IN $stopSqlList)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopword_ratio
         |FROM t ORDER BY doc_id NULLS FIRST""".stripMargin,
    "q30_lang_stats" ->
      ("SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, " +
        "COUNT(DISTINCT source) AS n_sources, " +
        "ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(n_chars), 2) AS avg_chars " +
        "FROM documents GROUP BY lang ORDER BY lang NULLS FIRST"),
    "q31_lang_id" -> langIdOracle,
    "q32_events_json" ->
      ("SELECT event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k, " +
        "ROUND(CAST(SUM(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(18,2))) AS DOUBLE) " +
        "/ COUNT(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k, " +
        "CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k, " +
        "CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"),
    "q33_fingerprint" ->
      s"""SELECT doc_id,
         |  list_min(list_transform(range(1, length(text) - $GramLen + 2),
         |    i -> md5(substr(text, i, $GramLen)))) AS fingerprint
         |FROM documents WHERE length(text) >= $GramLen
         |ORDER BY doc_id NULLS FIRST""".stripMargin,
  )

  /** The same fold-based argmax, spelled as SQL. */
  private def langIdOracle: String = {
    val scores = LangMarkers.map { case (lang, markers) =>
      val list = markers.map(m => s"'$m'").mkString("(", ", ", ")")
      s"len(list_filter(w, x -> x IN $list)) AS score_$lang"
    }.mkString(", ")
    // fold en -> fr -> es -> de -> zh with strict > (ties keep earlier)
    val pred = LangMarkers.map(_._1).tail.foldLeft("'en'" -> "score_en") {
      case ((langExpr, scoreExpr), lang) =>
        (s"CASE WHEN score_$lang > ($scoreExpr) THEN '$lang' ELSE ($langExpr) END",
          s"CASE WHEN score_$lang > ($scoreExpr) THEN score_$lang ELSE ($scoreExpr) END")
    }._1
    s"""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id, lang, $scores FROM t)
       |SELECT doc_id, lang AS lang_actual, $pred AS lang_pred
       |FROM s ORDER BY doc_id NULLS FIRST""".stripMargin
  }
}
