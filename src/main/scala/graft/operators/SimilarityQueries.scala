package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (ArrayType(FloatType), 64
  * dims): brute-force exact top-k as the verifiable baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB path.
  *
  * Oracle-stability design: float arithmetic differs in the last ulp between
  * engines, so the *declared* similarity is a quantized integer dot product
  * — embeddings scaled by 1000 and rounded to BIGINT. Exact .5 values DO
  * occur (any odd m/16 float: 0.0625f×1000 = 62.5 exactly), so every
  * rounding site — Spark `round`, DuckDB `round`, and the JVM centroid
  * kernel — uses HALF_UP (away from zero); CentroidAggregator documents
  * the math.round trap this avoids. Every score is exact,
  * order-independent, and hash-identical in Spark and DuckDB.
  * The LSH variant additionally exposes true float cosine (ScalaTest-pinned,
  * not oracle-pinned).
  */
object SimilarityQueries {

  val QueryCount = 20
  val TopK = 5

  /** Quantized vector column: BIGINT per dim, exact in both engines. */
  /** Milli-quantization of a float embedding column — the shared integer
    * representation every similarity op scores in. try_cast, not cast:
    * Catalyst fuses this projection with the [[finiteVec]] filter and
    * subexpression elimination can evaluate it on rows the filter is
    * about to DROP — an ANSI cast of a NaN/Inf component would then kill
    * the task even though the row never survives. try_cast nulls instead;
    * on every surviving (all-finite) row the value is identical. */
  private def quantizeExpr(embedding: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(embedding, x => round(x.cast("double") * 1000, 0).try_cast("long"))

  /** Non-finite components mark a failed encoder output — such vectors are
    * EXCLUDED at the quantization boundary on both engine sides (the
    * embedding twin of "null text = absent document"): round(NaN/Inf)
    * cast to BIGINT throws under ANSI in Spark and errors in DuckDB, so a
    * single bad vector would otherwise kill a 100 TB job at the cast.
    * Zero vectors pass (a legitimate, if useless, embedding — dot = 0);
    * only q28's cosine additionally drops zero NORMS (cosine undefined). */
  private[graft] def finiteVec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    !exists(c, x => isnan(x) || abs(x) === lit(Float.PositiveInfinity))

  private[graft] def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(finiteVec(col("embedding")))
      .withColumn("qv", quantizeExpr(col("embedding")))

  /** Session-scoped PINNED materialization of [[quantized]] — the
    * signedUniquesFor precedent (DedupQueries): the multi-job ANN serving
    * entries (q42/q82/q114, and q107 which composes them) each
    * re-checkpointed the scan+quantize frame on EVERY call, paying one
    * block-store write of the whole corpus per invocation; the frame is a
    * deterministic projection of an immutable input dir, so one pinned
    * copy per (session, corpus) serves them all. Pinned so the bench's
    * between-queries unpersist sweep cannot destroy the localCheckpoint's
    * only copy (see Materialize.materializePinned). Single-shot callers
    * (index builders, one-off audits) stay on plain materialize. The
    * checkpoint MODE (local vs reliable) is fixed at cache-fill time: a
    * session that flips `spark.graft.checkpointDir` mid-flight keeps
    * serving the frame it filled — clear via [[clearQuantizedCache]] to
    * re-materialize under the new mode (MaterializeSpec does exactly
    * this). */
  private val quantizedCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private[graft] def quantizedFor(spark: SparkSession, dir: String): DataFrame =
    quantizedCache.getOrElseUpdate((spark, dir),
      Materialize.materializePinned(quantized(spark, dir)))

  /** Test hook (the clearTokenizerCache twin). */
  private[graft] def clearQuantizedCache(): Unit = quantizedCache.clear()

  /** Q26 — exact brute-force top-k by quantized dot product: the 20 query
    * vectors broadcast against the full corpus (the fact side never moves
    * for the join — at 100 TB the corpus streams once past the broadcast).
    * The per-query top-k is a rank window; Spark inserts WindowGroupLimit,
    * so each map partition keeps only k rows per query before the shuffle —
    * the reducer sees 20 x k x partitions rows, not the corpus. */
  def q26KnnExact(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantized(spark, dir)
    knnExactFrom(emb, emb)
  }

  /** The q26 body over caller-supplied quantized (vec_id, qv) frames —
    * q107 feeds the session-pinned [[quantizedFor]] frame as the CORPUS
    * side so its exact leg shares the one materialized scan with the other
    * three legs, while the ~QueryCount-row query side stays on the lazy
    * parquet scan whose `vec_id < QueryCount` predicate pushes to the
    * footer (a full checkpoint read for 20 rows measured SLOWER at sf1.0 —
    * see the q107 scaladoc; r17, VERDICT r16 #2). The standalone q26 entry
    * passes the same lazy frame twice (its declared-naive timing must keep
    * paying the full pass). */
  private[graft] def knnExactFrom(corpusEmb: DataFrame,
      queryEmb: DataFrame): DataFrame = {
    val queries = queryEmb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"))
    val corpus = corpusEmb.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"))
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col("neighbor_id"), "inner")
      // native codegen'd expression — the innermost loop of the KNN join;
      // the higher-order aggregate(zip_with(...)) equivalent runs its
      // lambda interpreted per element (graft.functions.DotProductLong)
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
    topKScored(scored)
  }

  val LshBits = 4
  val Dims = 64

  /** Deterministic pseudo-random hyperplane signs for (plane p, dim i):
    * +1/-1 from the first md5 hex digit of "p:i" — computed ONCE at plan
    * time and embedded as literal arrays, so the per-row bucket computation
    * is pure arithmetic (no per-row hashing). Parameterized by plane count
    * (r5) so the recall/candidate-count sweep can raise the bucket count
    * the way a 100 TB deployment would; plane p's signs are identical at
    * every `bits`, so raising bits REFINES the same bucketing. */
  private[operators] def planeSignsFor(bits: Int): Seq[Seq[Double]] =
    planeSignsRange(0, bits)

  /** Planes indexed ABSOLUTELY (plane p's signs never depend on how many
    * planes are in use), so table t of a multi-table scheme uses planes
    * [t*bits, (t+1)*bits) and table 0 is exactly the single-table layout. */
  private[operators] def planeSignsRange(from: Int, n: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (from until from + n).map { p =>
      (0 until Dims).map { i =>
        if (DedupQueries.md5hex(md, s"$p:$i").charAt(0) < '8') -1.0 else 1.0
      }
    }
  }

  private lazy val planeSigns: Seq[Seq[Double]] = planeSignsFor(LshBits)

  /** Q27 — bucketed ANN: sign-LSH into 2^4 buckets, multi-probe (exact
    * bucket + all Hamming-1 neighbors), exact quantized dot inside buckets
    * only. The candidate join is an equi-join on the bucket id; candidate
    * count per query = corpus/2^bits x (bits+1) in expectation, tunable by
    * LshBits — at 100 TB raise bits so buckets stay executor-sized, and the
    * plan shape is unchanged. r3: bucketing switched from float-dot signs
    * to the exact integer projection (same [[intBucketCol]] as q45) — a
    * float sign can flip on last-ulp between engines, integer signs cannot,
    * which makes the WHOLE query deterministic integer math and therefore
    * DuckDB hash-checkable (recall vs q26 stays ScalaTest-pinned). */
  def q27AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annLshTopK(spark, dir, LshBits)

  /** Scored candidate set of the sign-LSH ANN at a given plane count —
    * exposed pre-top-k so the sweep tool can count candidates per config. */
  private[graft] def annLshScored(spark: SparkSession, dir: String, bits: Int): DataFrame = {
    val emb = quantized(spark, dir).withColumn("bucket", intBucketColFor(bits))
    // queries probe their own bucket plus each single-bit flip
    val probes = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"), explode(expr(
        s"array_union(array(bucket), transform(sequence(0, $bits - 1), b -> bucket ^ shiftleft(1, b)))"))
        .as("probe"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("bucket"))
    corpus
      .join(probes.hint("broadcast"), col("probe") === col("bucket") &&
        col("query_id") =!= col("neighbor_id"), "inner")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
  }

  private[graft] def annLshTopK(spark: SparkSession, dir: String, bits: Int): DataFrame =
    topKScored(annLshScored(spark, dir, bits))

  /** Q28 — cosine-similarity label census: average cosine within vs across
    * labels over a bounded pair set. Upgraded r3 from rows-only to a full
    * DuckDB hash oracle by making every step bit-stable across engines:
    *  - the dot products are EXACT integer math over the quantized vectors
    *    (written as the zip_with/aggregate HOF idiom; the RewriteDotProduct
    *    optimizer rule compiles it to the native codegen'd dot_product_long);
    *  - cosine = dot / (sqrt(na2) * sqrt(nb2)) entirely in IEEE-754 doubles
    *    whose inputs are exact integers — sqrt, *, / are all correctly
    *    rounded per IEEE, so the double is BIT-IDENTICAL in Spark and DuckDB
    *    when the expression shape matches (which the oracle mirrors 1:1);
    *  - per-pair cosines quantize to micro-units via FLOOR (identical on the
    *    identical double), and the census sums exact BIGINTs — no
    *    order-dependent float summation anywhere. */
  def q28CosineLabelStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantized(spark, dir)
      .filter(col("vec_id") < 100) // bounded demo pair set
      .withColumn("n2", expr(
        "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (s, x) -> s + x)"))
      // cosine is undefined for a zero norm: floor(0/0) would throw at
      // the ANSI BIGINT cast (and error in DuckDB) — zero-norm vectors
      // are excluded from the pair census on both sides
      .filter(col("n2") > 0L)
    val a = emb.select(col("vec_id").as("id_a"), col("qv").as("qa"),
      col("n2").as("na2"), col("label").as("label_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("qv").as("qb"),
      col("n2").as("nb2"), col("label").as("label_b"))
    a.join(b, col("id_a") < col("id_b"), "inner")
      .withColumn("dot", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (s, x) -> s + x)"))
      .withColumn("cos_micro",
        floor(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))) *
          lit(1000000.0)).cast("long"))
      .groupBy((col("label_a") === col("label_b")).as("same_label"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("cos_micro")).as("sum_cos_micro"),
        round(sum(col("cos_micro")).cast("double") / count(lit(1)) / 1000000.0, 3)
          .as("avg_cos"))
      .orderBy(col("same_label").asc)
  }

  // ---- IVF (inverted-file) ANN: the coarse-quantizer scale path ----

  val IvfCells = 8
  val IvfProbes = 2

  // ---- PQ (product quantization): the memory-compression scale path ----
  // Dims split into PqM contiguous subspaces of PqSubDim dims; each
  // subspace gets its own PqK-centroid codebook, so a vector's serving
  // state is PqM small code ids (PqM x log2(PqK) = 32 bits here) instead
  // of Dims longs. PqRerank x TopK ADC-ranked candidates survive into the
  // exact re-rank stage.
  val PqM = 8
  val PqSubDim: Int = Dims / PqM // 8
  val PqK = 16
  val PqRerank = 8

  /** Coarse centroids: seed with the first k vectors, then one Lloyd
    * iteration through [[graft.functions.CentroidAggregator]] — exact
    * integer math end to end, so training is bit-deterministic (no RNG, no
    * float drift), and the resulting centroids are a small broadcastable
    * list. At 100 TB: train on a sample, broadcast the codebook — this
    * exact shape. */
  /** Full Lloyd training: `rounds` assign -> exact-integer-centroid steps
    * from the deterministic seed codebook (rounds = 1 — seed + one step —
    * is the q42 oracle's pinned configuration; production codebooks run a
    * few more rounds for tighter cells). Exact integer math at every step, so
    * training is bit-deterministic (no RNG, no float drift; the only
    * rounding is the centroid's truncating milli-unit division, sub-ulp
    * relative to cell distances). Each round is one codegen'd
    * [[graft.functions.NearestCellLong]] assignment projection over the
    * corpus plus one cells-row aggregate collect — the codebook stays
    * driver-side small, the train-on-sample/broadcast-codebook shape that
    * holds at 100 TB. Cells that lose all members drop out (standard Lloyd
    * on fixed seeds). SimilaritySpec pins the within-cell quantization
    * objective as non-increasing over rounds.
    *
    * Measured caveat (RecallSweep ivf-lloyd, sf0.1): on ISOTROPIC vectors
    * more rounds give a better codebook but WORSE fixed-budget recall
    * (0.87 -> 0.81 at rounds 1 -> 8, cells=16/probes=2, flat candidates) —
    * tighter cells overlap less, so a fixed probe count explores less of
    * each query's neighborhood. Refinement pays off on genuinely clustered
    * production embeddings; on unstructured corpora spend the budget on
    * probes/cells instead. */
  private[graft] def trainCodebook(emb: DataFrame, cells: Int,
      rounds: Int): Array[(Int, Array[Long])] = {
    // Seed id-space-independently: the lowest `cells` vec_ids via one
    // bounded TakeOrderedAndProject job — NOT `vec_id < cells`. Production
    // id spaces (snowflake ids, sharded offsets) don't start near 0; the
    // old filter form silently returned an EMPTY codebook there and every
    // downstream assignment degraded to cell-0 with no error (VERDICT r5
    // "what's wrong" #1). Seed cell ids are the 0..cells-1 rank of the
    // seed's vec_id — dense ints whatever the id space; on a dense-from-0
    // corpus (the oracle testdata) rank == vec_id, so the codebook — and
    // the q42 oracle — are bit-identical to the old form.
    val seeds = emb.select(col("vec_id"), col("qv"))
      .orderBy(col("vec_id").asc).limit(cells)
      .collect()
      .sortBy(_.getLong(0))
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1).toArray) }
    if (seeds.isEmpty) return Array.empty // empty corpus: no codebook
    if (seeds.length < cells)
      // Clamp, loudly: train min(cells, n) cells instead of throwing
      // (VERDICT r7 what's-wrong #3 — the friendlier contract). The k-means
      // structure is unaffected: every vector still assigns to its nearest
      // of the n seeded cells; downstream probe counts clamp per-query.
      System.err.println(
        s"[ivf] corpus has only ${seeds.length} vectors for $cells cells; " +
          s"training ${seeds.length} cells")
    val centroid = udaf(graft.functions.CentroidAggregator)
    var cb = seeds
    var r = 0
    while (r < rounds) {
      cb = emb.withColumn("cell", nearestCellExpr(cb))
        .groupBy(col("cell"))
        .agg(centroid(col("embedding")).as("c"))
        .collect()
        .map(row => (row.getInt(0), row.getSeq[Long](1).toArray))
        .sortBy(_._1)
      r += 1
    }
    cb
  }

  /** Distance-ranked (distance, cell) structs for every centroid — each
    * dot product evaluated exactly once per row (a when()-fold argmin would
    * duplicate score subtrees exponentially in codebook size).
    * ||v - c||^2 ranking only needs (||c||^2 - 2<v,c>). */
  private def cellScores(centroids: Array[(Int, Array[Long])]): Array[org.apache.spark.sql.Column] =
    centroids.map { case (cell, c) =>
      val cNorm = c.map(x => x * x).sum
      struct(
        (lit(cNorm) - lit(2L) * graft.functions.DotProductLong(col("qv"), typedLit(c.toSeq))).as("d"),
        lit(cell).as("cell"))
    }

  /** Nearest cell for the per-corpus-row assignment: the native
    * [[graft.functions.NearestCellLong]] kernel — one fused codegen'd loop
    * over cells x dims. The declarative struct-array argmin grows its
    * expression tree with the codebook and falls out of codegen past a few
    * dozen cells (the r5 recall sweep measured 49 s at cells=64 on the 30x
    * corpus); the native kernel keeps assignment linear in cells, the
    * property that makes thousands-of-cells production codebooks viable.
    * Ties break toward the lower cell id in both formulations. The
    * expression returns the centroid's INDEX; centroids are sorted by cell
    * id, so the id lookup is one literal-array element_at. */
  private def nearestCellExpr(centroids: Array[(Int, Array[Long])]): org.apache.spark.sql.Column = {
    val idx = graft.functions.NearestCellLong(
      col("qv"),
      typedLit(centroids.map(_._2.toSeq).toSeq),
      typedLit(centroids.map { case (_, c) => c.map(x => x * x).sum }.toSeq))
    element_at(typedLit(centroids.map(_._1).toSeq), idx + lit(1))
  }

  /** Q42 — IVF ANN: assign corpus to coarse cells, probe the query's
    * IvfProbes nearest cells, exact top-k inside the probed cells only.
    * The candidate join is an equi-join on the cell id (same bucket-join
    * shape as LSH — never all-pairs); cells per query bound the work to
    * probes/cells of the corpus. r3: hash-oracle-checked — the ENTIRE
    * pipeline (seeding, one Lloyd step, assignment, probe ranking, top-k)
    * is exact integer math with lexicographic (distance, cell) tie-breaks,
    * so DuckDB reproduces it CTE-for-stage; recall vs q26 additionally
    * ScalaTest-pinned.
    *
    * FAILURE MODE (ADVICE r6): a NON-EMPTY corpus with fewer than
    * [[IvfCells]] vectors throws IllegalStateException from seeding —
    * deliberate (a partially-seeded codebook is almost always a config
    * error; the pre-r6 silent degradation was worse). Tiny corpora should
    * run [[q26KnnExact]], or pass `cells <= corpus size` to the
    * parameterized entry points. Empty corpora return an empty result. */
  def q42IvfAnn(spark: SparkSession, dir: String): DataFrame =
    ivfAnnTopK(spark, dir, IvfCells, IvfProbes)

  /** Scored IVF candidates at a given (cells, probes) — pre-top-k for the
    * sweep tool; [[q42IvfAnn]] is the fixed-config oracle entry. */
  private[graft] def ivfAnnScored(spark: SparkSession, dir: String,
      cells: Int, probes: Int, lloydRounds: Int = 1): DataFrame = {
    // IVF is inherently multi-job (seed collect -> centroid agg -> assign ->
    // probe/top-k): materialize scan+quantize ONCE instead of recomputing it
    // in every job (VERDICT r4: the only top-5 query with avoidable local
    // overhead). At 100 TB the codebook trains on a SAMPLE, so the big scan
    // runs once either way — this aligns the local shape with that.
    val emb = quantizedFor(spark, dir)
    val centroids = trainCodebook(emb, cells, lloydRounds)
    if (centroids.isEmpty) {
      // empty corpus: no seeds -> no codebook; an empty probe array would
      // type as VOID and fail analysis (EmptyInputSpec)
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("query_id", "neighbor_id", "dot")
    }
    val assigned = emb.withColumn("cell", nearestCellExpr(centroids))
    val corpus = assigned.select(col("vec_id").as("neighbor_id"),
      col("qv").as("qb"), col("cell"))
    ivfProbeScore(emb, corpus, centroids, probes)
  }

  /** The probe/score stage shared by the inline pipeline and the persisted
    * index: per-query probe cells ranked by the exact distance expression,
    * cell equi-join against the assigned corpus, integer dot scoring. */
  private def ivfProbeScore(emb: DataFrame, corpus: DataFrame,
      centroids: Array[(Int, Array[Long])], probes: Int): DataFrame = {
    val queries = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"),
        explode(slice(sort_array(array(cellScores(centroids): _*)), 1, probes)).as("probe"))
      .select(col("query_id"), col("qa"), col("probe.cell").as("probe_cell"))
    corpus
      .join(queries.hint("broadcast"), col("probe_cell") === col("cell") &&
        col("query_id") =!= col("neighbor_id"), "inner")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
  }

  /** Build-once/query-many IVF index: persists the codebook (cell ->
    * centroid) and the corpus cell assignment as parquet — the production
    * ANN serving shape (training + the full-corpus assignment scan are a
    * batch job whose cost amortizes over every query that follows; q42
    * re-derives both per call, which is the right shape for a one-shot
    * benchmark but not for a serving path). The assignment table carries
    * only (vec_id, cell) — vectors stay in the source table and re-join by
    * id at query time, so the index is tiny relative to the corpus.
    * Like [[q42IvfAnn]], throws IllegalStateException when a non-empty
    * corpus has fewer than `cells` vectors (ADVICE r6: intentional loud
    * failure — pass a smaller `cells` for legitimately tiny corpora). */
  def buildIvfIndex(spark: SparkSession, dir: String, indexDir: String,
      cells: Int = IvfCells, lloydRounds: Int = 1): Unit = {
    import spark.implicits._
    val emb = Materialize.materialize(quantized(spark, dir))
    val centroids = trainCodebook(emb, cells, lloydRounds)
    centroids.toSeq.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    val assigned =
      if (centroids.isEmpty) emb.select(col("vec_id"), lit(0).as("cell")) // empty corpus
      else emb.withColumn("cell", nearestCellExpr(centroids)).select(col("vec_id"), col("cell"))
    // batch_id-partitioned like the band index (base build = -1) so the
    // delta-assign path can append with idempotent replay
    assigned.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      // STATIC pin, mirroring buildNearDupIndex: a rebuild replaces the
      // whole assignment table even when the session default is dynamic
      .option("partitionOverwriteMode", "static")
      .partitionBy("batch_id")
      .parquet(DedupQueries.currentGeneration(spark, s"$indexDir/assignments"))
  }

  /** Incremental index maintenance: assign NEW vectors against the
    * persisted codebook (no retraining — the standard IVF ingest path:
    * centroids stay fixed between rebuilds, deltas append to the
    * assignment table). One bounded codebook collect, then the same
    * native [[graft.functions.NearestCellLong]] assignment the builder
    * used — appended rows are bit-identical to what a full rebuild with
    * the same codebook would produce (pinned by SimilaritySpec). Input:
    * any frame with (vec_id, embedding); output: (vec_id, cell).
    *
    * `appendBatchId = Some(n)` persists the delta into the index as
    * partition `batch_id = n` via dynamic partition overwrite — the same
    * exactly-once replay discipline as the band index's
    * appendToNearDupIndex: a crash-replayed batch replaces its own
    * previous rows and touches nothing else. */
  def assignToIvfIndex(newVectors: DataFrame, indexDir: String,
      appendBatchId: Option[Long] = None): DataFrame = {
    val spark = newVectors.sparkSession
    val centroids = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val assigned =
      if (centroids.isEmpty) newVectors.select(col("vec_id"), lit(0).as("cell"))
      else newVectors
        .withColumn("qv", quantizeExpr(col("embedding")))
        .withColumn("cell", nearestCellExpr(centroids))
        .select(col("vec_id"), col("cell"))
    appendBatchId.foreach { b =>
      assigned.withColumn("batch_id", lit(b))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(DedupQueries.currentGeneration(spark, s"$indexDir/assignments"))
    }
    assigned
  }

  /** Fold appended assignment partitions back into the base (-1) — the
    * IVF twin of DedupQueries.compactNearDupIndex, sharing its
    * generation-rollover write (the new generation is fully on disk
    * before the live directory is touched). The codebook is untouched:
    * compaction is a layout operation, retraining ([[buildIvfIndex]]) is
    * a different decision. */
  /** The IVF index's current-generation assignment table — the read-side
    * twin of [[buildIvfIndex]]/[[assignToIvfIndex]] (generation-managed,
    * see DedupQueries.currentGeneration). */
  def readIvfAssignments(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(
      DedupQueries.currentGeneration(spark, s"$indexDir/assignments"))

  def compactIvfIndex(spark: SparkSession, indexDir: String): Unit =
    DedupQueries.compactGeneration(spark, s"$indexDir/assignments",
      // re-delivered vectors may sit in several batch partitions with the
      // same assignment; compaction is the place to collapse them instead
      // of baking duplicates into the base generation
      df => df.select(col("vec_id"), col("cell")).dropDuplicates("vec_id", "cell"))

  /** IVF top-k served from a persisted index: one bounded collect of the
    * cells-row codebook, an id equi-join to re-attach vectors to their
    * precomputed cells, then the same probe/score/top-k as q42. Output is
    * row-identical to the inline pipeline at equal (cells, probes) —
    * pinned by SimilaritySpec. */
  def ivfAnnTopKFromIndex(spark: SparkSession, dir: String, indexDir: String,
      probes: Int = IvfProbes): DataFrame = {
    val centroids = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    if (centroids.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("query_id", "neighbor_id", "dot")
    }
    val emb = quantized(spark, dir)
    // dropDuplicates: a vec_id can legitimately appear in several batch_id
    // partitions (re-delivered feed under a new appendBatchId — replay
    // only guards the SAME batch id); duplicate assignment rows would put
    // the same neighbor into top-k twice and displace a genuine one
    val corpus = emb.join(
        readIvfAssignments(spark, indexDir)
          .select(col("vec_id"), col("cell")).dropDuplicates("vec_id", "cell"),
        "vec_id")
      .select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("cell"))
    topKScored(ivfProbeScore(emb, corpus, centroids, probes))
  }

  private[graft] def ivfAnnTopK(spark: SparkSession, dir: String,
      cells: Int, probes: Int, lloydRounds: Int = 1): DataFrame =
    topKScored(ivfAnnScored(spark, dir, cells, probes, lloydRounds))

  /** Hash-table count for q107's LSH leg: 4 tables of [[LshBits]] planes
    * each — the OR-amplification configuration the r5 sweep motivated. */
  val RecallLshTables = 4

  /** Q107 — ANN recall audit over ALL THREE serving families (r12,
    * VERDICT r10 #7 / r11 #2): per-query recall@k of the production IVF
    * path ([[q42IvfAnn]]), the IVF-PQ + exact-re-rank path
    * ([[q82IvfPqAnn]]), and the multi-table sign-LSH path
    * ([[annLshMultiTable]] at ([[LshBits]], [[RecallLshTables]])) against
    * the exact brute-force top-k ([[q26KnnExact]]) on the same bounded
    * query sample — the measurement a serving team reads before trading
    * exactness for probe budget (tools/RecallSweep explores the config
    * space; this entry pins one configuration PER FAMILY as an
    * oracle-checked row, so a codebook, PQ-codebook, or plane-table
    * regression in ANY family fails the gate, not production).
    *
    * Shape: all legs are existing bounded pipelines; the exact
    * denominator is [[Materialize]]d once (QueryCount×TopK rows) and fans
    * out to three (QueryCount×TopK)-row left joins + tiny aggregates. At
    * 100 TB recall is audited exactly this way — on a bounded query
    * sample, each family costing its own serving pass. Every stage is
    * exact integer math with lexicographic tie-breaks, so DuckDB
    * re-derives all four top-k sets and every recall cell bit-for-bit.
    * recall_milli is fixed-point (hits×1000 div |exact|). */
  def q107AnnRecall(spark: SparkSession, dir: String): DataFrame = {
    // r17 (VERDICT r16 #2, guide §1.4/§6): the exact leg's CORPUS side now
    // reads the session-pinned [[quantizedFor]] frame the IVF/IVFPQ legs
    // already serve from, instead of re-deriving scan+quantize per call.
    // The rest of the prescription was measured and REJECTED, leg by leg
    // (interleaved fresh-JVM A/Bs):
    //  - query/probe sides pinned: a full checkpoint deserialization for
    //    ~QueryCount rows vs a footer-pushed `vec_id < QueryCount` parquet
    //    read — all-pinned form 4.11 → 4.71 s at sf1.0 (sf0.1 HID it: the
    //    r16 q84 lesson from the other side);
    //  - LSH corpus side pinned: 4.16/4.28/4.99 (lazy) vs 5.65/5.75/5.92 s
    //    (pinned) at sf1.0, neutral at sf0.1 — the wide checkpoint rows
    //    (label + float embedding + qv) feed the 16-plane-dot projection
    //    and the candidate dedup worse than the pruned vectorized parquet
    //    scan does.
    // This form A/B'd ≤ head at BOTH SFs (sf0.1 3.47/3.61 → 3.14/3.45;
    // sf1.0 4.12/4.30 → 4.08/4.22); rows are identical — quantizedFor IS
    // quantized, materialized.
    val emb = quantizedFor(spark, dir)
    val lazyEmb = quantized(spark, dir)
    val exact = Materialize.materialize(
      knnExactFrom(emb, lazyEmb).select(col("query_id"), col("neighbor_id")))
    def leg(family: String, approx: DataFrame): DataFrame =
      exact.join(
          approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(lit(family).as("family"), col("query_id"), col("n_exact"),
          col("n_hit"), expr("n_hit * 1000 div n_exact").as("recall_milli"))
    leg("ivf", q42IvfAnn(spark, dir))
      .unionAll(leg("ivfpq", q82IvfPqAnn(spark, dir)))
      .unionAll(leg("lsh", annLshMultiTable(spark, dir, LshBits, RecallLshTables)))
      .orderBy(col("family").asc, col("query_id").asc)
  }

  /** Q114 — IVF cluster-BALANCE audit: the per-cell population census of
    * the production codebook's assignment (the q42 configuration), with
    * each cell's corpus share in integer permille. The index-layer member
    * of the audit family (q107 recall, q110 sketch error, q111
    * calibration, q113 split leakage): a hot cell IS the serve-time skew
    * risk — every query probing it scans its whole population, so one
    * overloaded cell sets the ANN latency floor at 100 TB — and a cell
    * that lost all members (standard Lloyd on fixed seeds) simply
    * disappears from the census, which a fixed-cell-count gate hash
    * catches. Derivation is exactly the q42/q107 assignment (same
    * quantize, seed, one Lloyd step, nearest-cell projection; the oracle
    * composes the same coarse CTE prefix), reduced by one map-side-partial
    * aggregate to ≤ [[IvfCells]] rows; the 1-row total travels by
    * broadcast crossJoin (the q109 discipline). */
  def q114IvfBalance(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantizedFor(spark, dir)
    val centroids = trainCodebook(emb, IvfCells, 1)
    if (centroids.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("cell", "n_vecs", "share_milli")
    }
    // Materialized: census feeds both the output and the 1-row total —
    // lazy, the corpus-wide nearest-cell assignment would run twice
    // (review r11); the checkpoint is <= IvfCells rows
    val census = Materialize.materialize(
      emb.withColumn("cell", nearestCellExpr(centroids))
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs")))
    census
      .crossJoin(broadcast(census.agg(sum(col("n_vecs")).as("total"))))
      // BIGINT cell: the oracle's row_number-derived cell is INT64
      .select(col("cell").cast("long").as("cell"), col("n_vecs"),
        expr("n_vecs * 1000 div total").as("share_milli"))
      .orderBy(col("cell").asc)
  }

  // ---- Q117: sign-random-projection sketch calibration audit ----

  /** Planes in q117's SRP sketch — deliberately MORE than [[LshBits]] so
    * the audit has angular resolution (16 sign bits ≈ 62-milli match
    * steps); plane p's signs are the SAME absolute [[planeSignsRange]]
    * planes the LSH families bucket with, so the audit measures the
    * production projection family, not a lookalike. */
  val SrpPlanes = 16

  /** Bounded audit sample (the q28 bounded-pair discipline): 128 vectors
    * → 8128 pairs, constant at every corpus scale. */
  val SrpSample = 128

  /** Q117 — SRP sketch CALIBRATION audit: for a bounded all-pairs sample,
    * compare the sign-random-projection sketch's agreement fraction
    * against the EXACT quantized cosine, aggregated by cosine decile —
    * the embedding-space member of the audit family (q110 does this for
    * MinHash vs Jaccard; q107 measures end-to-end recall; this measures
    * the PROJECTION layer those LSH tables are built from). Goemans–
    * Williamson gives E[match] = 1 − θ/π, so the avg_match_milli column
    * must rise monotonically with the cosine decile (412 → 593 milli
    * across deciles 2–7 on this corpus); a plane-table or quantization
    * regression bends the curve and fails the gate hash — silent recall
    * drift in q27/q45/q107's LSH legs becomes a red row here first.
    *
    * EXACTNESS: sign bits fold over exact integer plane dots (ties → 0,
    * the [[intBucketColRange]] convention, so the sketch IS the bucketing
    * machinery's); match count = planes − bit_count(xor) on the packed
    * int; est_milli and the decile are integer division; the exact cosine
    * is q28's bit-stable floor(dot/(√na²·√nb²)·10⁶) discipline. Signed
    * avg_cos_micro divides by `div` — truncation toward zero on both
    * engines (the q111 signed-bucket precedent).
    *
    * Scale shape: one codegen'd projection computes norm + 16 plane dots
    * per sampled vector (the sample filter pushes to the scan); the pair
    * join is a bounded broadcast nested loop (≤ [[SrpSample]]² rows by
    * construction — the q28 shape); output ≤ 11 rows from one map-side-
    * partial aggregate. Nothing scales with the corpus but the scan that
    * finds the sampled vec_ids. */
  def q117SrpAudit(spark: SparkSession, dir: String): DataFrame =
    srpAudit(quantized(spark, dir))

  /** The q117 body over ANY quantized (vec_id, qv) frame — specs feed
    * constructed vectors (identical → decile 10 / match 1000, negated →
    * decile 0 / match 0). */
  private[graft] def srpAudit(emb: DataFrame): DataFrame = {
    val sampled = emb
      .filter(col("vec_id") < SrpSample)
      .withColumn("n2", expr(
        "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (s, x) -> s + x)"))
      // zero-norm vectors have no angle — excluded on both sides (q28)
      .filter(col("n2") > 0L)
      .withColumn("sig", intBucketColFor(SrpPlanes))
    val a = sampled.select(col("vec_id").as("id_a"), col("qv").as("qa"),
      col("n2").as("na2"), col("sig").as("sa"))
    val b = sampled.select(col("vec_id").as("id_b"), col("qv").as("qb"),
      col("n2").as("nb2"), col("sig").as("sb"))
    a.join(b, col("id_a") < col("id_b"), "inner")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
      .select(
        floor(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))) *
          lit(1000000.0)).cast("long").as("cos_micro"),
        expr(s"($SrpPlanes - bit_count(sa ^ sb)) * 1000 div $SrpPlanes")
          .cast("long").as("est_milli"))
      .select(expr("(cos_micro + 1000000) div 200000").as("decile"),
        col("est_milli"), col("cos_micro"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("sum(est_milli) div count(1)").as("avg_match_milli"),
        expr("sum(cos_micro) div count(1)").as("avg_cos_micro"))
      .orderBy(col("decile").asc)
  }

  /** Per-subspace PQ codebooks: seed subspace m with the lowest [[PqK]]
    * vec_ids' m-th sub-vectors (code id = vec_id rank, like the coarse
    * seeding), then ONE exact-integer Lloyd step — assign every vector's
    * sub-vector to its nearest seed (L2, ties to the lower code), then the
    * truncating-integer elementwise mean per (subspace, code, dim). All M
    * refinements run as a single unpivoted aggregation job (key space
    * PqM x PqK x PqSubDim — map-side combinable at any corpus size) plus
    * one bounded collect of at most that many rows; the codebooks stay
    * driver-side literals exactly like the coarse centroids. Codes that
    * lose every member drop out (standard Lloyd on fixed seeds). Returns,
    * per subspace, the surviving (code, sub-centroid) pairs sorted by code;
    * empty corpus returns an empty array. Corpora smaller than PqK clamp
    * loudly like [[trainCodebook]]. */
  private[graft] def trainPqCodebooks(emb: DataFrame): Array[Array[(Int, Array[Long])]] = {
    val seedRows = emb.select(col("vec_id"), col("qv"))
      .orderBy(col("vec_id").asc).limit(PqK)
      .collect().sortBy(_.getLong(0)).map(_.getSeq[Long](1).toArray)
    if (seedRows.isEmpty) return Array.empty
    if (seedRows.length < PqK)
      System.err.println(
        s"[pq] corpus has only ${seedRows.length} vectors for $PqK codes per " +
          s"subspace; training ${seedRows.length}")
    val seeds: Array[Array[(Int, Array[Long])]] = Array.tabulate(PqM) { m =>
      seedRows.zipWithIndex.map { case (v, i) =>
        (i, v.slice(m * PqSubDim, (m + 1) * PqSubDim))
      }
    }
    val subStructs = (0 until PqM).map { m =>
      val sv = slice(col("qv"), m * PqSubDim + 1, PqSubDim)
      struct(lit(m).as("m"), nearestSubCodeExpr(seeds(m), sv).as("code"), sv.as("sv"))
    }
    val sums = emb.select(explode(array(subStructs: _*)).as("s"))
      .select(col("s.m").as("m"), col("s.code").as("code"),
        posexplode(col("s.sv")).as(Seq("dim", "x")))
      .groupBy(col("m"), col("code"), col("dim"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("cnt"))
      .collect()
    val byM = sums.groupBy(_.getInt(0))
    Array.tabulate(PqM) { m =>
      byM.getOrElse(m, Array.empty).groupBy(_.getInt(1)).toArray.map {
        case (code, rows) =>
          val cent = new Array[Long](PqSubDim)
          // truncating integer mean — matches DuckDB's BIGINT `//` (both
          // truncate toward zero), the same convention as CentroidAggregator
          rows.foreach(r => cent(r.getInt(2)) = r.getLong(3) / r.getLong(4))
          (code, cent)
      }.sortBy(_._1)
    }
  }

  /** Nearest PQ code for one subspace — the [[nearestCellExpr]] pattern
    * over a sub-vector column: one fused codegen'd argmin over codes x
    * sub-dims, ties toward the lower code id, returning the ORIGINAL code
    * id through the sorted-survivors literal lookup. */
  private def nearestSubCodeExpr(cb: Array[(Int, Array[Long])],
      sv: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val idx = graft.functions.NearestCellLong(
      sv,
      typedLit(cb.map(_._2.toSeq).toSeq),
      typedLit(cb.map { case (_, c) => c.map(x => x * x).sum }.toSeq))
    element_at(typedLit(cb.map(_._1).toSeq), idx + lit(1))
  }

  /** Subspace codebook as a dense PqK-slot literal (slot c = centroid of
    * code c) for the ADC lookup tables. Dead codes hold zero vectors —
    * unreachable, since corpus code columns only ever contain surviving
    * ids. */
  private def padPqCodebook(cb: Array[(Int, Array[Long])]): Seq[Seq[Long]] = {
    val byCode = cb.toMap
    (0 until PqK).map(c => byCode.getOrElse(c, Array.fill(PqSubDim)(0L)).toSeq)
  }

  /** Q82 — IVF-PQ ANN with exact re-rank, the 100 TB memory path: coarse
    * IVF cells bound WHICH vectors are scored (same probe discipline as
    * q42) and product quantization bounds WHAT is stored and shipped per
    * vector — the corpus side of the candidate join carries (id, cell,
    * [[PqM]] code ids; 32 bits of codes) instead of the [[Dims]]-long
    * vector, and the scan scores candidates by ADC (asymmetric distance
    * computation): each query precomputes one [[PqK]]-entry lookup table
    * of exact sub-vector dots per subspace, so a candidate costs PqM
    * array lookups + adds instead of a Dims-long dot product. The
    * [[PqRerank]]x[[TopK]] best ADC candidates per query are then
    * re-ranked by the EXACT quantized dot (fetching the full vector for
    * just the shortlist — the standard two-stage PQ serving shape: Jegou
    * et al., "Product Quantization for Nearest Neighbor Search", TPAMI
    * 2011). Re-expressed declaratively: training is one unpivoted
    * aggregation, codes are codegen'd argmin projections, the LUT is a
    * per-query-row array column, the probe join is the same broadcast
    * equi-join as q42 (never all-pairs), and the re-rank is a broadcast
    * id-join of the tiny shortlist back to the corpus. Every stage is
    * exact integer math with deterministic ties (distance ASC, code/cell
    * ASC; ADC DESC / dot DESC, neighbor_id ASC), so the ENTIRE pipeline —
    * coarse training, PQ training, encoding, ADC shortlist, exact re-rank
    * — is DuckDB-replicable CTE-for-stage and hash-checked by the oracle.
    * Output: top-[[TopK]] (query_id, neighbor_id, dot, adc_dot) per
    * query, ranked by the exact re-rank score. */
  def q82IvfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantizedFor(spark, dir)
    val (coarse, pq) = pqCodebooksFor(dir, emb)
    if (coarse.isEmpty || pq.isEmpty) return emptyPqResult(spark)
    // the encoded corpus is the session twin of the persisted assignment
    // table ([[buildPqIndex]]): (cell, 8 code argmins) per vector is the
    // EXPENSIVE projection of the pipeline, and it is a deterministic
    // function of (corpus, codebooks) — encode once per (session, dir),
    // serve from the compressed representation thereafter, exactly what
    // the index path does from parquet
    val corpus = encodedPqCorpusFor(spark, dir, emb, coarse, pq)
    ivfPqServe(emb, corpus, coarse, pq)
  }

  private val encodedPqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def encodedPqCorpusFor(spark: SparkSession, dir: String,
      emb: DataFrame, coarse: Array[(Int, Array[Long])],
      pq: Array[Array[(Int, Array[Long])]]): DataFrame =
    encodedPqCache.getOrElseUpdate((spark, dir),
      Materialize.materializePinned(encodePq(emb, coarse, pq)
        .withColumnRenamed("vec_id", "neighbor_id")))

  /** Test hook (the clearTokenizerCache twin). */
  private[graft] def clearEncodedPqCache(): Unit = encodedPqCache.clear()

  /** Session-scoped train-once cache for the q82/q107 codebooks — the
    * q101 tokenizer-cache precedent (TextQueries.tokenizerFor), ruled for
    * q82 by VERDICT r13 #3: the inline form retrained coarse + PQ
    * codebooks (two collect-terminated training aggregations) on every
    * call, which is a TRAINING cost in a SERVING window. Keyed by the
    * corpus path: the testdata dirs are immutable inputs and both
    * trainings are deterministic functions of the corpus (integer Lloyd,
    * fixed seeds), so a cached codebook is bit-identical to a retrained
    * one (SimilaritySpec pins the round trip). The cached value is plain
    * driver-side arrays — nothing session-bound, so the bench's
    * unpersist sweep cannot invalidate it. The production analog is
    * [[buildPqIndex]]'s persisted codebooks; this cache is the in-session
    * equivalent for catalog entries that serve repeatedly. Keyed by
    * (session, dir) like the quantized/encoded caches (ADVICE r14: a
    * dir-only key outlived the session and served cross-session). */
  private val trainedPqCodebooks = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (Array[(Int, Array[Long])], Array[Array[(Int, Array[Long])]])]

  private def pqCodebooksFor(dir: String, emb: DataFrame)
      : (Array[(Int, Array[Long])], Array[Array[(Int, Array[Long])]]) =
    trainedPqCodebooks.getOrElseUpdate((emb.sparkSession, dir),
      (trainCodebook(emb, IvfCells, 1), trainPqCodebooks(emb)))

  /** Test hook: drop cached codebooks (the parity spec trains twice and
    * asserts the memoization is pure). */
  private[graft] def clearPqCodebookCache(): Unit = trainedPqCodebooks.clear()

  /** Public invalidation path (ADVICE r14): after an in-place rewrite of a
    * corpus dir, drop every (session, dir) cache — the pinned quantized
    * frame, the encoded-PQ corpus, the trained codebooks — and release the
    * pinned checkpoint blocks, so the next call re-derives from the new
    * parquet instead of silently serving stale encodings. Also the
    * session-teardown hook: calling it for each dir a stopped session
    * touched frees the retained DataFrame references (the caches have no
    * automatic eviction — deliberate, a TrieMap of ≤ a few corpus dirs —
    * but "no eviction" must not mean "no eviction POSSIBLE"). */
  def invalidateCorpus(spark: SparkSession, dir: String): Unit = {
    quantizedCache.remove((spark, dir)).foreach(Materialize.releasePinned)
    encodedPqCache.remove((spark, dir)).foreach(Materialize.releasePinned)
    trainedPqCodebooks.remove((spark, dir))
  }

  private def emptyPqResult(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long, Long)]
      .toDF("query_id", "neighbor_id", "dot", "adc_dot")
  }

  /** The per-vector PQ serving state: coarse cell + the PqM code ids —
    * one codegen'd projection (coarse argmin + PqM sub-argmins), shared by
    * the inline q82 pipeline and the index builder. */
  private def encodePq(emb: DataFrame, coarse: Array[(Int, Array[Long])],
      pq: Array[Array[(Int, Array[Long])]]): DataFrame =
    emb.withColumn("cell", nearestCellExpr(coarse))
      .select(col("vec_id"), col("cell"),
        array((0 until PqM).map(m =>
          nearestSubCodeExpr(pq(m), slice(col("qv"), m * PqSubDim + 1, PqSubDim))): _*)
          .as("codes"))

  /** The IVF-PQ serving tail shared by the inline pipeline and the
    * persisted index: probe cells, ADC-score the candidates' codes through
    * per-query lookup tables, shortlist, exact re-rank. `corpus` carries
    * only (neighbor_id, cell, codes); `emb` supplies query vectors and the
    * shortlist's re-rank vectors. */
  private def ivfPqServe(emb: DataFrame, corpus: DataFrame,
      coarse: Array[(Int, Array[Long])],
      pq: Array[Array[(Int, Array[Long])]]): DataFrame = {
    // ADC lookup tables, one per subspace: lut[m][c+1] = <query sub-vector,
    // centroid c of subspace m> — computed once per (query, probe) row on
    // the tiny broadcast side; the per-candidate cost in the join below is
    // PqM element_at lookups, all inside whole-stage codegen.
    val lutCols = (0 until PqM).map { m =>
      transform(typedLit(padPqCodebook(pq(m))), c =>
        graft.functions.DotProductLong(
          slice(col("qa"), m * PqSubDim + 1, PqSubDim), c))
    }
    val queries = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"),
        explode(slice(sort_array(array(cellScores(coarse): _*)), 1, IvfProbes)).as("probe"))
      .select(col("query_id"), col("qa"), col("probe.cell").as("probe_cell"))
      .withColumn("lut", array(lutCols: _*))
      .drop("qa")
    val adcDot = (0 until PqM).map { m =>
      element_at(element_at(col("lut"), m + 1),
        element_at(col("codes"), m + 1) + lit(1))
    }.reduce(_ + _)
    val scored = corpus
      .join(queries.hint("broadcast"),
        col("probe_cell") === col("cell") && col("query_id") =!= col("neighbor_id"),
        "inner")
      .withColumn("adc_dot", adcDot)
    // ADC shortlist: PqRerank x TopK per query (WindowGroupLimit prunes
    // per-partition before the shuffle, as in q26)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("neighbor_id").asc)
    val shortlist = scored
      .select(col("query_id"), col("neighbor_id"), col("adc_dot"),
        row_number().over(wAdc).as("adc_rn"))
      .filter(col("adc_rn") <= PqRerank * TopK)
      .drop("adc_rn")
    // exact re-rank: fetch full vectors for the tiny shortlist only — the
    // shortlist (bounded by queries x PqRerank x TopK rows) broadcasts
    // against the corpus on both id-joins; the big table never shuffles
    val queryVecs = emb.filter(col("vec_id") < QueryCount)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"))
    val reranked = shortlist.hint("broadcast")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("qv").as("qb")), "neighbor_id")
      .join(queryVecs.hint("broadcast"), "query_id")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    reranked
      .select(col("query_id"), col("neighbor_id"), col("dot"), col("adc_dot"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("dot"), col("adc_dot"))
      .orderBy(col("query_id").asc, col("dot").desc, col("neighbor_id").asc)
  }

  /** Build-once/query-many IVF-PQ index — the PQ twin of [[buildIvfIndex]].
    * Persists the coarse codebook, the per-subspace PQ codebooks, and the
    * per-vector (cell, codes) serving state. Unlike the plain IVF index
    * (ids only — vectors re-join at query time), the PQ assignment table
    * IS the compressed corpus representation: the serving scan reads only
    * it, and original vectors are touched for nothing but the
    * [[PqRerank]]x[[TopK]]-row re-rank shortlist. Same generation
    * management, batch_id append discipline, and static-overwrite rebuild
    * pin as the IVF/band indexes. */
  def buildPqIndex(spark: SparkSession, dir: String, indexDir: String): Unit = {
    import spark.implicits._
    val emb = Materialize.materialize(quantized(spark, dir))
    val coarse = trainCodebook(emb, IvfCells, 1)
    val pq = trainPqCodebooks(emb)
    coarse.toSeq.map { case (cell, c) => (cell, c.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    pq.zipWithIndex.flatMap { case (cb, m) =>
      cb.map { case (code, c) => (m, code, c.toSeq) }
    }.toSeq.toDF("m", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/pq_codebooks")
    val assigned =
      if (coarse.isEmpty || pq.isEmpty)
        emb.select(col("vec_id"), lit(0).as("cell"),
          array_repeat(lit(0), PqM).as("codes")) // empty corpus: no rows
      else encodePq(emb, coarse, pq)
    assigned.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("batch_id")
      .parquet(DedupQueries.currentGeneration(spark, s"$indexDir/assignments"))
  }

  /** Read back the two persisted codebooks (bounded collects — cells rows
    * and PqM x PqK rows). */
  private def readPqCodebooks(spark: SparkSession, indexDir: String)
      : (Array[(Int, Array[Long])], Array[Array[(Int, Array[Long])]]) = {
    val coarse = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val pqRows = spark.read.parquet(s"$indexDir/pq_codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val pq = Array.tabulate(PqM)(m =>
      pqRows.filter(_._1 == m).map { case (_, code, c) => (code, c) }.sortBy(_._1))
    (coarse, pq)
  }

  /** IVF-PQ top-k served from a persisted index: bounded codebook collects,
    * the compressed assignment table as the candidate corpus, then the same
    * probe/ADC/shortlist/re-rank as q82 — row-identical to the inline
    * pipeline (pinned by SimilaritySpec). */
  def ivfPqTopKFromIndex(spark: SparkSession, dir: String,
      indexDir: String): DataFrame = {
    val (coarse, pq) = readPqCodebooks(spark, indexDir)
    if (coarse.isEmpty || pq.forall(_.isEmpty)) return emptyPqResult(spark)
    val emb = quantized(spark, dir)
    // dropDuplicates: re-delivered vectors may sit in several batch
    // partitions with the same (cell, codes) — same guard as the IVF index
    val corpus = readIvfAssignments(spark, indexDir)
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("codes"))
      .dropDuplicates("neighbor_id", "cell", "codes")
    ivfPqServe(emb, corpus, coarse, pq)
  }

  /** Incremental PQ index maintenance: encode NEW vectors against the
    * persisted codebooks (no retraining — centroids stay fixed between
    * rebuilds). Appended rows are bit-identical to what a full rebuild
    * with the same codebooks would produce. Same batch_id exactly-once
    * replay discipline as [[assignToIvfIndex]]. */
  def assignToPqIndex(newVectors: DataFrame, indexDir: String,
      appendBatchId: Option[Long] = None): DataFrame = {
    val spark = newVectors.sparkSession
    val (coarse, pq) = readPqCodebooks(spark, indexDir)
    val assigned =
      if (coarse.isEmpty || pq.forall(_.isEmpty))
        newVectors.select(col("vec_id"), lit(0).as("cell"),
          array_repeat(lit(0), PqM).as("codes"))
      else encodePq(
        newVectors.withColumn("qv", quantizeExpr(col("embedding"))), coarse, pq)
    appendBatchId.foreach { b =>
      assigned.withColumn("batch_id", lit(b))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(DedupQueries.currentGeneration(spark, s"$indexDir/assignments"))
    }
    assigned
  }

  /** Fold appended PQ assignment partitions into the base generation —
    * same generation-rollover write as [[compactIvfIndex]]; codebooks are
    * untouched (compaction is layout, retraining is [[buildPqIndex]]). */
  def compactPqIndex(spark: SparkSession, indexDir: String): Unit =
    DedupQueries.compactGeneration(spark, s"$indexDir/assignments",
      df => df.select(col("vec_id"), col("cell"), col("codes"))
        .dropDuplicates("vec_id", "cell", "codes"))

  // ---- Hybrid (lexical + vector) retrieval fusion ----

  /** Fusion depth per leg and the classic RRF dampening constant. */
  val FusionDepth = 20
  val RrfK = 60
  /** The designated query: terms [[TextQueries.SearchTerms]] on the lexical
    * leg; this vector's embedding on the vector leg (doc_id == vec_id in
    * the corpus, so both legs rank the same id space). */
  val HybridQueryVec = 0L

  /** Q83 — hybrid search with reciprocal-rank fusion: the lexical tf-idf
    * leg (q53's scoring) and the embedding leg (exact quantized dot vs the
    * [[HybridQueryVec]] query vector) each rank their [[FusionDepth]] best
    * documents; a document's fused score is the RRF sum
    * `floor(1e6/(RrfK+rank))` over the legs that returned it (Cormack et
    * al., SIGIR 2009 — the standard fusion for lexical+dense retrieval;
    * integer-scaled so the result is exact and hash-checkable). Plan shape:
    * each leg is a global top-k (TakeOrderedAndProject — never a global
    * window over the corpus-sized score set), ranks are then assigned by a
    * window over the BOUNDED FusionDepth-row result, and the fusion is a
    * full-outer join of two 20-row frames. At 100 TB each leg's scoring
    * stage is the member that scales (tf-idf's shuffle is token-pruned,
    * the vector leg composes with the persisted IVF/PQ index instead of
    * the exact scan used here); the fusion itself stays constant-size. A
    * missing leg reports rank 0 (absent), keeping the rank columns
    * non-null BIGINT on both engines.
    *
    * sf1.0 floor ruling (r15, benched alone min-of-3): 1.51 s vs DuckDB
    * 0.14 s. Two independent corpus passes (tf-idf explode+agg+top-k and
    * the quantized dot scan) each end in a TakeOrderedAndProject, then
    * constant-size windows/joins — i.e. the wall is two scan-limited
    * legs at the session's ~0.5 s/pass calibration (q09 ruling) plus the
    * lexical leg's token shuffle; no stage is corpus-quadratic or
    * unpruned. DuckDB clears both legs in one vectorized process. The
    * scale lever is already documented above: compose the vector leg
    * with the persisted IVF/PQ index. Floor. */
  def q83HybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val lexTop = TextQueries.lexicalScores(spark, dir)
      .orderBy(col("score_milli").desc, col("doc_id").asc)
      .limit(FusionDepth)
    val wl = Window.orderBy(col("score_milli").desc, col("doc_id").asc)
    val lex = lexTop // rank over the bounded top-k rows only
      .select(col("doc_id"), row_number().over(wl).cast("long").as("lex_rank"))
    val emb = quantized(spark, dir)
    val qvec = emb.filter(col("vec_id") === HybridQueryVec).select(col("qv").as("qa"))
    val vecTop = emb.filter(col("vec_id") =!= HybridQueryVec)
      .crossJoin(broadcast(qvec)) // 1-row broadcast: the query vector
      .select(col("vec_id").as("doc_id"),
        graft.functions.DotProductLong(col("qa"), col("qv")).as("dot"))
      .orderBy(col("dot").desc, col("doc_id").asc)
      .limit(FusionDepth)
    val wv = Window.orderBy(col("dot").desc, col("doc_id").asc)
    val vec = vecTop
      .select(col("doc_id"), row_number().over(wv).cast("long").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 DIV ($RrfK + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000 DIV ($RrfK + vec_rank)"), lit(0L)))
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"),
        col("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
  }

  private[graft] def topKScored(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    scored
      .select(col("query_id"), col("neighbor_id"), col("dot"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("dot"))
      .orderBy(col("query_id").asc, col("dot").desc, col("neighbor_id").asc)
  }

  /** Q45 — embedding near-duplicate pairs (the embedding-cosine member of
    * the dedup family): sign-LSH bucketing over the QUANTIZED integer
    * vectors (exact — a float-dot sign could flip on last-ulp between
    * engines), bucket equi-join, then keep pairs whose quantized dot
    * exceeds the threshold. Fully DuckDB-checkable because every step is
    * integer math and the plane signs are plan-time literals shared with
    * the oracle SQL. Same no-all-pairs shape as q23/q27. */
  val NearDupThreshold = 250000L // quantized dot ~ float dot x 10^6; 0.25 here

  private def intBucketColRange(from: Int, bits: Int): org.apache.spark.sql.Column =
    planeSignsRange(from, bits).foldLeft(lit(0)) { (acc, plane) =>
      val signs = plane.map(_.toLong)
      val dot = graft.functions.DotProductLong(col("qv"), typedLit(signs))
      acc * 2 + when(dot > 0, lit(1)).otherwise(lit(0))
    }

  private def intBucketColFor(bits: Int): org.apache.spark.sql.Column =
    intBucketColRange(0, bits)

  private def intBucketCol: org.apache.spark.sql.Column = intBucketColFor(LshBits)

  /** Multi-table sign-LSH ANN: L independent hash tables of `bits` planes
    * each (table t = absolute planes [t*bits, (t+1)*bits)); a candidate is
    * any corpus vector sharing ANY table's bucket with the query — the
    * OR-amplification that the minhash BANDING of q23 applies to sets,
    * applied to embeddings. The r5 sweep motivated this: single-table
    * recall collapses as bits rise on a non-duplicated corpus (0.48 at 4
    * bits -> 0.04 at 10), while tables recover it at the same per-table
    * selectivity — the production recall knob at 100 TB, where you raise
    * `bits` for executor-sized buckets and `tables` for recall. Plan shape
    * is one posexplode (L small ints per row) + the same bucket equi-join,
    * deduped per (query, neighbor) before scoring. */
  private[graft] def annLshMultiTableScored(spark: SparkSession, dir: String,
      bits: Int, tables: Int): DataFrame = {
    val emb = quantized(spark, dir)
    annLshMultiTableScoredFrom(emb, emb, bits, tables)
  }

  /** The multi-table LSH candidate stage over caller-supplied quantized
    * (vec_id, qv) frames. NOTE: feeding the pinned [[quantizedFor]] frame
    * as the corpus side was measured and rejected for q107 (sf1.0
    * 4.2 → 5.7 s — see the q107 scaladoc); every current caller passes the
    * lazy scan twice. The seam stays for constructed-frame specs. */
  private[graft] def annLshMultiTableScoredFrom(corpusEmb: DataFrame,
      queryEmb: DataFrame, bits: Int, tables: Int): DataFrame = {
    def buckets = array((0 until tables).map(t =>
      intBucketColRange(t * bits, bits)): _*)
    val corpus = corpusEmb.withColumn("buckets", buckets)
      .select(col("vec_id").as("neighbor_id"), col("qv").as("qb"),
        posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val probes = queryEmb.filter(col("vec_id") < QueryCount)
      .withColumn("buckets", buckets)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"),
        posexplode(col("buckets")).as(Seq("qtbl", "qbucket")))
    corpus
      .join(probes.hint("broadcast"), col("qtbl") === col("tbl") &&
        col("qbucket") === col("bucket") &&
        col("query_id") =!= col("neighbor_id"), "inner")
      // r17 (guide §2.3 shuffle fewer bytes): score BEFORE the dedup — the
      // dot is a pure function of (qa, qb), which are unique per
      // (query_id, neighbor_id), so rows are identical, but the dedup
      // exchange now carries 3 longs per candidate instead of two
      // 64-element vectors (the old shape aggregated first(qa)/first(qb)
      // through the shuffle). A candidate pair found by k of the L tables
      // pays k map-side dots instead of 1 — k ≤ 4 cheap codegen'd loops
      // against ~1 KB/row of shuffle traffic.
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.DotProductLong(col("qa"), col("qb")).as("dot"))
      .dropDuplicates("query_id", "neighbor_id")
  }

  private[graft] def annLshMultiTable(spark: SparkSession, dir: String,
      bits: Int, tables: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dot").desc, col("neighbor_id").asc)
    annLshMultiTableScored(spark, dir, bits, tables)
      .select(col("query_id"), col("neighbor_id"), col("dot"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= TopK)
      .select(col("query_id"), col("neighbor_id"), col("dot"))
      .orderBy(col("query_id").asc, col("dot").desc, col("neighbor_id").asc)
  }


  def q45EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantized(spark, dir).withColumn("bucket", intBucketCol)
    val l = emb.select(col("bucket").as("bucket_l"), col("vec_id").as("id_a"), col("qv").as("qa"))
    val r = emb.select(col("bucket").as("bucket_r"), col("vec_id").as("id_b"), col("qv").as("qb"))
    l.join(r, col("bucket_l") === col("bucket_r") && col("id_a") < col("id_b"), "inner")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
      .filter(col("dot") > NearDupThreshold)
      .select(col("id_a"), col("id_b"), col("dot"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Q61 — embedding near-dup over COLLAPSED unique vectors: group by the
    * exact quantized vector first (uid = min vec_id, cnt = multiplicity),
    * run the sign-LSH bucket join on UNIQUES only, and report each
    * near-dup pair once with pair_mult = cnt_a * cnt_b. On a duplicated
    * corpus this is the scalable form of q45: the 30x smoke measured q45's
    * pair-emitting join growing quadratically in the duplication factor
    * (89 s at 96.7% duplication) because every copy meets every copy in
    * its bucket — collapsing first makes bucket occupancy and the
    * candidate count a function of UNIQUE content, while the multiplicity
    * column preserves the full pair accounting (sum(pair_mult) + the
    * within-family C(cnt,2) pairs = q45's output, reconciled in
    * SimilaritySpec). The collapse itself is one exact hash aggregate on
    * the vector bytes — the same shuffle shape as q22's text dedup. */
  def q61NearDupUnique(spark: SparkSession, dir: String): DataFrame = {
    val uniq = quantized(spark, dir)
      .groupBy(col("qv"))
      .agg(min(col("vec_id")).as("uid"), count(lit(1)).as("cnt"))
      .withColumn("bucket", intBucketCol)
    val l = uniq.select(col("bucket").as("bucket_l"), col("uid").as("id_a"),
      col("qv").as("qa"), col("cnt").as("cnt_a"))
    val r = uniq.select(col("bucket").as("bucket_r"), col("uid").as("id_b"),
      col("qv").as("qb"), col("cnt").as("cnt_b"))
    l.join(r, col("bucket_l") === col("bucket_r") && col("id_a") < col("id_b"), "inner")
      .withColumn("dot", graft.functions.DotProductLong(col("qa"), col("qb")))
      .filter(col("dot") > NearDupThreshold)
      .select(col("id_a"), col("id_b"), col("dot"),
        (col("cnt_a") * col("cnt_b")).as("pair_mult"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** Q55 — int8 embedding quantization census: symmetric per-vector
    * quantization (q8_i = v_i * 127 / max|v|, the standard rowwise int8
    * compression a 100 TB embedding store runs to cut memory 4x), with the
    * reconstruction-error audit a pipeline needs before committing to the
    * compressed representation. All arithmetic is exact integers over the
    * milli-quantized vectors (truncating division matches DuckDB `//`), so
    * the census is hash-checkable; zero vectors are excluded identically on
    * both sides (division guard). Per label: vector count, total absolute
    * reconstruction error, and mean relative error in micro units —
    * rel_err_micro = sum|v - dequant(q8(v))| * 1e6 / sum|v|. */
  def q55QuantizeInt8(spark: SparkSession, dir: String): DataFrame =
    quantized(spark, dir)
      .withColumn("max_abs", expr(
        "aggregate(qv, 0L, (m, x) -> greatest(m, abs(x)))"))
      .filter(col("max_abs") > 0)
      .withColumn("abs_err", expr(
        "aggregate(transform(qv, x -> abs(x - (x * 127L DIV max_abs) * max_abs DIV 127L)), 0L, (s, e) -> s + e)"))
      .withColumn("abs_sum", expr(
        "aggregate(qv, 0L, (s, x) -> s + abs(x))"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(col("abs_err")).as("total_abs_err"),
        expr("CAST(sum(abs_err) * 1000000L DIV sum(abs_sum) AS BIGINT)")
          .as("rel_err_micro"))
      .orderBy(col("label").asc)

  /** Q65 — CROSS-MODAL semantic dedup: embedding-near-dup pairs whose TEXTS
    * differ — the duplicates exact/minhash dedup structurally cannot catch
    * (same meaning, different wording), which is why production curation
    * runs an embedding stage after the text stages. Joins both modalities
    * on the shared id (doc_id == vec_id in the testdata): sign-LSH bucket
    * candidates over the embeddings (q45's semantics), each side's
    * md5(text) and lang picked up through id-keyed joins, keeping pairs
    * with DIFFERENT text hashes. Null-text docs drop on both engines
    * identically (NULL <> x is NULL). All-integer scoring keeps it
    * hash-checkable. */
  def q65SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // Collapse-first (r5, after the 30x smoke caught the naive form at
    // 52 s): on a duplicated corpus, q45-then-filter materializes every
    // same-vector candidate pair (C(copies,2) per family) only to drop
    // them as same-text — 2.2M wasted pairs against 289k kept at 30x.
    // Instead: candidates over UNIQUE vectors (q61's collapse), the
    // same-text filter at the (uid, thash) GROUP level, and expansion
    // through id-only joins — the id pairs materialized are exactly the
    // output rows. Output is row-identical to the naive form (oracle
    // unchanged); SimilaritySpec pins the drop paths + a differential.
    val q = quantized(spark, dir)
    val uniq = q.groupBy(col("qv"))
      .agg(min(col("vec_id")).as("uid"), count(lit(1)).as("cnt"))
      .withColumn("bucket", intBucketCol)
    // unique-level candidates: cross-family shared-bucket pairs, plus the
    // self-pair of every multiplied family (identical vectors trivially
    // share their bucket; dot = <v,v>)
    val l = uniq.select(col("bucket").as("bl"), col("uid").as("ua"), col("qv").as("qa"))
    val r = uniq.select(col("bucket").as("br"), col("uid").as("ub"), col("qv").as("qb"))
    val cross = l.join(r, col("bl") === col("br") && col("ua") < col("ub"), "inner")
      .select(col("ua"), col("ub"),
        graft.functions.DotProductLong(col("qa"), col("qb")).as("dot"))
    val self = uniq.filter(col("cnt") > 1)
      .select(col("uid").as("ua"), col("uid").as("ub"),
        graft.functions.DotProductLong(col("qv"), col("qv")).as("dot"))
    val cand = cross.unionAll(self).filter(col("dot") > NearDupThreshold)
    semanticDedupExpand(spark, dir, q, uniq, cand)
  }

  /** The q65 tail shared by the sign-LSH and IVF-index candidate
    * generators: same-text group-level filter + id expansion. `cand` must
    * be (ua, ub, dot) unique-FAMILY pairs with ua <= ub (ua == ub only for
    * multiplied families) and dot already thresholded. */
  private def semanticDedupExpand(spark: SparkSession, dir: String,
      q: DataFrame, uniq: DataFrame, cand: DataFrame): DataFrame = {
    // members (id, uid, thash, lang): one bounded-width shuffle on the
    // 512-byte vector key to pick up uid, id-keyed doc join for the text
    // hash — everything past this point shuffles narrow columns only
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id").as("vec_id"), md5(col("text")).as("thash"), col("lang"))
    val m = q.select(col("vec_id"), col("qv"))
      .join(uniq.select(col("qv"), col("uid")), "qv")
      .join(docs, "vec_id")
      .select(col("vec_id").as("id"), col("uid"), col("thash"), col("lang"))
    // the same-text filter runs on (uid, thash) GROUPS — before expansion
    val gm = m.select(col("uid"), col("thash")).distinct()
    val gpairs = cand
      .join(gm.select(col("uid").as("ua"), col("thash").as("tha")), "ua")
      .join(gm.select(col("uid").as("ub"), col("thash").as("thb")), "ub")
      .filter(col("tha") =!= col("thb"))
    // expansion = output rows exactly; self-families orient ia < ib so
    // each unordered pair appears once, cross-families via least/greatest
    val ma = m.select(col("uid").as("ua"), col("thash").as("tha"),
      col("id").as("ia"), col("lang").as("la"))
    val mb = m.select(col("uid").as("ub"), col("thash").as("thb"),
      col("id").as("ib"), col("lang").as("lb"))
    gpairs.join(ma, Seq("ua", "tha")).join(mb, Seq("ub", "thb"))
      .filter(col("ua") =!= col("ub") || col("ia") < col("ib"))
      .select(
        least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        col("dot"),
        when(col("ia") < col("ib"), col("la")).otherwise(col("lb")).as("lang_a"),
        when(col("ia") < col("ib"), col("lb")).otherwise(col("la")).as("lang_b"))
      .withColumn("same_lang", col("lang_a") === col("lang_b"))
      .orderBy(col("id_a").asc, col("id_b").asc)
  }

  /** [[q65SemanticDedup]]'s candidate stage served from a PERSISTED IVF
    * index (VERDICT r5 #6 / r6 #2) instead of sign-LSH: the RecallSweep
    * measured IVF dominating sign-LSH at equal candidate budget (0.96 vs
    * 0.22 recall@5 on isotropic vectors), so a serving-shaped curation run
    * that already maintains an IVF index ([[buildIvfIndex]]) should draw
    * its semantic-dedup candidates from it rather than hashing planes.
    *
    * Candidate generation — symmetric multi-probe over unique families:
    *  - HOME side: each unique family's cell comes from the persisted
    *    assignment table (joined by the family's min vec_id — identical
    *    vectors share a cell by construction), NOT recomputed: reusing the
    *    batch assignment scan is the point of a persisted index;
    *  - PROBE side: each family's `probes` nearest cells from the
    *    persisted cells-row codebook (driver-collected, broadcast-sized —
    *    the same train-small/broadcast shape as q42);
    *  - a pair is a candidate when either member probes the other's home
    *    cell (both directions emitted by the equi-join, collapsed by
    *    dropDuplicates) — cell equi-join, never all-pairs, fan-out bounded
    *    by probes x cell occupancy.
    * The tail (exact integer dot threshold, same-text group filter, id
    * expansion) is IDENTICAL to q65's — output rows are row-compatible by
    * construction: any pair both generators surface carries the same
    * (dot, lang, same_lang) values, and every emitted pair is a TRUE
    * above-threshold cross-text pair (the dot filter is exact; candidate
    * generation only affects recall). SimilaritySpec pins recall >= the
    * sign-LSH form's against the brute-force truth set at sf0.001. */
  def semanticDedupFromIvfIndex(spark: SparkSession, dir: String,
      indexDir: String, probes: Int = IvfProbes): DataFrame = {
    import spark.implicits._
    val centroids = spark.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    val q = quantized(spark, dir)
    val uniq = q.groupBy(col("qv"))
      .agg(min(col("vec_id")).as("uid"), count(lit(1)).as("cnt"))
    val cand =
      if (centroids.isEmpty)
        // empty index (built on an empty corpus): no candidates, but keep
        // the tail so the output schema matches q65 exactly
        Seq.empty[(Long, Long, Long)].toDF("ua", "ub", "dot")
      else {
        val home = uniq
          .join(readIvfAssignments(spark, indexDir),
            uniq("uid") === col("vec_id"))
          .select(col("uid").as("hb"), col("qv").as("qb"), col("cell"))
        val probed = uniq
          .select(col("uid").as("pa"), col("qv"),
            explode(slice(sort_array(array(cellScores(centroids): _*)), 1,
              math.min(probes, centroids.length))).as("probe"))
          .select(col("pa"), col("qv").as("qa"), col("probe.cell").as("pcell"))
        val cross = probed
          .join(home, col("pcell") === col("cell") && col("pa") =!= col("hb"))
          .select(
            least(col("pa"), col("hb")).as("ua"),
            greatest(col("pa"), col("hb")).as("ub"),
            graft.functions.DotProductLong(col("qa"), col("qb")).as("dot"))
          .dropDuplicates("ua", "ub")
        val self = uniq.filter(col("cnt") > 1)
          .select(col("uid").as("ua"), col("uid").as("ub"),
            graft.functions.DotProductLong(col("qv"), col("qv")).as("dot"))
        cross.unionAll(self).filter(col("dot") > NearDupThreshold)
      }
    semanticDedupExpand(spark, dir, q, uniq, cand)
  }

  /** Brute-force q65 — the recall DENOMINATOR for the sweep tool and specs:
    * every unique-family pair scored exactly (theta join on uid order →
    * BNLJ by construction, declared baseline like q26), then the identical
    * tail. Never the production path; candidates-by-bucket is the whole
    * point of q65/[[semanticDedupFromIvfIndex]]. */
  private[graft] def semanticDedupBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val uniq = q.groupBy(col("qv"))
      .agg(min(col("vec_id")).as("uid"), count(lit(1)).as("cnt"))
    val l = uniq.select(col("uid").as("ua"), col("qv").as("qa"))
    val r = uniq.select(col("uid").as("ub"), col("qv").as("qb"))
    val cross = l.join(r, col("ua") < col("ub"))
      .select(col("ua"), col("ub"),
        graft.functions.DotProductLong(col("qa"), col("qb")).as("dot"))
    val self = uniq.filter(col("cnt") > 1)
      .select(col("uid").as("ua"), col("uid").as("ub"),
        graft.functions.DotProductLong(col("qv"), col("qv")).as("dot"))
    semanticDedupExpand(spark, dir, q, uniq,
      cross.unionAll(self).filter(col("dot") > NearDupThreshold))
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q26_knn_exact" -> (q26KnnExact _),
    "q27_ann_lsh" -> (q27AnnLsh _),
    "q28_cosine_label_stats" -> (q28CosineLabelStats _),
    "q42_ann_ivf" -> (q42IvfAnn _),
    "q82_ann_ivfpq" -> (q82IvfPqAnn _),
    "q107_ann_recall" -> (q107AnnRecall _),
    "q114_ivf_balance" -> (q114IvfBalance _),
    "q83_hybrid_search" -> (q83HybridSearch _),
    "q45_dedup_embedding" -> (q45EmbeddingNearDup _),
    "q55_quantize_int8" -> (q55QuantizeInt8 _),
    "q61_near_dup_unique" -> (q61NearDupUnique _),
    "q65_semantic_dedup" -> (q65SemanticDedup _),
    "q117_srp_audit" -> (q117SrpAudit _),
  )

  /** The q117 oracle: the same absolute plane signs as SQL literals, the
    * same sign fold (ties → 0), bit_count over xor, q28's exact cosine. */
  private def q117OracleSql: String = {
    val sigFold = planeSqlLiteralsRange(0, SrpPlanes)
      .map(lits =>
        s"(CASE WHEN list_sum(list_transform(range($Dims), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)")
      .foldLeft("0")((acc, bit) => s"(($acc) * 2 + $bit)")
    s"""WITH q AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
       |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
       |n AS (SELECT vec_id, v,
       |  CAST(list_sum(list_transform(range($Dims), i -> v[i+1]*v[i+1])) AS BIGINT) AS n2
       |  FROM q WHERE vec_id < $SrpSample),
       |sb AS (SELECT vec_id, v, n2, $sigFold AS sig FROM n WHERE n2 > 0),
       |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |   CAST(list_sum(list_transform(range($Dims), i -> a.v[i+1]*b.v[i+1])) AS BIGINT) AS dot,
       |   a.n2 AS na2, b.n2 AS nb2, a.sig AS sa, b.sig AS sbb
       |  FROM sb a JOIN sb b ON a.vec_id < b.vec_id),
       |e AS (SELECT CAST(floor(CAST(dot AS DOUBLE)/(sqrt(CAST(na2 AS DOUBLE))*sqrt(CAST(nb2 AS DOUBLE)))*1000000.0) AS BIGINT) AS cos_micro,
       |   ($SrpPlanes - bit_count(xor(sa, sbb))) * 1000 // $SrpPlanes AS est_milli FROM p)
       |SELECT CAST((cos_micro + 1000000) // 200000 AS BIGINT) AS decile,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(est_milli) // COUNT(*) AS BIGINT) AS avg_match_milli,
       |  CAST(SUM(cos_micro) // COUNT(*) AS BIGINT) AS avg_cos_micro
       |FROM e GROUP BY decile ORDER BY decile NULLS FIRST""".stripMargin
  }

  /** The sign-LSH plane literals rendered as SQL BIGINT arrays, so the
    * oracle buckets identically to the engine (integer math throughout). */
  private def planeSqlLiterals: Seq[String] =
    planeSignsRange(0, LshBits).map(p => p.map(_.toLong).mkString("[", ", ", "]"))

  /** Plane literals for an absolute range — the multi-table oracle's twin
    * of [[intBucketColRange]] (table t = planes [t·bits, (t+1)·bits)). */
  private def planeSqlLiteralsRange(from: Int, n: Int): Seq[String] =
    planeSignsRange(from, n).map(p => p.map(_.toLong).mkString("[", ", ", "]"))

  /** The q107 oracle (r12: all three serving families): the q82 CTE chain
    * verbatim (coarse IVF + PQ + re-rank, exposing `corpus`/`probes`/`r`),
    * the multi-table LSH chain (per-table bucket folds over the SAME
    * absolute plane ranges as [[intBucketColRange]], OR-join on any shared
    * table bucket, exact dot, top-k), the exact denominator, and one
    * recall aggregate per family UNION ALL'd. */
  private def q107OracleSql: String = {
    val tableBuckets = (0 until RecallLshTables).map { t =>
      planeSqlLiteralsRange(t * LshBits, LshBits).map { lits =>
        s"(CASE WHEN list_sum(list_transform(range($Dims), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)"
      }.reduce((a, b) => s"($a * 2 + $b)")
    }
    val tbCols = tableBuckets.zipWithIndex
      .map { case (e, t) => s"$e AS tb$t" }.mkString(",\n    ")
    val orCond = (0 until RecallLshTables)
      .map(t => s"p.tb$t = c.tb$t").mkString(" OR ")
    def leg(family: String, t: String) =
      s"""SELECT '$family' AS family, e.query_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
         |  CAST(COALESCE(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_hit,
         |  CAST(COALESCE(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END), 0) * 1000 // COUNT(*) AS BIGINT) AS recall_milli
         |FROM ex e LEFT JOIN $t i ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
         |GROUP BY e.query_id""".stripMargin
    s"""WITH $q82Ctes,
       |ivf_s AS (SELECT p.query_id, c.neighbor_id,
       |    CAST(list_sum(list_transform(range($Dims), i -> p.qa[i+1] * c.qb[i+1])) AS BIGINT) AS dot
       |  FROM probes p JOIN corpus c ON p.probe_cell = c.cell AND p.query_id <> c.neighbor_id),
       |ivf_r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn FROM ivf_s),
       |ivf AS (SELECT query_id, neighbor_id FROM ivf_r WHERE rn <= $TopK),
       |pq AS (SELECT query_id, neighbor_id FROM r WHERE rn <= $TopK),
       |lshb AS (SELECT vec_id, v,
       |    $tbCols
       |  FROM q),
       |lshcand AS (SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM lshb p JOIN lshb c ON p.vec_id < $QueryCount AND p.vec_id <> c.vec_id
       |    AND ($orCond)),
       |lshs AS (SELECT l.query_id, l.neighbor_id,
       |    CAST(list_sum(list_transform(range($Dims), i -> a.v[i+1] * b.v[i+1])) AS BIGINT) AS dot
       |  FROM lshcand l JOIN q a ON a.vec_id = l.query_id JOIN q b ON b.vec_id = l.neighbor_id),
       |lshr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn FROM lshs),
       |lsh AS (SELECT query_id, neighbor_id FROM lshr WHERE rn <= $TopK),
       |ex_s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range($Dims), i -> a.v[i+1] * b.v[i+1])) AS BIGINT) AS dot
       |  FROM q a JOIN q b ON a.vec_id < $QueryCount AND a.vec_id <> b.vec_id),
       |ex_r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn FROM ex_s),
       |ex AS (SELECT query_id, neighbor_id FROM ex_r WHERE rn <= $TopK)
       |SELECT family, query_id, n_exact, n_hit, recall_milli FROM (
       |${leg("ivf", "ivf")}
       |UNION ALL
       |${leg("ivfpq", "pq")}
       |UNION ALL
       |${leg("lsh", "lsh")}
       |) ORDER BY family NULLS FIRST, query_id NULLS FIRST""".stripMargin
  }

  /** Shared coarse-IVF oracle CTE chain (quantize -> seed -> one Lloyd
    * step -> final assignment ranked per vector) — the common prefix of
    * the q42 and q82 oracles, factored so the two cannot drift apart.
    * Exposes `q` (quantized corpus), `corpus` (vector + assigned cell) and
    * `probes` (query vector x its $IvfProbes nearest cells). */
  private def coarseIvfSql: String =
    s"""q AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
       |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
       |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
       |          FROM (SELECT * FROM q ORDER BY vec_id LIMIT $IvfCells)),
       |a0 AS (SELECT q.vec_id, q.v, s.cell,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      (list_sum(list_transform(range($Dims), i -> s.v[i+1] * s.v[i+1])) -
       |       2 * list_sum(list_transform(range($Dims), i -> q.v[i+1] * s.v[i+1]))) ASC,
       |      s.cell ASC) AS rn
       |  FROM q CROSS JOIN seeds s),
       |assign0 AS (SELECT vec_id, v, cell FROM a0 WHERE rn = 1),
       |cd AS (SELECT cell, i, CAST(SUM(v[i+1]) // COUNT(*) AS BIGINT) AS c
       |       FROM assign0 CROSS JOIN (SELECT unnest(range($Dims)) AS i) t GROUP BY cell, i),
       |centv AS (SELECT cell, list(c ORDER BY i) AS v FROM cd GROUP BY cell),
       |a1 AS (SELECT q.vec_id, q.v, t.cell,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |      (list_sum(list_transform(range($Dims), i -> t.v[i+1] * t.v[i+1])) -
       |       2 * list_sum(list_transform(range($Dims), i -> q.v[i+1] * t.v[i+1]))) ASC,
       |      t.cell ASC) AS rn
       |  FROM q CROSS JOIN centv t),
       |corpus AS (SELECT vec_id AS neighbor_id, v AS qb, cell FROM a1 WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, v AS qa, cell AS probe_cell
       |           FROM a1 WHERE vec_id < $QueryCount AND rn <= $IvfProbes)""".stripMargin

  /** The q82 oracle: the coarse prefix plus, PER SUBSPACE m (CTEs generated
    * in a Scala loop so all $PqM blocks are textually identical up to the
    * dim offset), PQ seeding / one Lloyd step / encoding, then ADC scoring
    * through per-m joins on the candidate's code, the ADC shortlist, and
    * the exact re-rank. Stage-for-stage the same math as [[q82IvfPqAnn]],
    * in exact integers. */
  private def q82OracleSql: String =
    s"""WITH $q82Ctes
       |SELECT query_id, neighbor_id, dot, adc_dot FROM r WHERE rn <= $TopK
       |ORDER BY query_id NULLS FIRST, dot DESC, neighbor_id NULLS FIRST""".stripMargin

  /** The q82 CTE chain WITHOUT the final select (exposes `r`, ranked
    * re-ranked candidates) — shared verbatim by the q82 oracle and the
    * q107 recall audit's ivfpq leg, so the two cannot drift. */
  private def q82Ctes: String = {
    val subBlocks = (0 until PqM).map { m =>
      val off = m * PqSubDim
      s"""pseeds$m AS (SELECT code, list_transform(range($PqSubDim), i -> v[i+1+$off]) AS sv FROM pseeds),
         |pa$m AS (SELECT q.vec_id, q.v, s.code,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      (list_sum(list_transform(range($PqSubDim), i -> s.sv[i+1] * s.sv[i+1])) -
         |       2 * list_sum(list_transform(range($PqSubDim), i -> q.v[i+1+$off] * s.sv[i+1]))) ASC,
         |      s.code ASC) AS rn
         |  FROM q CROSS JOIN pseeds$m s),
         |pas$m AS (SELECT vec_id, v, code FROM pa$m WHERE rn = 1),
         |pcd$m AS (SELECT code, i, CAST(SUM(v[i+1+$off]) // COUNT(*) AS BIGINT) AS c
         |          FROM pas$m CROSS JOIN (SELECT unnest(range($PqSubDim)) AS i) t GROUP BY code, i),
         |pcent$m AS (SELECT code, list(c ORDER BY i) AS cv FROM pcd$m GROUP BY code),
         |pe$m AS (SELECT q.vec_id, t.code,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |      (list_sum(list_transform(range($PqSubDim), i -> t.cv[i+1] * t.cv[i+1])) -
         |       2 * list_sum(list_transform(range($PqSubDim), i -> q.v[i+1+$off] * t.cv[i+1]))) ASC,
         |      t.code ASC) AS rn
         |  FROM q CROSS JOIN pcent$m t),
         |pcode$m AS (SELECT vec_id, code FROM pe$m WHERE rn = 1)""".stripMargin
    }
    val adcJoins = (0 until PqM).map { m =>
      s"""  JOIN pcode$m k$m ON k$m.vec_id = cand.neighbor_id
         |  JOIN pcent$m t$m ON t$m.code = k$m.code""".stripMargin
    }
    val adcTerms = (0 until PqM).map { m =>
      val off = m * PqSubDim
      s"list_sum(list_transform(range($PqSubDim), i -> cand.qa[i+1+$off] * t$m.cv[i+1]))"
    }
    s"""$coarseIvfSql,
       |pseeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
       |           FROM (SELECT * FROM q ORDER BY vec_id LIMIT $PqK)),
       |${subBlocks.mkString(",\n")},
       |cand AS (SELECT p.query_id, p.qa, c.neighbor_id
       |         FROM probes p JOIN corpus c ON p.probe_cell = c.cell AND p.query_id <> c.neighbor_id),
       |scored AS (SELECT cand.query_id, cand.neighbor_id,
       |    CAST(${adcTerms.mkString(" + ")} AS BIGINT) AS adc_dot
       |  FROM cand
       |${adcJoins.mkString("\n")}),
       |shortr AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dot DESC, neighbor_id) AS rn
       |           FROM scored),
       |short AS (SELECT query_id, neighbor_id, adc_dot FROM shortr WHERE rn <= ${PqRerank * TopK}),
       |rr AS (SELECT s.query_id, s.neighbor_id, s.adc_dot,
       |    CAST(list_sum(list_transform(range($Dims), i -> qq.v[i+1] * c.qb[i+1])) AS BIGINT) AS dot
       |  FROM short s
       |  JOIN q qq ON qq.vec_id = s.query_id
       |  JOIN corpus c ON c.neighbor_id = s.neighbor_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
       |      FROM rr)""".stripMargin
  }

  /** Oracles: q26/q28/q45 are fully hash-checkable (exact integer dots;
    * q28's cosine additionally relies on IEEE-correctly-rounded sqrt/mul/div
    * over exact-integer inputs being bit-identical across engines, then
    * FLOOR-quantizes before any summation); q27/q42 are rows-only (LSH/IVF
    * probe semantics are Spark-side, pinned by SimilaritySpec). */
  val oracle: Map[String, String] = Map(
    "q117_srp_audit" -> q117OracleSql,
    "q55_quantize_int8" ->
      """WITH q AS (SELECT vec_id, label,
        |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
        |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
        |m AS (SELECT vec_id, label, v,
        |    list_max(list_transform(v, x -> abs(x))) AS max_abs FROM q),
        |f AS (SELECT label,
        |    CAST(list_sum(list_transform(v, x -> abs(x - ((x * 127 // max_abs) * max_abs) // 127))) AS BIGINT) AS abs_err,
        |    CAST(list_sum(list_transform(v, x -> abs(x))) AS BIGINT) AS abs_sum
        |  FROM m WHERE max_abs > 0)
        |SELECT label, COUNT(*) AS n_vecs, CAST(SUM(abs_err) AS BIGINT) AS total_abs_err,
        |  CAST((SUM(abs_err) * 1000000) // SUM(abs_sum) AS BIGINT) AS rel_err_micro
        |FROM f GROUP BY label ORDER BY label NULLS FIRST""".stripMargin,
    "q27_ann_lsh" -> {
      val bucketTerms = planeSqlLiterals.map { lits =>
        s"(CASE WHEN list_sum(list_transform(range(64), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)"
      }
      val bucket = bucketTerms.reduce((a, b) => s"($a * 2 + $b)")
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM q),
         |probes AS (SELECT vec_id AS query_id, v AS qa,
         |    unnest([bucket] || list_transform(range($LshBits), i -> xor(bucket, 1 << i))) AS probe
         |  FROM b WHERE vec_id < $QueryCount),
         |scored AS (SELECT p.query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(range(64), i -> p.qa[i+1] * c.v[i+1])) AS BIGINT) AS dot
         |  FROM probes p JOIN b c ON p.probe = c.bucket AND p.query_id <> c.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
         |      FROM scored)
         |SELECT query_id, neighbor_id, dot FROM r WHERE rn <= $TopK
         |ORDER BY query_id NULLS FIRST, dot DESC, neighbor_id NULLS FIRST""".stripMargin
    },
    "q42_ann_ivf" ->
      s"""WITH $coarseIvfSql,
         |scored AS (SELECT p.query_id, c.neighbor_id,
         |    CAST(list_sum(list_transform(range($Dims), i -> p.qa[i+1] * c.qb[i+1])) AS BIGINT) AS dot
         |  FROM probes p JOIN corpus c ON p.probe_cell = c.cell AND p.query_id <> c.neighbor_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn
         |      FROM scored)
         |SELECT query_id, neighbor_id, dot FROM r WHERE rn <= $TopK
         |ORDER BY query_id NULLS FIRST, dot DESC, neighbor_id NULLS FIRST""".stripMargin,
    "q82_ann_ivfpq" -> q82OracleSql,
    "q107_ann_recall" -> q107OracleSql,
    "q114_ivf_balance" ->
      s"""WITH $coarseIvfSql
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(COUNT(*) * 1000 // (SELECT COUNT(*) FROM corpus) AS BIGINT) AS share_milli
         |FROM corpus GROUP BY cell ORDER BY cell NULLS FIRST""".stripMargin,
    "q83_hybrid_search" ->
      s"""WITH ${TextQueries.lexicalSqlCtes},
         |lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id) AS BIGINT) AS lex_rank
         |        FROM (SELECT * FROM lexall ORDER BY score_milli DESC, doc_id LIMIT $FusionDepth)),
         |q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |qa AS (SELECT v FROM q WHERE vec_id = $HybridQueryVec),
         |vecall AS (SELECT q.vec_id AS doc_id,
         |    CAST(list_sum(list_transform(range($Dims), i -> q.v[i+1] * qa.v[i+1])) AS BIGINT) AS dot
         |  FROM q, qa WHERE q.vec_id <> $HybridQueryVec),
         |vec AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY dot DESC, doc_id) AS BIGINT) AS vec_rank
         |        FROM (SELECT * FROM vecall ORDER BY dot DESC, doc_id LIMIT $FusionDepth)),
         |f AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank
         |      FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT doc_id,
         |  CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
         |  CAST(COALESCE(vec_rank, 0) AS BIGINT) AS vec_rank,
         |  CAST(COALESCE(1000000 // ($RrfK + lex_rank), 0) +
         |       COALESCE(1000000 // ($RrfK + vec_rank), 0) AS BIGINT) AS rrf_micro
         |FROM f ORDER BY rrf_micro DESC, doc_id""".stripMargin,
    "q28_cosine_label_stats" ->
      s"""WITH q0 AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE vec_id < 100 AND len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |q AS (SELECT * FROM q0
         |  WHERE list_sum(list_transform(range(64), i -> v[i+1] * v[i+1])) > 0),
         |p AS (SELECT a.label AS label_a, b.label AS label_b,
         |    CAST(FLOOR(CAST(list_sum(list_transform(range(64), i -> a.v[i+1] * b.v[i+1])) AS DOUBLE) /
         |      (sqrt(CAST(list_sum(list_transform(range(64), i -> a.v[i+1] * a.v[i+1])) AS DOUBLE)) *
         |       sqrt(CAST(list_sum(list_transform(range(64), i -> b.v[i+1] * b.v[i+1])) AS DOUBLE))) *
         |      1000000) AS BIGINT) AS cos_micro
         |  FROM q a JOIN q b ON a.vec_id < b.vec_id)
         |SELECT (label_a = label_b) AS same_label, COUNT(*) AS n_pairs,
         |  CAST(SUM(cos_micro) AS BIGINT) AS sum_cos_micro,
         |  ROUND(CAST(SUM(cos_micro) AS DOUBLE) / COUNT(*) / 1000000, 3) AS avg_cos
         |FROM p GROUP BY 1 ORDER BY same_label NULLS FIRST""".stripMargin,
    "q45_dedup_embedding" -> {
      val bucketTerms = planeSqlLiterals.map { lits =>
        s"(CASE WHEN list_sum(list_transform(range(64), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)"
      }
      val bucket = bucketTerms.reduce((a, b) => s"($a * 2 + $b)")
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM q)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |  CAST(list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) AS BIGINT) AS dot
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) > $NearDupThreshold
         |ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""".stripMargin
    },
    "q61_near_dup_unique" -> {
      val bucketTerms = planeSqlLiterals.map { lits =>
        s"(CASE WHEN list_sum(list_transform(range(64), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)"
      }
      val bucket = bucketTerms.reduce((a, b) => s"($a * 2 + $b)")
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |u AS (SELECT v, MIN(vec_id) AS uid, COUNT(*) AS cnt FROM q GROUP BY v),
         |b AS (SELECT uid, v, cnt, $bucket AS bucket FROM u)
         |SELECT x.uid AS id_a, y.uid AS id_b,
         |  CAST(list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) AS BIGINT) AS dot,
         |  CAST(x.cnt * y.cnt AS BIGINT) AS pair_mult
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.uid < y.uid
         |WHERE list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) > $NearDupThreshold
         |ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""".stripMargin
    },
    "q65_semantic_dedup" -> {
      val bucketTerms = planeSqlLiterals.map { lits =>
        s"(CASE WHEN list_sum(list_transform(range(64), i -> v[i+1] * ($lits)[i+1])) > 0 THEN 1 ELSE 0 END)"
      }
      val bucket = bucketTerms.reduce((a, b) => s"($a * 2 + $b)")
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |b AS (SELECT vec_id, v, $bucket AS bucket FROM q),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |    CAST(list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) AS BIGINT) AS dot
         |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |  WHERE list_sum(list_transform(range(64), i -> x.v[i+1] * y.v[i+1])) > $NearDupThreshold),
         |d AS (SELECT doc_id, md5(text) AS thash, lang FROM documents)
         |SELECT p.id_a, p.id_b, p.dot, da.lang AS lang_a, db.lang AS lang_b,
         |  (da.lang = db.lang) AS same_lang
         |FROM p JOIN d da ON da.doc_id = p.id_a JOIN d db ON db.doc_id = p.id_b
         |WHERE da.thash <> db.thash
         |ORDER BY id_a NULLS FIRST, id_b NULLS FIRST""".stripMargin
    },
    "q26_knn_exact" ->
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(x::DOUBLE * 1000, 0) AS BIGINT)) AS v
         |  FROM embeddings WHERE len(list_filter(embedding, x -> isnan(x) OR isinf(x))) = 0),
         |j AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |        CAST(list_sum(list_transform(range(len(a.v)), i -> a.v[i+1] * b.v[i+1])) AS BIGINT) AS dot
         |      FROM q a JOIN q b ON a.vec_id < $QueryCount AND a.vec_id <> b.vec_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rn FROM j)
         |SELECT query_id, neighbor_id, dot FROM r WHERE rn <= $TopK
         |ORDER BY query_id NULLS FIRST, dot DESC, neighbor_id NULLS FIRST""".stripMargin,
  )
}
