package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph analytics over the crawl's domain graph — the authority-
  * scoring stage a web-corpus pipeline runs beside dedup and quality
  * (domain ranks feed crawl prioritization and per-domain quality priors,
  * e.g. Common Crawl's harmonic-centrality rankings). Complements q56's
  * connected components: that resolves IDENTITY clusters, this scores
  * IMPORTANCE on the directed graph.
  *
  * All arithmetic is scaled-integer (micro-ranks, truncating DIV), so
  * partial-aggregation order cannot change a single bit — the same
  * discipline that makes q35/q44/q87 oracle-checkable. PageRank here is
  * the classic damped power iteration (Page et al. 1999) with a FIXED
  * iteration count, unrolled identically in the DuckDB oracle's CTE
  * chain.
  *
  * Scale shape: per iteration, one equi-join edges⋈ranks on src (shuffle
  * on integer keys; at web scale both sides are big and this is the
  * canonical shuffle join), one map-side-partial groupBy(dst), one
  * node-table rejoin. Edges are materialized ONCE via
  * [[Materialize.materialize]] (the q56 discipline — executor-local by
  * default, RELIABLE checkpoint files when `spark.graft.checkpointDir`
  * is set, so executor loss mid-iteration is restartable on a cluster;
  * VERDICT r8 #3) so the corpus is scanned once, not once per iteration,
  * and each iteration's ranks are materialized the same way to keep the
  * plan depth constant. No driver-side collect anywhere.
  *
  * Variant note (ADVICE r8): this is the NO-DANGLING-REDISTRIBUTION form
  * of the damped iteration — a sink node (no out-edges) contributes
  * nothing back to the graph, so total rank mass leaks its share instead
  * of being spread uniformly (the standard dangling-mass term). Both
  * engines and GraphSpec's mass bound encode this variant; on graphs
  * with sinks the conserved-mass property of classic PageRank does NOT
  * hold here by design.
  */
object GraphQueries {

  private[operators] val PrIters  = 5
  private[operators] val DampPct  = 85        // damping factor, percent
  private[operators] val Scale    = 1000000L  // total rank mass, micro units
  private val BasePerN: Long = Scale * (100 - DampPct) / 100  // (1-d) mass

  /** Edge enrichment: each doc contributes one directed domain edge whose
    * endpoints mix three coprime residues of doc_id (23/19/11), giving a
    * reproducible graph with genuinely varied in/out-degrees (a pure
    * doc_id%23 polynomial would collapse to a functional graph — i² mod 23
    * depends only on i mod 23). Self-loops dropped, edges distinct. */
  private def edgesOf(docs: DataFrame): DataFrame =
    docs.select(
      (col("doc_id") % 23).as("src"),
      (((col("doc_id") % 19) * (col("doc_id") % 23) + col("doc_id") % 11) % 23).as("dst"))
      .distinct()
      .filter(col("src") =!= col("dst"))

  /** The damped-power-iteration core over ANY pre-materialized (src, dst)
    * Long-keyed edge frame — shared verbatim by q95 (the %23 oracle graph)
    * and [[graft.tools.PageRankSmoke]] (the real sf1.0 doc↔domain graph,
    * |V| ≥ 10⁴), so the shuffle-scale smoke exercises the exact code path
    * the catalog entry ships (VERDICT r8 #4). Per iteration: edges⋈ranks
    * equi-join on src, map-side-partial groupBy(dst), node-table rejoin;
    * each iteration's ranks go through [[Materialize.materialize]] to keep
    * plan depth constant and be cluster-restartable. Returns one (node, r)
    * row per node. Caller materializes `edges` (both consumers also derive
    * degrees from it).
    *
    * `scale` is the total rank mass in integer units. Truncating DIVs lose
    * up to ~1 unit per node per truncation site, so granularity must suit
    * |V|: q95's oracle-pinned 10^6 micro is exact-reproducible but loses
    * ~2% mass per iteration at |V| ~ 2.5×10^4 (the r9 smoke measured it);
    * at real graph sizes pass a finer scale (the smoke uses 10^12 — still
    * Long-safe: contrib sums are bounded by the scale itself). */
  private[graft] def powerIteration(edges: DataFrame, iters: Int,
      scale: Long = Scale): DataFrame = {
    val basePerN = scale * (100 - DampPct) / 100
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val cnt = nodes.agg(count(lit(1)).as("nn"))

    var ranks = Materialize.materialize(nodes.crossJoin(broadcast(cnt))
      .select(col("node"), expr(s"CAST($scale DIV nn AS BIGINT)").as("r")))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), expr("r DIV outdeg").as("contrib"))
      val sums = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("c"))
      ranks = Materialize.materialize(nodes.crossJoin(broadcast(cnt))
        .join(sums, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST($basePerN DIV nn + $DampPct * COALESCE(c, 0L) DIV 100 AS BIGINT)").as("r")))
    }
    ranks
  }

  /** Q95 — damped PageRank over the domain link graph, [[PrIters]] exact
    * integer power iterations; emits each domain's micro-rank and its
    * in/out-degree, hubs first.
    *
    * r16 optimization (guide §1.2 step 1 — fix the distributed algorithm
    * before anything else): the %23 edge space is BOUNDED BY CONSTRUCTION
    * — src, dst ∈ (−23, 23) for any doc_id — so after the one distributed
    * pass (the distinct edge census, ≤ 23·22 rows at ANY corpus scale)
    * the whole graph is a codebook, not a corpus relation. The previous
    * form ran [[powerIteration]]'s 5 distributed join+aggregate rounds,
    * each through a [[Materialize]] checkpoint, to move ≤ 23 longs per
    * round — exactly the shape the q120/q125 bounded-collect rulings
    * retire (a checkpoint round-trip per round to move kilobytes). The
    * iterations now run driver-side over the collected edge set with the
    * SAME nonnegative integer arithmetic (truncating division == SQL DIV
    * on nonnegative operands), so every rank is bit-identical; the oracle
    * and its unrolled CTE chain are untouched. Measured at sf0.1
    * (shared-session bench, this host): 2.08 → 0.35 s; plan goes from
    * 6 checkpoints + 5 join rounds to ONE distinct shuffle + a 23-row
    * local sort (plans/r16/q95_pagerank_{before,after}.txt).
    * [[powerIteration]] itself is unchanged and stays the REAL-graph
    * path (tools/PageRankSmoke drives it over the |V| ≥ 10⁴ doc↔domain
    * graph, where the distributed loop is the only shape that scales). */
  def q95PageRank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull).select("doc_id")
    // the ONE distributed pass: distinct (src, dst) over the corpus
    val edges = edgesOf(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val nn = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val indeg = edges.groupBy(_._2).map { case (d, es) => d -> es.length.toLong }
    // Scale DIV nn, r DIV outdeg, basePerN DIV nn + DampPct*c DIV 100 —
    // all operands nonnegative, so Scala / is the executors' (and the
    // oracle's) truncating DIV, bit for bit
    var r: Map[Long, Long] = nodes.map(_ -> Scale / nn).toMap
    for (_ <- 1 to PrIters) {
      val sums = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (s, d) =>
        sums(d) = sums.getOrElse(d, 0L) + r(s) / outdeg(s) }
      r = nodes.map(n =>
        n -> (BasePerN / nn + DampPct * sums.getOrElse(n, 0L) / 100)).toMap
    }
    nodes.toSeq
      .map(n => (s"s$n.example.org", r(n),
        outdeg.getOrElse(n, 0L), indeg.getOrElse(n, 0L)))
      .toDF("domain", "rank_micro", "out_degree", "in_degree")
      .orderBy(col("rank_micro").desc, col("domain").asc)
  }

  // ---- catalog wiring ----

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q95_pagerank" -> (q95PageRank _),
  )

  /** The oracle unrolls the same [[PrIters]] integer iterations as CTE
    * stages — generated by the same loop so the two sides cannot drift. */
  val oracle: Map[String, String] = {
    val head =
      s"""d0 AS (SELECT doc_id FROM documents WHERE text IS NOT NULL),
        |e0 AS (SELECT DISTINCT doc_id % 23 AS src, ((doc_id % 19) * (doc_id % 23) + doc_id % 11) % 23 AS dst FROM d0),
        |e AS (SELECT src, dst FROM e0 WHERE src <> dst),
        |n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src),
        |cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM n),
        |r0 AS (SELECT node, CAST($Scale // nn AS BIGINT) AS r FROM n, cnt)""".stripMargin
    val steps = (0 until PrIters).map { k =>
      s"""c$k AS (SELECT e.dst AS node, r$k.r // deg.outdeg AS contrib
         |  FROM e JOIN r$k ON e.src = r$k.node JOIN deg ON e.src = deg.src),
         |s$k AS (SELECT node, SUM(contrib) AS c FROM c$k GROUP BY node),
         |r${k + 1} AS (SELECT n.node, CAST($BasePerN // cnt.nn + $DampPct * COALESCE(s$k.c, 0) // 100 AS BIGINT) AS r
         |  FROM n CROSS JOIN cnt LEFT JOIN s$k ON n.node = s$k.node)""".stripMargin
    }
    val sql =
      s"""WITH ${(head +: steps).mkString(",\n")},
         |indeg AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS ind FROM e GROUP BY dst)
         |SELECT concat('s', CAST(n.node AS VARCHAR), '.example.org') AS domain,
         |  r$PrIters.r AS rank_micro,
         |  COALESCE(deg.outdeg, 0) AS out_degree,
         |  COALESCE(indeg.ind, 0) AS in_degree
         |FROM n JOIN r$PrIters ON n.node = r$PrIters.node
         |LEFT JOIN deg ON n.node = deg.src LEFT JOIN indeg ON n.node = indeg.dst
         |ORDER BY rank_micro DESC, domain""".stripMargin
    Map("q95_pagerank" -> sql)
  }
}
