package graft.tools

import graft.Sessions
import graft.operators.{GraphQueries, Materialize, Tables, WebCurationQueries}
import org.apache.spark.sql.functions._

/** Shuffle-scale PageRank smoke (dev tool; VERDICT r8 #4): q95's oracle
  * graph is doc_id % 23 — 23 nodes — so before this tool the power
  * iteration had never run at a size where its joins actually shuffle.
  * Here the SAME [[GraphQueries.powerIteration]] code path runs over the
  * real corpus's doc↔domain bipartite graph at the given SF:
  *
  *   - nodes: every doc with ≥1 URL (id 2·doc_id — even) and every domain
  *     (id xxhash64(domain)|1 — odd, so disjoint from doc ids; ADVICE r9:
  *     the doubling applies to doc ids only, the domain id just sets the
  *     low bit);
  *   - edges: doc→domain for each distinct (doc, domain) pair, PLUS the
  *     reverse domain→doc edge, so no node is a sink (q95 is the
  *     no-dangling-redistribution variant; a one-directional bipartite
  *     graph would drain mass through the all-sink domain side and smoke
  *     only that drain).
  *
  * Reports |V|, |E|, per-iteration wall seconds (= one edges⋈ranks
  * shuffle join + one groupBy(dst) + node rejoin each), total rank mass
  * vs the 10^6-micro scale (conservation within truncation loss), and
  * the top-hub share — the numbers ROUND9_NOTES records.
  *
  * Usage: runMain graft.tools.PageRankSmoke [sfDir] [iters]
  */
object PageRankSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1.0")
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = Sessions.build("local[32]", 32, "graft-pagerank-smoke")

    val pairs = WebCurationQueries
      .docUrls(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("domain")).distinct()
    val fwd = pairs.select(
      (col("doc_id") * 2).as("src"),
      (xxhash64(col("domain")).bitwiseOR(1)).as("dst"))
    val edges = Materialize.materialize(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))

    val nEdges = edges.count()
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct().count()

    // fine-grained scale: 10^12 units so truncation loss stays relative-
    // negligible at |V| ~ 10^4..10^6 (q95's oracle-pinned 10^6 is too
    // coarse here — measured 19% cumulative loss at |V|=25k; see notes)
    val scale = 1000000000000L

    // timing: time k=1..iters cumulative runs (each re-derives from the
    // SAME materialized edges); the k-th minus (k-1)-th difference
    // approximates one iteration's join+agg cost, with warm-up noise on
    // the first entries
    val cum = (1 to iters).map { k =>
      val t0 = System.nanoTime()
      GraphQueries.powerIteration(edges, k, scale).select(sum(col("r"))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val ranks = GraphQueries.powerIteration(edges, iters, scale)
    val Array(mass, topRank) = ranks
      .select(sum(col("r")), max(col("r"))).collect()(0) match {
        case r => Array(r.getLong(0), r.getLong(1))
      }
    println(
      f"""{"metric":"pagerank_smoke","sf_dir":"$sfDir","n_nodes":$nNodes,"n_edges":$nEdges,"iters":$iters,"cum_sec":[${cum.map(c => f"$c%.2f").mkString(",")}],"rank_mass":$mass,"scale":$scale,"mass_retained":${mass.toDouble / scale}%.6f,"top_rank":$topRank}""")
    spark.stop()
  }
}
