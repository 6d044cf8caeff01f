package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q95 (integer PageRank): exact equality with a direct JVM
  * power iteration over the same edge set, rank-mass sanity, and the
  * hub-ordering property (zero-in-degree nodes sit at the base rank). */
class GraphSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** The same integer recurrence, sequentially on the driver. */
  private def referenceRanks(edges: Set[(Long, Long)]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).toSeq.sorted
    val nn = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L / nn).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.toSeq
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(n => n -> (150000L / nn + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  test("q95 equals a driver-side integer power iteration on sf0.001") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val edges = docs.select(
        (col("doc_id") % 23).as("src"),
        (((col("doc_id") % 19) * (col("doc_id") % 23) + col("doc_id") % 11) % 23).as("dst"))
      .distinct().filter(col("src") =!= col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = referenceRanks(edges)
    val got = GraphQueries.q95PageRank(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.size === expected.size)
    expected.foreach { case (node, rank) =>
      assert(got(s"s$node.example.org") === rank, s"node $node")
    }
  }

  test("q95 rank mass stays within truncation loss of the scale") {
    val ranks = GraphQueries.q95PageRank(spark, dir)
      .collect().map(_.getLong(1))
    val mass = ranks.sum
    // each of 5 iterations loses < 1 micro per node per truncating DIV
    // (base term, per-edge contrib, damping) — loose bound: 5 * n * 30.
    // NOTE: this bound assumes the %23 graph has NO SINKS — q95 is the
    // no-dangling-redistribution variant (see GraphQueries scaladoc), so
    // on a graph with sinks each sink additionally leaks d*rank(sink)
    // per iteration and this bound would not hold.
    assert(mass <= 1000000L && mass > 1000000L - 5L * ranks.length * 30,
      s"mass $mass")
    assert(ranks.distinct.length > 1, "degree-varied graph must produce varied ranks")
  }

  test("powerIteration checkpoints RELIABLY when the conf dir is set") {
    // the MaterializeSpec discipline: same output in reliable mode, and
    // real checkpoint part files on disk (VERDICT r8 #3 — raw
    // localCheckpoint here made the cluster conf a silent no-op).
    // r16: q95 itself no longer iterates distributed (the %23 graph is
    // bounded by construction and runs driver-side after one distinct
    // census — see its scaladoc), so the reliable-checkpoint pin moves to
    // [[GraphQueries.powerIteration]], the REAL-graph path PageRankSmoke
    // drives, which is where restartability matters on a cluster.
    import org.apache.spark.sql.functions._
    def partFiles(d: java.io.File): Long =
      if (d.isDirectory) d.listFiles().map(partFiles).sum
      else if (d.getName.startsWith("part-")) 1L else 0L
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    def edges = docs.select(
        (col("doc_id") % 23).as("src"),
        (((col("doc_id") % 19) * (col("doc_id") % 23) + col("doc_id") % 11) % 23).as("dst"))
      .distinct().filter(col("src") =!= col("dst"))
    val baseline = GraphQueries.powerIteration(Materialize.materialize(edges), 5)
      .collect().map(_.toString).sorted
    val ckptDir =
      java.nio.file.Files.createTempDirectory("graft_ckpt_q95").toString
    spark.conf.set(Materialize.ConfKey, ckptDir)
    try {
      val reliable = GraphQueries.powerIteration(Materialize.materialize(edges), 5)
        .collect().map(_.toString).sorted
      assert(reliable.sameElements(baseline),
        "reliable-mode PageRank differs from default mode")
      assert(partFiles(new java.io.File(ckptDir)) > 0,
        "reliable mode must persist checkpoint part files")
    } finally spark.conf.unset(Materialize.ConfKey)
  }

  test("q95 equals the distributed powerIteration over the same edges") {
    // the r16 driver-loop rewrite must stay bit-identical to the
    // distributed form it replaced (both are exact integer arithmetic)
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val edges = Materialize.materialize(docs.select(
        (col("doc_id") % 23).as("src"),
        (((col("doc_id") % 19) * (col("doc_id") % 23) + col("doc_id") % 11) % 23).as("dst"))
      .distinct().filter(col("src") =!= col("dst")))
    val dist = GraphQueries.powerIteration(edges, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = GraphQueries.q95PageRank(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.size === dist.size)
    dist.foreach { case (node, rank) =>
      assert(got(s"s$node.example.org") === rank, s"node $node")
    }
  }

  test("no raw localCheckpoint outside Materialize and the timing tools") {
    // source lint backing the one-helper contract: every materialization
    // site must go through Materialize.materialize so the reliable-mode
    // conf governs ALL of them (VERDICT r8 #3 'done' criterion)
    import scala.jdk.CollectionConverters._
    val allowed = Set(
      "src/main/scala/graft/operators/Materialize.scala",
      "src/main/scala/graft/tools/CanonicalSmoke.scala",
      "src/main/scala/graft/tools/HotSpanSmoke.scala",
      "src/main/scala/graft/tools/DomainCapSmoke.scala",
      "src/main/scala/graft/tools/PerplexitySmoke.scala",
      // r10: BPE smoke pins its generated corpus outside the timed
      // region — same measurement-isolation use as the other smokes
      "src/main/scala/graft/tools/BpeSmoke.scala")
    val root = java.nio.file.Paths.get("src/main/scala")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter(p => !allowed(p.toString))
      .filter { p =>
        java.nio.file.Files.readAllLines(p).asScala
          .exists(l => l.contains(".localCheckpoint()") && !l.trim.startsWith("*"))
      }
      .map(_.toString).toSeq
    assert(offenders.isEmpty,
      s"raw localCheckpoint outside the shared helper: $offenders")
  }
}
