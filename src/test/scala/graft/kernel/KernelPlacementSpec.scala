package graft.kernel

import graft.core._
import graft.engine.Engine
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins for the q127 placement trace (kernel A13/A14 exposed for the
  * oracle): the trace must agree row-for-row with what the FULL
  * orchestrator publishes — the alloc vector's length IS
  * input_summary.nb_worker_nodes, its nonzero count (floored by the
  * throughput pass's node count, quirk Q1) IS total_worker_node_needed —
  * and the oracle's central claim (greedy packing == slot sort) must hold
  * on arbitrary free-memory vectors, not just the two-valued grid shape.
  * The branch-coverage pins keep a future grid edit from silently losing
  * the error/growth/tie rows the oracle exists to check.
  */
class KernelPlacementSpec extends AnyFunSuite {

  test("placementTrace matches the orchestrator's published outputs on " +
      "every placement-grid row") {
    var ok = 0; var err = 0
    Engine.placementGrid.foreach { raw =>
      val t = Estimator.placementTrace(raw)
      (t.outcome, Estimator.estimate(raw)) match {
        case (Right((totalMem, alloc)), Right(res)) =>
          assert(alloc.length == res.input_summary.nb_worker_nodes,
            s"${raw.project_name}: node count")
          assert(totalMem == res.resource_estimates.total_memory_mb,
            s"${raw.project_name}: total memory")
          val nonzero = alloc.count(_ > 0)
          assert(math.min(nonzero, t.nThr) ==
            res.resource_estimates.total_worker_node_needed,
            s"${raw.project_name}: quirk-Q1 total nodes")
          val tm = res.cluster_recommendations.taskmanagers
          assert(t.tmCount == tm.count && t.tmMemMb.toDouble == tm.memory_mb_each,
            s"${raw.project_name}: TM config")
          assert(alloc.sum == t.tmCount && alloc.forall(_ >= 0),
            s"${raw.project_name}: alloc vector")
          ok += 1
        case (Left(msg), Left(orchMsg)) =>
          assert(orchMsg == msg, s"${raw.project_name}: error message drift")
          err += 1
        case (traceOut, orchOut) =>
          fail(s"${raw.project_name}: trace ${traceOut.isRight} vs " +
            s"orchestrator ${orchOut.isRight} success disagreement")
      }
    }
    assert(ok >= 140 && err >= 2, s"coverage collapsed: $ok ok, $err err")
  }

  test("placement grid exercises every A13/A14 branch the oracle checks") {
    val traces = Engine.placementGrid.map(Estimator.placementTrace)
    val errors = traces.filter(_.outcome.isLeft)
    assert(errors.map(_.projectName).toSet ==
      Set("pl E2 host error bm", "pl E2b host error vm"))
    // both number-format quirks of the host-error message
    assert(errors.exists(_.outcome.swap.exists(_.contains("is 5632.0 MB"))),
      "bare-metal float-format error row lost")
    assert(errors.exists(_.outcome.swap.exists(_.contains("is 13824 MB"))),
      "VM int-format error row lost")
    // state-pass growth (A14 aggregate jump and/or fragmentation +1)
    assert(traces.exists(t => t.nAfterState > t.n0), "state growth lost")
    val e1 = traces.find(_.projectName == "pl E1 state growth").get
    assert(e1.n0 == 2 && e1.nAfterState == 14, s"E1 growth: ${e1.nAfterState}")
    // final-placement growth beyond the state pass
    assert(traces.count(t =>
      t.outcome.exists(_._2.length > t.nAfterState)) >= 10, "final growth lost")
    // negative node-0 free memory: node 0 hosts nothing, others do
    val e3 = traces.find(_.projectName == "pl E3 jm overflow node0").get
    val e3alloc = e3.outcome.toOption.get._2
    assert(e3alloc(0) == 0 && e3alloc.count(_ > 0) == e3alloc.length - 1,
      "negative-F0 row lost")
    // quirk-Q1 floor: nonzero nodes strictly below the placed node count
    assert(traces.exists(t => t.outcome.exists { case (_, a) =>
      a.count(_ > 0) < a.length }), "Q1 floor row lost")
  }

  test("greedy packing equals the slot sort (priority DESC, node ASC, " +
      "k ASC) on arbitrary free-memory vectors") {
    def sortAlloc(free: IndexedSeq[Double], m: Int, t: Int): Option[Array[Int]] = {
      val slots = for {
        i <- free.indices
        cap = math.max(0, math.floor(free(i) / t).toInt)
        k <- 1 to cap
      } yield (free(i) - (k - 1).toDouble * t, i, k)
      if (slots.length < m) None
      else {
        val taken = slots.sortBy { case (p, i, k) => (-p, i, k) }.take(m)
        val alloc = new Array[Int](free.length)
        taken.foreach { case (_, i, _) => alloc(i) += 1 }
        Some(alloc)
      }
    }
    val gen = for {
      n <- Gen.choose(1, 12)
      t <- Gen.oneOf(1024, 2048, 4096, 5000, 7680)
      free <- Gen.listOfN(n, Gen.choose(-8192, 65536).map(_.toDouble))
      m <- Gen.choose(0, 40)
    } yield (free.toIndexedSeq, m, t)
    (1L to 500L).foreach { seed =>
      val (free, m, t) = gen.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val (alloc, _, ok, _) = Estimator.greedyPackTaskmanagers(free, m, t)
      sortAlloc(free, m, t) match {
        case Some(expected) =>
          assert(ok, s"seed $seed: greedy failed where slots suffice")
          assert(alloc.sameElements(expected),
            s"seed $seed: ${alloc.toSeq} != ${expected.toSeq}")
        case None =>
          assert(!ok, s"seed $seed: greedy succeeded with too few slots")
      }
    }
  }
}
