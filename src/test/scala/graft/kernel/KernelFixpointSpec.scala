package graft.kernel

import graft.core._
import graft.engine.Engine
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pins for the q123 TM-fixpoint pass (kernel A8 exposed for the oracle):
  * the pass must agree row-for-row with what the FULL orchestrator
  * publishes whenever it succeeds — memory_mb_each IS the fixpoint's p
  * (round-half-even of p*n/n) and taskmanagers.count IS its n — and be
  * well-defined on rows whose placement rejects.
  */
class KernelFixpointSpec extends AnyFunSuite {

  test("tmFixpointPass matches the orchestrator's published TM config on " +
      "every successful demo-grid row") {
    var checked = 0
    Engine.demoGrid.foreach { raw =>
      val (_, _, p, n) = Estimator.tmFixpointPass(raw)
      Estimator.estimate(raw).foreach { res =>
        val tm = res.cluster_recommendations.taskmanagers
        assert(tm.count == n, s"${raw.project_name}: count ${tm.count} != $n")
        assert(tm.memory_mb_each == p.toDouble,
          s"${raw.project_name}: memory_mb_each ${tm.memory_mb_each} != $p")
        checked += 1
      }
    }
    assert(checked > 0, "no demo-grid row succeeded — grid broken")
  }

  test("tmFixpointPass agrees with the orchestrator across seeded random " +
      "scenarios (the KernelPropertySpec domain)") {
    val gen: Gen[EstimationInput] = for {
      mps <- Gen.choose(1, 3000000)
      bytes <- Gen.choose(1, 4096)
      apps <- Gen.choose(1, 2)
      keys <- Gen.choose(1L, 10000000L)
      lat <- Gen.oneOf(0.1, 0.5, 1.0, 2.0, 5.0, 30.0)
      s <- Gen.choose(0, 10); m <- Gen.choose(0, 10); c <- Gen.choose(0, 10)
      nodeMb <- Gen.oneOf(8192.0, 16384.0, 65536.0, 262144.0)
    } yield EstimationInput(
      project_name = "prop",
      messages_per_second = mps,
      avg_record_size_bytes = bytes,
      num_distinct_keys = keys,
      expected_latency_seconds = lat,
      simple_statements = s,
      medium_statements = m,
      complex_statements = c,
      number_flink_applications = apps,
      worker_node_memory_mb = nodeMb,
    )
    var successes = 0
    (1L to 200L).foreach { seed =>
      val in = gen.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(fail(s"generator exhausted at seed $seed"))
      val (nbState, nbCpu, p, n) = Estimator.tmFixpointPass(in)
      assert(nbState >= 1 && nbCpu >= 0 && p >= 0 && n >= 1)
      Estimator.estimate(in).foreach { res =>
        val tm = res.cluster_recommendations.taskmanagers
        assert(tm.count == n && tm.memory_mb_each == p.toDouble,
          s"seed $seed: (${tm.count}, ${tm.memory_mb_each}) != ($n, $p)")
        successes += 1
      }
    }
    assert(successes > 50, s"only $successes/200 scenarios succeeded")
  }

  test("tmFixpointPass is defined on a placement-rejecting row (tiny node, " +
      "big state) and still fixpoint-consistent") {
    val in = EstimationInput(
      project_name = "reject",
      messages_per_second = 1000,
      avg_record_size_bytes = 4096,
      num_distinct_keys = 1000000000L,
      expected_latency_seconds = 1.0,
      simple_statements = 0, medium_statements = 5, complex_statements = 5,
      worker_node_memory_mb = 4096.0, // free = 3584 < one 4096 MB TM
    )
    assert(Estimator.estimate(in).isLeft, "placement must reject this row")
    val (_, nbCpu, p, n) = Estimator.tmFixpointPass(in)
    // the fixpoint equations hold at the returned point
    val cap = Estimator.perTmCapMb(in.worker_node_memory_mb)
    assert(p <= cap && p >= 0)
    assert(n >= math.max(1, nbCpu) || n >= 1)
  }
}
