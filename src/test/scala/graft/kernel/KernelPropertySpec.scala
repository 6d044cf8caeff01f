package graft.kernel

import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property layer over the golden parity suite (SURVEY §5.2): determinism,
  * monotonicity, and structural invariants across seeded random scenarios.
  * Placement-impossible inputs (big state on small nodes) legitimately
  * return Left — properties quantify over the Right results and check the
  * Left channel's shape.
  */
class KernelPropertySpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  // Domain bounded so the greedy packer stays fast: it is O(TMs x nodes)
  // by design (faithful to the reference's loop), so keys/bytes/statement
  // ranges are capped to keep worst-case TM counts in the hundreds.
  private val genInput: Gen[EstimationInput] = for {
    mps <- Gen.choose(1, 3000000)
    bytes <- Gen.choose(1, 4096)
    apps <- Gen.choose(1, 2)
    keys <- Gen.choose(1L, 10000000L)
    skew <- Gen.oneOf("low", "medium", "high")
    lat <- Gen.oneOf(0.1, 0.5, 1.0, 2.0, 5.0, 30.0)
    s <- Gen.choose(0, 10); m <- Gen.choose(0, 10); c <- Gen.choose(0, 10)
    memMb <- Gen.oneOf(8192.0, 16384.0, 65536.0, 262144.0)
    cpu <- Gen.oneOf(2, 8, 16, 48, 128)
    nodes <- Gen.choose(1, 20)
    (tpe, tsize) <- Gen.oneOf(("bare_metal", None), ("VM", Some("S")),
      ("VM", Some("M")), ("VM", Some("L")))
  } yield EstimationInput("prop", mps, bytes, apps, keys, skew, 10, lat,
    s, m, c, memMb, cpu, nodes, tpe, tsize)

  private def results(seeds: Range): Seq[(EstimationInput, EstimationResult)] =
    seeds.flatMap { sd =>
      val in = sample(genInput, sd.toLong)
      Estimator.estimate(in).toOption.map(in -> _)
    }

  test("determinism over random scenarios") {
    (1 to 40).foreach { sd =>
      val in = sample(genInput, sd.toLong)
      assert(Estimator.estimate(in) == Estimator.estimate(in), s"seed $sd")
    }
  }

  test("structural invariants hold on every successful sizing") {
    val rs = results(1 to 120)
    assert(rs.nonEmpty)
    rs.foreach { case (in, r) =>
      val tm = r.cluster_recommendations.taskmanagers
      val jm = r.cluster_recommendations.jobmanager
      val s = r.scaling_recommendations.get
      assert(tm.count >= 1, in)
      assert(tm.total_cpus <= r.resource_estimates.total_cpus, in)
      assert(r.resource_estimates.total_memory_mb ==
        jm.memory_mb + tm.total_memory_mb, in)
      assert(tm.memory_mb_each >= 0 && tm.memory_mb_each <=
        Estimator.perTmCapMb(
          Validation.applyTshirt(in).worker_node_memory_mb) + 1, in)
      assert(r.resource_estimates.total_worker_node_needed >= 1, in)
      assert(s.min_parallelism <= s.recommended_parallelism, in)
      assert(s.recommended_parallelism <= s.max_parallelism, in)
      assert(s.checkpointing_interval_ms >= 5000 &&
        s.checkpointing_interval_ms <= 60000, in)
    }
  }

  test("state pass: allocations sum to TM count and fit node memory") {
    (1 to 60).foreach { sd =>
      val in = sample(genInput, sd.toLong)
      val (jmCpu @ _, jmMem) = Estimator.assessJobmanagerSize(in.num_distinct_keys)
      Estimator.statePass(in, jmMem).foreach {
        case (_, nbTm, alloc, _, grownNodes) =>
          assert(alloc.sum == nbTm, s"seed $sd")
          assert(alloc.length == grownNodes, s"seed $sd")
      }
    }
  }

  test("monotonicity: more distinct keys never shrinks state memory") {
    (1 to 40).foreach { sd =>
      val in = sample(genInput, sd.toLong)
        .copy(medium_statements = 1, complex_statements = 1)
      val lo = Estimator.stateFlinkProcessMemoryMb(in)
      val hi = Estimator.stateFlinkProcessMemoryMb(
        in.copy(num_distinct_keys = in.num_distinct_keys * 2))
      assert(hi >= lo, s"seed $sd")
    }
  }

  test("monotonicity: tighter latency never shrinks CPU factor or managed share") {
    val lats = Seq(0.3, 0.5, 0.9, 1.0, 3.0, 5.0, 12.0)
    lats.sliding(2).foreach { case Seq(tight, loose) =>
      assert(Estimator.latencyCpuFactor(tight) >= Estimator.latencyCpuFactor(loose))
      assert(Estimator.managedMemoryPercentByLatency(tight) <=
        Estimator.managedMemoryPercentByLatency(loose))
    }
  }

  test("monotonicity: adding statements never shrinks total CPUs") {
    (1 to 40).foreach { sd =>
      val in = sample(genInput, sd.toLong)
      for {
        base <- Estimator.estimate(in).toOption
        more <- Estimator.estimate(
          in.copy(simple_statements = in.simple_statements + 1)).toOption
      } assert(more.resource_estimates.total_cpus >=
        base.resource_estimates.total_cpus, s"seed $sd")
    }
  }

  test("placement-impossible inputs fail with the reference error shape") {
    val tiny = EstimationInput(project_name = "tiny nodes",
      num_distinct_keys = 100000000L, avg_record_size_bytes = 4096,
      medium_statements = 5, complex_statements = 5,
      worker_node_memory_mb = 1024.0, worker_node_cpu_max = 4)
    Estimator.estimate(tiny) match {
      case Left(msg) => assert(msg.contains("No worker can host"))
      case Right(r) => fail(s"expected placement failure, got $r")
    }
  }

  test("tiny latencies saturate recommended parallelism at max (no Long wrap)") {
    // Python's unbounded ints give min(max, rec*boost) = max; a wrapped
    // Long here once emitted a NEGATIVE parallelism.default
    val in = EstimationInput(project_name = "tiny latency",
      expected_latency_seconds = 1e-17, data_skew_risk = "high")
    Estimator.estimate(in) match {
      case Right(r) =>
        val s = r.scaling_recommendations.getOrElse(fail("no scaling recs"))
        assert(s.recommended_parallelism > 0)
        assert(s.recommended_parallelism == s.max_parallelism,
          s"rec=${s.recommended_parallelism} max=${s.max_parallelism}")
      case Left(e) => fail(e)
    }
  }

  test("absurd bandwidth rejects loudly instead of wrapping negative") {
    val in = EstimationInput(project_name = "huge bandwidth",
      bandwidth_capacity_gbps = 3000000)
    Estimator.estimate(in) match {
      case Left(msg) => assert(msg.contains("overflow"), msg)
      case Right(r) => fail(
        s"expected overflow reject, got mbps=${r.input_summary.bandwidth_capacity_mbps}")
    }
  }
}
