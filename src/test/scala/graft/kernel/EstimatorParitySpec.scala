package graft.kernel

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** The t1 parity suite (SURVEY.md §5.1): every inline golden from the
  * reference's unit tests, ported input-for-input and number-for-number.
  *
  * Sources: /root/reference/src/tests/ut/test_basic_estimation.py:44-471 and
  * test_estimation_logic.py:20-647 (citations per test). These pin the kernel
  * — including quirks Q1-Q6 — so refactors can't silently drift.
  */
class EstimatorParitySpec extends AnyFunSuite {

  /** The shared VM-S fixture (test_basic_estimation.py:31-38). */
  private def vmS: EstimationInput =
    EstimationInput(project_name = "VM Test",
      worker_node_type = "VM", worker_node_t_size = Some("S"))

  private def estimateOk(in: EstimationInput): EstimationResult =
    Estimator.estimate(in).fold(e => fail(s"estimate failed: $e"), identity)

  // ---- private-helper goldens (test_basic_estimation.py TestPrivateHelpers) ----

  test("VM t-shirt defaulting S/M/L (test_basic_estimation.py:44-77)") {
    val s = Validation.applyTshirt(vmS)
    assert(s.worker_node_memory_mb == 16384 && s.worker_node_cpu_max == 8)
    assert(s.nb_worker_nodes == 1)
    assert(s.simple_statements == 2 && s.medium_statements == 1 && s.complex_statements == 1)
    assert(s.data_skew_risk == "low" && s.bandwidth_capacity_gbps == 10)
    assert(s.expected_latency_seconds == 5.0)
    val m = Validation.applyTshirt(vmS.copy(worker_node_t_size = Some("M")))
    assert(m.worker_node_memory_mb == 65536 && m.worker_node_cpu_max == 16)
    val l = Validation.applyTshirt(vmS.copy(worker_node_t_size = Some("L")))
    assert(l.worker_node_memory_mb == 96448 && l.worker_node_cpu_max == 48)
  }

  test("latency CPU factor tiers (test_basic_estimation.py:79-85)") {
    assert(Estimator.latencyCpuFactor(0.5) == 1.5)
    assert(Estimator.latencyCpuFactor(1.0) == 1.2)
    assert(Estimator.latencyCpuFactor(3.0) == 1.1)
    assert(Estimator.latencyCpuFactor(5.0) == 1.0)
    assert(Estimator.latencyCpuFactor(10.0) == 1.0)
  }

  test("JM t-shirt by key cardinality (test_basic_estimation.py:87-108)") {
    assert(Estimator.assessJobmanagerSize(10000000L) == (1, 2048))
    assert(Estimator.assessJobmanagerSize(100000000L) == (2, 4096))
    assert(Estimator.assessJobmanagerSize(1000000000L) == (4, 8192))
  }

  test("free memory per node; JM on node 0 (test_basic_estimation.py:110-124)") {
    val in3 = vmS.copy(nb_worker_nodes = 3)
    val (free3, total3) = Estimator.freeMemPerNode(in3, 2048)
    assert(free3.toSeq == Seq(13824.0, 15872.0, 15872.0))
    assert(total3 >= 45000)
    val (free1, total1) = Estimator.freeMemPerNode(vmS.copy(nb_worker_nodes = 1), 2048)
    assert(free1.toSeq == Seq(13824.0))
    assert(total1 >= 13824)
  }

  test("managed-memory percent tiers (test_basic_estimation.py:126-131)") {
    assert(Estimator.managedMemoryPercentByLatency(0.5) == 0.32)
    assert(Estimator.managedMemoryPercentByLatency(1.0) == 0.35)
    assert(Estimator.managedMemoryPercentByLatency(5.0) == 0.4)
    assert(Estimator.managedMemoryPercentByLatency(10.0) == 0.4)
  }

  test("state process memory floor (test_basic_estimation.py:133-147)") {
    val in = EstimationInput(project_name = "State Flink Process Memory MB Test",
      num_distinct_keys = 1000000L, avg_record_size_bytes = 512,
      medium_statements = 1, complex_statements = 1,
      number_flink_applications = 1, expected_latency_seconds = 5.0)
    assert(Estimator.stateFlinkProcessMemoryMb(in) >= 2048)
  }

  test("network buffer heuristic floor (test_basic_estimation.py:148-164)") {
    val in = EstimationInput(project_name = "Network Buffer Min Process Memory MB Test",
      num_distinct_keys = 1000000L, avg_record_size_bytes = 512,
      medium_statements = 1, complex_statements = 1, simple_statements = 1,
      number_flink_applications = 1, expected_latency_seconds = 0.5,
      messages_per_second = 1000)
    val mb = Estimator.networkBufferMinProcessMemoryMb(in, in.total_throughput_mb_per_sec, 1)
    assert(mb >= 200)
  }

  test("state-driven TM count, small VM: 1 TM then 12 TMs [3,3,3,3] (test_basic_estimation.py:166-197)") {
    val base = vmS.copy(nb_worker_nodes = 1, simple_statements = 1,
      num_distinct_keys = 1000000L, avg_record_size_bytes = 512,
      complex_statements = 0, medium_statements = 1)
    val Right((_, nbTm1, alloc1, _, _)) = Estimator.statePass(base, 2048): @unchecked
    assert(nbTm1 == 1)
    assert(alloc1.toSeq == Seq(1))

    val bigger = base.copy(num_distinct_keys = 20000000L, avg_record_size_bytes = 1024)
    val Right((_, nbTm2, alloc2, _, _)) = Estimator.statePass(bigger, 2048): @unchecked
    assert(nbTm2 == 12)
    assert(alloc2.toSeq == Seq(3, 3, 3, 3))
  }

  test("state-driven TM count, large VM: 60 TMs (test_basic_estimation.py:199-224)") {
    val in = EstimationInput(project_name = "VM Test",
      worker_node_type = "VM", worker_node_t_size = Some("L"),
      nb_worker_nodes = 1, simple_statements = 1,
      num_distinct_keys = 20000000L, avg_record_size_bytes = 1024,
      complex_statements = 1, medium_statements = 4,
      number_flink_applications = 1, expected_latency_seconds = 5.0)
    val Right((_, nbTm, alloc, _, _)) = Estimator.statePass(in, 4096): @unchecked
    assert(nbTm == 60)
    assert(Seq(Seq(18, 21, 21), Seq(20, 20, 20)).contains(alloc.toSeq))
  }

  test("greedy packing invariants (test_basic_estimation.py:227-246)") {
    val free = IndexedSeq(13824.0, 15872.0, 15872.0)
    val (alloc, mx, ok, _) = Estimator.greedyPackTaskmanagers(free, 2, Estimator.TmMemMb)
    assert(ok)
    assert(alloc.length == 3)
    assert(alloc.sum == 2)
    assert(mx == 1)
    alloc.zipWithIndex.foreach { case (c, i) =>
      assert(c * Estimator.TmMemMb <= free(i))
    }
    val (alloc2, _, ok2, _) =
      Estimator.greedyPackTaskmanagers(IndexedSeq(100.0, 100.0, 100.0), 1, Estimator.TmMemMb)
    assert(!ok2)
    assert(alloc2.sum < 1)
  }

  test("CPU from throughput: simple, +medium, then M t-shirt (test_basic_estimation.py:248-283)") {
    val base = vmS.copy(simple_statements = 1, medium_statements = 0,
      complex_statements = 0, avg_record_size_bytes = 1024,
      num_distinct_keys = 1000L, data_skew_risk = "low",
      bandwidth_capacity_gbps = 10, expected_latency_seconds = 5.0,
      number_flink_applications = 1, messages_per_second = 500000)
    val (tm1, cpu1, nodes1) = Estimator.throughputPass(base, 1)
    assert(cpu1 >= 5 && nodes1 == 1 && tm1 == 1)
    val withMedium = base.copy(medium_statements = 1)
    val (tm2, cpu2, nodes2) = Estimator.throughputPass(withMedium, 1)
    assert(cpu2 >= 9 && nodes2 == 2 && tm2 == 2)
    val mShirt = withMedium.copy(worker_node_t_size = Some("M"))
    val (tm3, cpu3, nodes3) = Estimator.throughputPass(mShirt, 1)
    assert(cpu3 >= 9 && nodes3 == 1 && tm3 == 2)
  }

  // ---- E2E goldens (test_basic_estimation.py TestBasicEstimation) ----

  test("default VM-S settings: the 6144/4/1 golden (test_basic_estimation.py:290-301)") {
    val r = estimateOk(vmS)
    val tm = r.cluster_recommendations.taskmanagers
    assert(tm.count == 1)
    assert(tm.total_memory_mb == 4096)
    assert(tm.total_cpus == 3)
    assert(tm.memory_mb_each == 4096)
    assert(r.cluster_recommendations.jobmanager.count == 1)
    assert(r.resource_estimates.total_memory_mb == 6144)
    assert(r.resource_estimates.total_cpus == 4)
    assert(r.resource_estimates.total_worker_node_needed == 1)
  }

  test("minimal workload (test_basic_estimation.py:303-334)") {
    val in = vmS.copy(project_name = "Minimal Test", messages_per_second = 5000,
      avg_record_size_bytes = 512, num_distinct_keys = 10000000L,
      data_skew_risk = "low", bandwidth_capacity_gbps = 10,
      expected_latency_seconds = 5.0,
      simple_statements = 1, medium_statements = 0, complex_statements = 0)
    val r = estimateOk(in)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 2.44) <= 0.244)
    assert(r.input_summary.worker_node_memory_capacity_mb == 16384)
    assert(r.input_summary.worker_node_cpu_capacity == 8)
    assert(r.resource_estimates.total_memory_mb >= 6144)
    assert(r.resource_estimates.total_cpus >= 4)
    assert(r.resource_estimates.total_worker_node_needed == 1)
    assert(r.cluster_recommendations.taskmanagers.count == 1)
    assert(r.cluster_recommendations.taskmanagers.total_cpus == 3)
    assert(r.cluster_recommendations.jobmanager.total_cpus == 1)
  }

  test("simple workload: 12+ TMs, TM cpus 47 (test_basic_estimation.py:336-369)") {
    val in = EstimationInput(project_name = "Simple_Workload Test",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      num_distinct_keys = 10000000L, data_skew_risk = "low",
      bandwidth_capacity_gbps = 10, expected_latency_seconds = 5.0,
      worker_node_type = "VM", worker_node_t_size = Some("S"),
      simple_statements = 1, medium_statements = 1, complex_statements = 1)
    val r = estimateOk(in)
    assert(r.input_summary.total_statements == 3)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 9.77) <= 0.977)
    assert(r.resource_estimates.total_memory_mb >= 50800)
    assert(r.resource_estimates.total_cpus >= 45)
    assert(r.cluster_recommendations.taskmanagers.count >= 12)
    assert(r.cluster_recommendations.jobmanager.total_cpus == 1.0)
    assert(r.cluster_recommendations.taskmanagers.total_cpus == 47)
  }

  test("medium worker nodes: exact 51200/48/12TM golden (test_basic_estimation.py:372-402)") {
    val in = EstimationInput(project_name = "Medium Work Nodes Test",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      num_distinct_keys = 10000000L,
      simple_statements = 1, medium_statements = 1, complex_statements = 1,
      number_flink_applications = 1, expected_latency_seconds = 5.0,
      worker_node_type = "VM", worker_node_t_size = Some("M"),
      bandwidth_capacity_gbps = 10)
    val r = estimateOk(in)
    assert(r.input_summary.total_statements == 3)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 9.77) <= 0.0977)
    assert(r.resource_estimates.total_memory_mb == 51200)
    assert(r.resource_estimates.total_cpus == 48)
    assert(r.cluster_recommendations.jobmanager.count == 1)
    assert(r.cluster_recommendations.jobmanager.memory_mb == 2048)
    assert(r.cluster_recommendations.jobmanager.total_cpus == 1.0)
    assert(r.cluster_recommendations.taskmanagers.count == 12)
    assert(r.cluster_recommendations.taskmanagers.total_memory_mb == 49152)
    assert(r.cluster_recommendations.taskmanagers.total_cpus == 47)
  }

  test("moderate workload on bare-metal 64GB/8cpu (test_basic_estimation.py:406-440)") {
    val in = EstimationInput(project_name = "Moderate Test",
      messages_per_second = 5000, avg_record_size_bytes = 1024,
      expected_latency_seconds = 1.0, num_distinct_keys = 10000000L,
      data_skew_risk = "low", worker_node_memory_mb = 65536,
      worker_node_cpu_max = 8, bandwidth_capacity_gbps = 100,
      simple_statements = 3, medium_statements = 10, complex_statements = 10,
      number_flink_applications = 1)
    val r = estimateOk(in)
    assert(r.input_summary.total_statements == 23)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 4.88) <= 0.0488)
    assert(r.resource_estimates.total_memory_mb > 190000)
    assert(r.resource_estimates.total_cpus >= 28)
    assert(r.resource_estimates.total_worker_node_needed >= 3)
    assert(r.cluster_recommendations.taskmanagers.count >= 26)
    assert(r.cluster_recommendations.taskmanagers.total_memory_mb >= 16384L * 26)
    assert(r.cluster_recommendations.taskmanagers.total_cpus >= 26 * 8)
  }

  test("high-volume workload, 10 apps (test_basic_estimation.py:443-471)") {
    val in = EstimationInput(project_name = "High Volume Test",
      messages_per_second = 50000, avg_record_size_bytes = 2048,
      worker_node_memory_mb = 65536, num_distinct_keys = 10000000L,
      data_skew_risk = "low", worker_node_cpu_max = 8,
      simple_statements = 5, medium_statements = 3, complex_statements = 2,
      number_flink_applications = 10)
    val r = estimateOk(in)
    assert(r.input_summary.total_statements == 100)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 97.66) <= 0.9766)
    assert(r.resource_estimates.total_memory_mb > 190000)
    assert(r.resource_estimates.total_cpus >= 27)
    assert(r.resource_estimates.total_worker_node_needed >= 7)
    assert(r.cluster_recommendations.taskmanagers.count >= 2)
    // Quirk Q3: capacity analysis multiplies apps twice (estimation.py:388-390).
    assert(r.capacity_analysis.total_flink_statements == 1000)
    assert(r.capacity_analysis.total_flink_applications == 10)
  }

  // ---- public-API goldens (test_estimation_logic.py) ----

  test("complex-only: latency boost + checkpoint 9000 (test_estimation_logic.py:20-49)") {
    val tight = estimateOk(EstimationInput(project_name = "Complex Only",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      expected_latency_seconds = 1.0,
      simple_statements = 0, medium_statements = 0, complex_statements = 5))
    assert(tight.resource_estimates.total_cpus >= 25)
    val relaxed = estimateOk(EstimationInput(project_name = "Complex Only Relaxed",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      expected_latency_seconds = 10.0,
      simple_statements = 0, medium_statements = 0, complex_statements = 5))
    assert(tight.scaling_recommendations.get.recommended_parallelism >
      relaxed.scaling_recommendations.get.recommended_parallelism)
    assert(tight.scaling_recommendations.get.checkpointing_interval_ms == 9000)
  }

  test("mixed complexity (test_estimation_logic.py:51-67)") {
    val r = estimateOk(EstimationInput(project_name = "Mixed Complexity",
      messages_per_second = 2000, avg_record_size_bytes = 1024,
      simple_statements = 4, medium_statements = 3, complex_statements = 2))
    assert(r.resource_estimates.processing_load_score == 1.0)
    assert(r.resource_estimates.total_cpus >= 4)
    assert(r.cluster_recommendations.taskmanagers.count >= 1)
  }

  test("throughput tiers low/medium/high (test_estimation_logic.py:73-131)") {
    val low = estimateOk(EstimationInput(project_name = "Low Throughput",
      messages_per_second = 500, avg_record_size_bytes = 128,
      simple_statements = 2, medium_statements = 1, complex_statements = 0))
    val expLow = 500.0 * 128 / (1024 * 1024)
    assert(math.abs(low.input_summary.total_throughput_mb_per_sec - expLow) <= expLow * 0.1 + 0.005)
    assert(low.resource_estimates.total_cpus <= 40)

    val med = estimateOk(EstimationInput(project_name = "Medium Throughput",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      simple_statements = 3, medium_statements = 2, complex_statements = 1))
    val expMed = 10000.0 * 1024 / (1024 * 1024)
    assert(math.abs(med.input_summary.total_throughput_mb_per_sec - expMed) <= expMed * 0.01)
    assert(med.resource_estimates.total_cpus > 4)
    assert(med.resource_estimates.total_cpus <= 35)

    val high = estimateOk(EstimationInput(project_name = "High Throughput",
      messages_per_second = 100000, avg_record_size_bytes = 2048,
      simple_statements = 5, medium_statements = 3, complex_statements = 2))
    val expHigh = 100000.0 * 2048 / (1024 * 1024)
    assert(math.abs(high.input_summary.total_throughput_mb_per_sec - expHigh) <= expHigh * 0.01)
    assert(high.resource_estimates.total_cpus > 10)
    assert(high.cluster_recommendations.taskmanagers.count >= 1)
  }

  test("TM aggregate CPUs stay within resource line (test_estimation_logic.py:137-165)") {
    val r = estimateOk(EstimationInput(project_name = "CPU bound throughput only",
      messages_per_second = 524288, avg_record_size_bytes = 1024,
      num_distinct_keys = 1000L, data_skew_risk = "low",
      bandwidth_capacity_gbps = 100000, expected_latency_seconds = 10.0,
      simple_statements = 1, medium_statements = 0, complex_statements = 0))
    assert(r.input_summary.total_statements == 1)
    val expMbps = 524288.0 * 1024 / (1024 * 1024)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - expMbps) <= expMbps * 1e-5)
    val tm = r.cluster_recommendations.taskmanagers
    assert(tm.total_cpus <= r.resource_estimates.total_cpus)
    assert(tm.total_cpus >= 1)
  }

  test("tight latency does not shrink TM memory (test_estimation_logic.py:171-199)") {
    def base(lat: Double) = EstimationInput(project_name = "Latency A/B",
      messages_per_second = 200000, avg_record_size_bytes = 1024,
      num_distinct_keys = 5000L, data_skew_risk = "low",
      bandwidth_capacity_gbps = 100, simple_statements = 1,
      medium_statements = 0, complex_statements = 0,
      worker_node_memory_mb = 65536, worker_node_cpu_max = 32,
      expected_latency_seconds = lat)
    val tight = estimateOk(base(0.5))
    val relaxed = estimateOk(base(10.0))
    assert(tight.cluster_recommendations.taskmanagers.total_memory_mb >=
      relaxed.cluster_recommendations.taskmanagers.total_memory_mb)
    assert(tight.cluster_recommendations.taskmanagers.memory_mb_each >=
      relaxed.cluster_recommendations.taskmanagers.memory_mb_each)
  }

  test("buffer heuristic can exceed the 4096 floor (test_estimation_logic.py:201-223)") {
    val r = estimateOk(EstimationInput(project_name = "Buffer vs 4G floor",
      messages_per_second = 2000000, avg_record_size_bytes = 2048,
      num_distinct_keys = 100L, data_skew_risk = "low",
      bandwidth_capacity_gbps = 1000, expected_latency_seconds = 0.5,
      simple_statements = 1, medium_statements = 0, complex_statements = 0,
      worker_node_memory_mb = 256 * 1024, worker_node_cpu_max = 64))
    val tm = r.cluster_recommendations.taskmanagers
    assert(tm.count >= 1)
    assert(tm.memory_mb_each > 4096.0)
    assert(tm.total_memory_mb >= tm.count.toLong * 4096)
  }

  test("zero statements still sizes a cluster (test_estimation_logic.py:229-246)") {
    val r = estimateOk(EstimationInput(project_name = "No Statements",
      messages_per_second = 1000, avg_record_size_bytes = 1024,
      simple_statements = 0, medium_statements = 0, complex_statements = 0))
    assert(r.input_summary.total_statements == 0)
    assert(r.resource_estimates.processing_load_score == 1.0)
    assert(r.resource_estimates.total_cpus >= 1)
    assert(r.cluster_recommendations.taskmanagers.count >= 1)
  }

  test("10 MiB records at 10 msg/s (test_estimation_logic.py:248-265)") {
    val r = estimateOk(EstimationInput(project_name = "Large Messages",
      messages_per_second = 10, avg_record_size_bytes = 10 * 1024 * 1024,
      simple_statements = 1, medium_statements = 0, complex_statements = 0))
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - 100.0) <= 10.0)
    assert(r.resource_estimates.total_memory_mb > 500)
  }

  test("1M tiny messages per second (test_estimation_logic.py:267-284)") {
    val r = estimateOk(EstimationInput(project_name = "Small Messages",
      messages_per_second = 1000000, avg_record_size_bytes = 10,
      simple_statements = 1, medium_statements = 0, complex_statements = 0))
    val exp = 1000000.0 * 10 / (1024 * 1024)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - exp) <= exp * 0.1)
    assert(r.resource_estimates.total_cpus >= 4)
  }

  test("TM memory/CPU sanity bounds (test_estimation_logic.py:290-337)") {
    val mem = estimateOk(EstimationInput(project_name = "Memory Limits",
      messages_per_second = 50000, avg_record_size_bytes = 4096,
      simple_statements = 10, medium_statements = 5, complex_statements = 3))
    val per = mem.cluster_recommendations.taskmanagers.memory_mb_each
    assert(per >= 2)
    assert(per <= 16384.0 + 1)

    val cpu = estimateOk(EstimationInput(project_name = "CPU Limits",
      messages_per_second = 100000, avg_record_size_bytes = 1024,
      simple_statements = 15, medium_statements = 10, complex_statements = 5))
    assert(cpu.cluster_recommendations.taskmanagers.total_cpus >= 1)

    val jm = estimateOk(EstimationInput(project_name = "JobManager Test",
      messages_per_second = 75000, avg_record_size_bytes = 2048,
      simple_statements = 8, medium_statements = 4, complex_statements = 2))
    assert(jm.cluster_recommendations.jobmanager.total_cpus >= 0.5)
    assert(jm.cluster_recommendations.jobmanager.memory_mb >= 1024)
  }

  test("scaling: min <= recommended <= max (test_estimation_logic.py:343-360)") {
    val r = estimateOk(EstimationInput(project_name = "Parallelism Test",
      messages_per_second = 20000, avg_record_size_bytes = 1024,
      expected_latency_seconds = 10.0,
      simple_statements = 4, medium_statements = 2, complex_statements = 1))
    val s = r.scaling_recommendations.get
    assert(s.min_parallelism <= s.recommended_parallelism)
    assert(s.recommended_parallelism <= s.max_parallelism)
  }

  test("checkpoint interval ordering and bounds (test_estimation_logic.py:362-392)") {
    val simple = estimateOk(EstimationInput(project_name = "Simple Checkpointing",
      messages_per_second = 1000, avg_record_size_bytes = 512,
      expected_latency_seconds = 10.0,
      simple_statements = 2, medium_statements = 0, complex_statements = 0))
    val complexR = estimateOk(EstimationInput(project_name = "Complex Checkpointing",
      messages_per_second = 1000, avg_record_size_bytes = 512,
      expected_latency_seconds = 10.0,
      simple_statements = 0, medium_statements = 0, complex_statements = 5))
    assert(complexR.scaling_recommendations.get.checkpointing_interval_ms >=
      simple.scaling_recommendations.get.checkpointing_interval_ms)
    assert(simple.scaling_recommendations.get.checkpointing_interval_ms >= 5000)
    assert(complexR.scaling_recommendations.get.checkpointing_interval_ms <= 60000)
  }

  test("determinism: identical input, identical output (test_estimation_logic.py:494-501)") {
    val in = EstimationInput(project_name = "Sample Test Project",
      messages_per_second = 5000, avg_record_size_bytes = 1024,
      simple_statements = 3, medium_statements = 2, complex_statements = 1)
    val r1 = estimateOk(in)
    val r2 = estimateOk(in)
    assert(r1 == r2)
  }

  test("skew changes scaling, never CPUs (quirk Q2; test_estimation_logic.py:507-536)") {
    def at(skew: String) = estimateOk(EstimationInput(project_name = "Skew Test",
      messages_per_second = 5000, avg_record_size_bytes = 1024,
      num_distinct_keys = 100000L, bandwidth_capacity_gbps = 1,
      simple_statements = 2, medium_statements = 1, complex_statements = 0,
      data_skew_risk = skew))
    val (low, medium, high) = (at("low"), at("medium"), at("high"))
    assert(high.resource_estimates.total_cpus == medium.resource_estimates.total_cpus)
    assert(medium.resource_estimates.total_cpus == low.resource_estimates.total_cpus)
    assert(high.scaling_recommendations.get.max_parallelism <=
      medium.scaling_recommendations.get.max_parallelism)
    assert(high.scaling_recommendations.get.max_parallelism <=
      high.resource_estimates.total_cpus)
  }

  test("bandwidth is Mbps in summary and never in the CPU path (quirk Q2; test_estimation_logic.py:538-581)") {
    def at(gbps: Int) = estimateOk(EstimationInput(project_name = "Mbps unit test",
      messages_per_second = 1048576, avg_record_size_bytes = 10,
      num_distinct_keys = 1000L, data_skew_risk = "low",
      expected_latency_seconds = 10.0,
      simple_statements = 1, medium_statements = 0, complex_statements = 0,
      bandwidth_capacity_gbps = gbps))
    assert(at(99).resource_estimates.total_cpus == at(100).resource_estimates.total_cpus)

    def bw(gbps: Int) = estimateOk(EstimationInput(project_name = "Bandwidth Test",
      messages_per_second = 100000, avg_record_size_bytes = 2048,
      num_distinct_keys = 100000L, data_skew_risk = "medium",
      simple_statements = 2, medium_statements = 1, complex_statements = 0,
      bandwidth_capacity_gbps = gbps))
    val (lo, hi) = (bw(100), bw(10000))
    assert(lo.resource_estimates.total_cpus == hi.resource_estimates.total_cpus)
    assert(lo.resource_estimates.processing_load_score == hi.resource_estimates.processing_load_score)
  }

  test("key cardinality raises recommended parallelism (test_estimation_logic.py:583-609)") {
    def at(keys: Long) = estimateOk(EstimationInput(project_name = "Keys Test",
      messages_per_second = 10000, avg_record_size_bytes = 1024,
      data_skew_risk = "medium", bandwidth_capacity_gbps = 1,
      simple_statements = 2, medium_statements = 1, complex_statements = 0,
      num_distinct_keys = keys))
    val (few, many) = (at(1000L), at(10000000L))
    assert(many.scaling_recommendations.get.recommended_parallelism >
      few.scaling_recommendations.get.recommended_parallelism)
    assert(many.input_summary.num_distinct_keys == 10000000L)
    assert(few.input_summary.num_distinct_keys == 1000L)
    assert(many.resource_estimates.processing_load_score ==
      few.resource_estimates.processing_load_score)
  }

  test("input summary carries skew/bandwidth/key fields (test_estimation_logic.py:611-633)") {
    val r = estimateOk(EstimationInput(project_name = "Summary Test",
      messages_per_second = 5000, avg_record_size_bytes = 1024,
      num_distinct_keys = 250000L, data_skew_risk = "high",
      bandwidth_capacity_gbps = 500,
      simple_statements = 1, medium_statements = 1, complex_statements = 1))
    assert(r.input_summary.num_distinct_keys == 250000L)
    assert(r.input_summary.data_skew_risk == "high")
    assert(r.input_summary.bandwidth_capacity_mbps == 500000)
    assert(r.input_summary.messages_per_second == 5000)
    assert(r.input_summary.avg_record_size_bytes == 1024)
    assert(r.input_summary.total_statements == 3)
  }

  test("node floor quirk Q1: 40 requested, 1 needed (test_estimation_logic.py:636-647)") {
    val r = estimateOk(EstimationInput(project_name = "Floor nodes",
      messages_per_second = 100, avg_record_size_bytes = 128,
      simple_statements = 1, nb_worker_nodes = 40))
    assert(r.input_summary.nb_worker_nodes == 40)
    assert(r.resource_estimates.total_worker_node_needed == 1)
  }

  test("calculation properties (test_estimation_logic.py:650-661)") {
    val in = EstimationInput(project_name = "Sample Test Project",
      messages_per_second = 5000, avg_record_size_bytes = 1024,
      simple_statements = 3, medium_statements = 2, complex_statements = 1)
    val r = estimateOk(in)
    val tm = r.cluster_recommendations.taskmanagers
    assert(tm.count >= 1)
    assert(tm.total_cpus >= 1)
    assert(tm.total_memory_mb >= tm.count.toLong * 1024)
    val exp = in.messages_per_second.toDouble * in.avg_record_size_bytes / (1024 * 1024)
    assert(math.abs(r.input_summary.total_throughput_mb_per_sec - exp) <= exp * 1e-3)
  }

  test("VM placement error formats free memory as Python int (parity_diff r8 find)") {
    // The reference's t-shirt rewrite assigns an int into the float memory
    // field (models.py:73-74), so on the VM path the placement error says
    // "max free memory on a node is 60928 MB" — no ".0". Bare-metal inputs
    // keep the float repr. Input is the exact case parity_diff surfaced
    // (seed=8 idx=181): VM-M, sub-0.015 s latency, ~2 TB/s-class buffers
    // force per-TM memory to the 65024 MB cap, above node 0's 60928 free.
    val vmCase = EstimationInput(project_name = "parity-181",
      messages_per_second = 19701836, avg_record_size_bytes = 109423,
      number_flink_applications = 2, num_distinct_keys = 1208L,
      data_skew_risk = "high", bandwidth_capacity_gbps = 30,
      expected_latency_seconds = 0.014811, simple_statements = 3,
      medium_statements = 1, complex_statements = 0,
      worker_node_memory_mb = 476836.0, worker_node_cpu_max = 87,
      nb_worker_nodes = 1, worker_node_type = "VM",
      worker_node_t_size = Some("M"))
    Estimator.estimate(Validation.applyTshirt(vmCase)) match {
      case Left(msg) =>
        assert(msg == "No worker can host a 65024 MB task manager: " +
          "max free memory on a node is 60928 MB. " +
          "Increase worker_node_memory (or use a larger VM t-shirt) so each node can hold at least one TM.")
      case Right(r) => fail(s"expected placement error, got $r")
    }
    // bare-metal twin: float repr keeps the .0
    val bm = vmCase.copy(worker_node_type = "bare_metal",
      worker_node_t_size = None, worker_node_memory_mb = 65536.0,
      worker_node_cpu_max = 16)
    Estimator.estimate(bm) match {
      case Left(msg) => assert(msg.contains("max free memory on a node is 60928.0 MB"))
      case Right(r) => fail(s"expected placement error, got $r")
    }
  }
}
