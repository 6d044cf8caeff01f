package graft.engine

import graft.core.EstimationInput
import org.scalatest.funsuite.AnyFunSuite

/** API-layer parity: t-size normalization (B9), GET param semantics with
  * GB->MB conversion (B2), prefill codec round trip (B10), and the conf
  * snippet's ceil-div slot derivation (B11).
  */
class ApiSpec extends AnyFunSuite {

  test("t-size normalization (main.py:54-65)") {
    assert(Api.normalizeTsize(None) == Right(None))
    assert(Api.normalizeTsize(Some("")) == Right(None))
    assert(Api.normalizeTsize(Some("  ")) == Right(None))
    assert(Api.normalizeTsize(Some("s")) == Right(Some("S")))
    assert(Api.normalizeTsize(Some(" m ")) == Right(Some("M")))
    assert(Api.normalizeTsize(Some("L")) == Right(Some("L")))
    assert(Api.normalizeTsize(Some("XL")).isLeft)
  }

  test("GET param path: GB->MB conversion and defaults (main.py:226-271)") {
    val r = Api.estimateFromParams(Map(
      "project_name" -> "Param Test",
      "messages_per_second" -> "5000",
      "avg_record_size_bytes" -> "512",
      "worker_node_memory_gb" -> "16",
      "nb_worker_nodes" -> "1",
      "simple_statements" -> "2",
      "medium_statements" -> "1",
      "complex_statements" -> "1",
      "expected_latency_seconds" -> "5.0",
      "data_skew_risk" -> "low",
    )).fold(e => fail(e), identity)
    assert(r.input_summary.worker_node_memory_capacity_mb == 16384.0)
    // same workload as the VM-S default fixture => same sizing numbers
    assert(r.resource_estimates.total_memory_mb == 6144)
    assert(r.resource_estimates.total_cpus == 4)
  }

  test("GET param path rejects bad input as Left (the 400 path)") {
    assert(Api.estimateFromParams(Map.empty).isLeft) // missing required
    assert(Api.estimateFromParams(Map(
      "project_name" -> "x",
      "messages_per_second" -> "not-a-number",
      "avg_record_size_bytes" -> "512")).isLeft)
    assert(Api.estimateFromParams(Map(
      "project_name" -> "x",
      "messages_per_second" -> "0", // fails validation
      "avg_record_size_bytes" -> "512")).isLeft)
    assert(Api.estimateFromParams(Map(
      "project_name" -> "x",
      "messages_per_second" -> "100",
      "avg_record_size_bytes" -> "512",
      "worker_node_t_size" -> "XXL")).isLeft)
  }

  test("prefill codec: MB->GB inverse and empty t-size (main.py:113-123)") {
    val in = EstimationInput(project_name = "PF",
      worker_node_memory_mb = 65536.0, worker_node_t_size = None)
    val m = Api.formPrefill(in)
    assert(m("worker_node_memory_gb") == "64.0")
    assert(m("worker_node_t_size") == "")
    val vm = Api.formPrefill(in.copy(worker_node_t_size = Some("M")))
    assert(vm("worker_node_t_size") == "M")
  }

  test("tm_cpu_each is a ceil-div (results.html:58-61)") {
    import graft.core.TaskManagerConfig
    assert(Api.tmCpuEach(TaskManagerConfig(12, 49152L, 47, 4096.0)) == 4)
    assert(Api.tmCpuEach(TaskManagerConfig(1, 4096L, 3, 4096.0)) == 3)
    assert(Api.tmCpuEach(TaskManagerConfig(0, 0L, 0, 0.0)) == 0)
  }

  test("flink-conf snippet carries the derived values (results.html:156-177)") {
    val in = EstimationInput(project_name = "VM Test",
      worker_node_type = "VM", worker_node_t_size = Some("S"))
    val r = Engine.estimateOne(in).result.get
    val snippet = Api.flinkConfSnippet(r)
    assert(snippet.contains("jobmanager.memory.process.size: 2048m"))
    assert(snippet.contains("taskmanager.memory.process.size: 4096m"))
    assert(snippet.contains("taskmanager.numberOfTaskSlots: 3"))
    assert(snippet.contains("execution.checkpointing.mode: EXACTLY_ONCE"))
    assert(snippet.contains("parallelism.default: " +
      r.scaling_recommendations.get.recommended_parallelism))
  }
}
