package graft.core

/** Data model for the estimation engine (SURVEY.md §1).
  *
  * Field names are snake_case on purpose: they become the Spark StructType
  * column names via Encoders.product, matching the reference's JSON wire
  * shape (/root/reference/src/flink_estimator/models.py:19-169) so saved runs
  * and sweep outputs are schema-compatible with the reference's persistence.
  */

/** Workload scenario — one row of a sweep. Mirrors EstimationInput
  * (models.py:19-84) including defaults. Use [[Validation.validate]] to
  * enforce the field constraints + the VM t-shirt rewrite before estimating.
  */
final case class EstimationInput(
    project_name: String,
    messages_per_second: Int = 5000,
    avg_record_size_bytes: Int = 512,
    number_flink_applications: Int = 1,
    num_distinct_keys: Long = 100000L,
    data_skew_risk: String = "low",
    bandwidth_capacity_gbps: Int = 10,
    expected_latency_seconds: Double = 5.0,
    simple_statements: Int = 2,
    medium_statements: Int = 1,
    complex_statements: Int = 1,
    worker_node_memory_mb: Double = 16384.0,
    worker_node_cpu_max: Int = 8,
    nb_worker_nodes: Int = 1,
    worker_node_type: String = "bare_metal",
    worker_node_t_size: Option[String] = None,
) {
  /** (simple+medium+complex) * apps — models.py:78-80. */
  def total_statements: Int =
    (simple_statements + medium_statements + complex_statements) * number_flink_applications

  /** mps * bytes / 2^20 — models.py:82-84. */
  def total_throughput_mb_per_sec: Double =
    messages_per_second.toDouble * avg_record_size_bytes / (1024.0 * 1024.0)
}

final case class InputSummary(
    messages_per_second: Int,
    avg_record_size_bytes: Int,
    total_throughput_mb_per_sec: Double,
    num_distinct_keys: Long,
    data_skew_risk: String,
    bandwidth_capacity_mbps: Int,
    expected_latency_seconds: Double,
    simple_statements: Int,
    medium_statements: Int,
    complex_statements: Int,
    total_statements: Int,
    worker_node_memory_capacity_mb: Double,
    worker_node_cpu_capacity: Int,
    nb_worker_nodes: Int,
    worker_node_t_size: Option[String],
)

final case class ResourceEstimates(
    total_memory_mb: Long,
    total_cpus: Int,
    total_worker_node_needed: Int,
    processing_load_score: Double,
)

final case class JobManagerConfig(count: Int, memory_mb: Int, total_cpus: Double)

final case class TaskManagerConfig(
    count: Int,
    total_memory_mb: Long,
    total_cpus: Int,
    memory_mb_each: Double,
)

final case class ClusterRecommendations(
    jobmanager: JobManagerConfig,
    taskmanagers: TaskManagerConfig,
)

final case class ScalingRecommendations(
    min_parallelism: Int,
    recommended_parallelism: Int,
    max_parallelism: Int,
    checkpointing_interval_ms: Int,
)

final case class CapacityAnalysis(
    total_flink_statements: Int,
    total_flink_applications: Int,
)

final case class EstimationResult(
    input_summary: InputSummary,
    resource_estimates: ResourceEstimates,
    cluster_recommendations: ClusterRecommendations,
    scaling_recommendations: Option[ScalingRecommendations],
    capacity_analysis: CapacityAnalysis,
)

final case class EstimationMetadata(
    estimation_id: String,
    timestamp: String,
    project_name: String,
    saved_at: String,
)

final case class SavedEstimation(
    metadata: EstimationMetadata,
    input_parameters: EstimationInput,
    estimation_results: EstimationResult,
    version: String = "1.0",
)

/** Field validation mirroring Pydantic (models.py:19-76): bounds, enums,
  * non-blank trimmed project name, and the VM t-shirt cross-field rewrite.
  * Returns the normalized input (trimmed name, t-shirt-applied memory/cpu)
  * or all violated constraints.
  */
object Validation {
  /** VM t-shirt -> (memory MB, cores) — models.py:12-17. */
  val VmTshirtMbCpu: Map[String, (Double, Int)] = Map(
    "S" -> (16384.0, 8),
    "M" -> (65536.0, 16),
    "L" -> (96448.0, 48),
  )

  def validate(in: EstimationInput): Either[List[String], EstimationInput] = {
    val errs = List.newBuilder[String]
    if (in.project_name == null || in.project_name.isEmpty)
      errs += "project_name: must have at least 1 character"
    else if (in.project_name.length > 100)
      errs += "project_name: must have at most 100 characters"
    else if (in.project_name.trim.isEmpty)
      errs += "Project name cannot be empty or just whitespace"
    if (in.messages_per_second <= 0) errs += "messages_per_second: must be greater than 0"
    if (in.avg_record_size_bytes <= 0) errs += "avg_record_size_bytes: must be greater than 0"
    if (in.number_flink_applications < 1) errs += "number_flink_applications: must be >= 1"
    if (in.num_distinct_keys < 1) errs += "num_distinct_keys: must be >= 1"
    if (!Set("low", "medium", "high").contains(in.data_skew_risk))
      errs += "data_skew_risk: must be one of low|medium|high"
    if (in.bandwidth_capacity_gbps <= 0) errs += "bandwidth_capacity_gbps: must be greater than 0"
    if (!(in.expected_latency_seconds > 0)) errs += "expected_latency_seconds: must be greater than 0"
    if (in.simple_statements < 0) errs += "simple_statements: must be >= 0"
    if (in.medium_statements < 0) errs += "medium_statements: must be >= 0"
    if (in.complex_statements < 0) errs += "complex_statements: must be >= 0"
    if (!(in.worker_node_memory_mb > 0)) errs += "worker_node_memory_mb: must be greater than 0"
    if (in.worker_node_memory_mb > 512 * 1024) errs += "worker_node_memory_mb: must be <= 524288"
    if (in.worker_node_cpu_max < 2 || in.worker_node_cpu_max > 256)
      errs += "worker_node_cpu_max: must be in [2, 256]"
    if (in.nb_worker_nodes < 1) errs += "nb_worker_nodes: must be >= 1"
    if (!Set("bare_metal", "VM").contains(in.worker_node_type))
      errs += "worker_node_type: must be one of bare_metal|VM"
    in.worker_node_t_size.foreach { s =>
      if (!VmTshirtMbCpu.contains(s)) errs += "worker_node_t_size: must be one of S|M|L"
    }
    if (in.worker_node_type == "VM" && in.worker_node_t_size.isEmpty)
      errs += "worker_node_t_size is required when worker_node_type is VM"

    val es = errs.result()
    if (es.nonEmpty) Left(es)
    else {
      val trimmed = in.copy(project_name = in.project_name.trim)
      Right(applyTshirt(trimmed))
    }
  }

  /** The model_validator rewrite (models.py:67-76): VM inputs take memory and
    * cpu from the t-shirt even when ad-hoc values were supplied. */
  def applyTshirt(in: EstimationInput): EstimationInput =
    if (in.worker_node_type == "VM" && in.worker_node_t_size.isDefined) {
      val (mb, cpus) = VmTshirtMbCpu(in.worker_node_t_size.get)
      in.copy(worker_node_memory_mb = mb, worker_node_cpu_max = cpus)
    } else in
}
