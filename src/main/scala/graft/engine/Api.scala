package graft.engine

import graft.core._
import graft.kernel.Estimator

/** Thin API entry points mirroring the reference's HTTP surface
  * (/root/reference/src/main.py:54-283): param-based estimation with the
  * GB->MB conversion, t-size normalization, the prefill codec, and the
  * flink-conf snippet derivation (which includes the tm_cpu_each ceil-div —
  * semantics, not presentation; results.html:58-61,156-177).
  */
object Api {

  /** B9 — `""`/whitespace -> None; upcase; reject anything but S/M/L
    * (main.py:54-65). */
  def normalizeTsize(raw: Option[String]): Either[String, Option[String]] =
    raw.map(_.trim.toUpperCase) match {
      case None | Some("")              => Right(None)
      case Some(s @ ("S" | "M" | "L")) => Right(Some(s))
      case Some(_) => Left("worker_node_t_size must be S, M, or L")
    }

  /** GET /api/estimate defaults (main.py:226-242) — note they differ from
    * the model defaults on purpose (skew medium, latency 1.0, 0 statements,
    * 2 GB / 3 nodes). */
  private val GetDefaults = Map(
    "number_flink_applications" -> "1",
    "num_distinct_keys" -> "100000",
    "data_skew_risk" -> "medium",
    "bandwidth_capacity_gbps" -> "10",
    "expected_latency_seconds" -> "1.0",
    "simple_statements" -> "0",
    "medium_statements" -> "0",
    "complex_statements" -> "0",
    "worker_node_memory_gb" -> "2.0",
    "worker_node_cpu_max" -> "8",
    "nb_worker_nodes" -> "3",
    "worker_node_type" -> "bare_metal",
  )

  /** B2 — the query-param entry point: typed parsing, GB->MB x1024, t-size
    * normalization, then the same validate+estimate path as everything
    * else. Missing required params / bad numbers / validation errors all
    * come back as Left (the 400 path). */
  def estimateFromParams(params: Map[String, String]): Either[String, EstimationResult] =
    estimateFromParamsWithInput(params).map(_._2)

  /** [[estimateFromParams]] returning the VALIDATED input alongside the
    * result — the save path persists exactly what was estimated (t-shirt
    * rewrite applied, strings trimmed), the same contract as the JSON
    * surface; a second independent parse of the raw params would be a
    * drift site (it was: the HTTP form save used to re-parse and could
    * persist an input that disagreed with the rendered estimate). */
  def estimateFromParamsWithInput(params: Map[String, String])
      : Either[String, (EstimationInput, EstimationResult)] = {
    val p = GetDefaults ++ params
    def req(k: String): Either[String, String] =
      p.get(k).toRight(s"missing required parameter: $k")
    def asInt(k: String, v: String): Either[String, Int] =
      v.trim.toIntOption.toRight(s"$k: invalid integer '$v'")
    def asLong(k: String, v: String): Either[String, Long] =
      v.trim.toLongOption.toRight(s"$k: invalid integer '$v'")
    def asDouble(k: String, v: String): Either[String, Double] =
      v.trim.toDoubleOption.toRight(s"$k: invalid number '$v'")
    for {
      name <- req("project_name")
      mps <- req("messages_per_second").flatMap(asInt("messages_per_second", _))
      bytes <- req("avg_record_size_bytes").flatMap(asInt("avg_record_size_bytes", _))
      apps <- asInt("number_flink_applications", p("number_flink_applications"))
      keys <- asLong("num_distinct_keys", p("num_distinct_keys"))
      gbps <- asInt("bandwidth_capacity_gbps", p("bandwidth_capacity_gbps"))
      lat <- asDouble("expected_latency_seconds", p("expected_latency_seconds"))
      simple <- asInt("simple_statements", p("simple_statements"))
      medium <- asInt("medium_statements", p("medium_statements"))
      cmplx <- asInt("complex_statements", p("complex_statements"))
      memGb <- asDouble("worker_node_memory_gb", p("worker_node_memory_gb"))
      cpuMax <- asInt("worker_node_cpu_max", p("worker_node_cpu_max"))
      nodes <- asInt("nb_worker_nodes", p("nb_worker_nodes"))
      tsize <- normalizeTsize(p.get("worker_node_t_size"))
      in = EstimationInput(
        project_name = name,
        messages_per_second = mps,
        avg_record_size_bytes = bytes,
        number_flink_applications = apps,
        num_distinct_keys = keys,
        data_skew_risk = p("data_skew_risk"),
        bandwidth_capacity_gbps = gbps,
        expected_latency_seconds = lat,
        simple_statements = simple,
        medium_statements = medium,
        complex_statements = cmplx,
        worker_node_memory_mb = memGb * 1024.0,
        worker_node_cpu_max = cpuMax,
        nb_worker_nodes = nodes,
        worker_node_type = p("worker_node_type"),
        worker_node_t_size = tsize)
      validated <- Validation.validate(in).left.map(_.mkString("; "))
      result <- Estimator.estimate(validated)
    } yield (validated, result)
  }

  /** B10 inverse codec — EstimationInput to form-field map: memory MB->GB,
    * None t-size renders as "" (main.py:113-123). */
  def formPrefill(in: EstimationInput): Map[String, String] = Map(
    "project_name" -> in.project_name,
    "messages_per_second" -> in.messages_per_second.toString,
    "avg_record_size_bytes" -> in.avg_record_size_bytes.toString,
    "number_flink_applications" -> in.number_flink_applications.toString,
    "num_distinct_keys" -> in.num_distinct_keys.toString,
    "data_skew_risk" -> in.data_skew_risk,
    "bandwidth_capacity_gbps" -> in.bandwidth_capacity_gbps.toString,
    "expected_latency_seconds" -> in.expected_latency_seconds.toString,
    "simple_statements" -> in.simple_statements.toString,
    "medium_statements" -> in.medium_statements.toString,
    "complex_statements" -> in.complex_statements.toString,
    "worker_node_memory_gb" -> (in.worker_node_memory_mb / 1024.0).toString,
    "worker_node_cpu_max" -> in.worker_node_cpu_max.toString,
    "nb_worker_nodes" -> in.nb_worker_nodes.toString,
    "worker_node_type" -> in.worker_node_type,
    "worker_node_t_size" -> in.worker_node_t_size.getOrElse(""),
  )

  /** B11 — per-TM slot count: ceil-div of TM CPUs over TM count
    * (results.html:58-61). */
  def tmCpuEach(tm: TaskManagerConfig): Int =
    if (tm.count == 0) 0 else (tm.total_cpus + tm.count - 1) / tm.count

  /** B11 — the flink-conf.yaml snippet exactly as the results page derives
    * it (results.html:156-177). */
  def flinkConfSnippet(r: EstimationResult): String = {
    val jm = r.cluster_recommendations.jobmanager
    val tm = r.cluster_recommendations.taskmanagers
    val base =
      s"""# JobManager
         |jobmanager.memory.process.size: ${jm.memory_mb}m
         |
         |# TaskManager
         |taskmanager.memory.process.size: ${tm.total_memory_mb}m
         |taskmanager.numberOfTaskSlots: ${tmCpuEach(tm)}
         |
         |# Checkpointing
         |""".stripMargin
    r.scaling_recommendations match {
      case Some(s) =>
        base +
          s"""execution.checkpointing.interval: ${s.checkpointing_interval_ms}ms
             |execution.checkpointing.mode: EXACTLY_ONCE
             |
             |# Parallelism
             |parallelism.default: ${s.recommended_parallelism}
             |""".stripMargin
      case None => base
    }
  }
}
