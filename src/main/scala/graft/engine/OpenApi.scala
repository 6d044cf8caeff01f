package graft.engine

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Machine-readable API description (VERDICT r7 next-round #4).
  *
  * The reference is a FastAPI app, so it auto-serves `/openapi.json` and
  * `/docs` (main.py:34 app construction; its checklist marks OpenAPI docs
  * done). This is the hand-written equivalent for the HttpApi route table:
  * OpenAPI 3.1, same title/description as the reference app, schemas with
  * the reference's field names, types, defaults, and bounds
  * (models.py:19-169), and the GET surface's distinct query-param defaults
  * (main.py:226-242 — `worker_node_memory_gb`, skew "medium", 0 statements).
  *
  * Built from Scala maps through jackson rather than a string literal so it
  * cannot go syntactically stale; content is pinned by HttpApiSpec.
  */
object OpenApi {

  private def schema(tpe: String, extra: (String, Any)*): Map[String, Any] =
    (Map[String, Any]("type" -> tpe) ++ extra).toMap

  private val estimationInputSchema: Map[String, Any] = Map(
    "type" -> "object",
    "required" -> Seq("project_name"),
    "properties" -> Map(
      "project_name" -> schema("string", "minLength" -> 1, "maxLength" -> 100,
        "description" -> "Name of the project"),
      "messages_per_second" -> schema("integer", "exclusiveMinimum" -> 0, "default" -> 5000),
      "avg_record_size_bytes" -> schema("integer", "exclusiveMinimum" -> 0, "default" -> 512),
      "number_flink_applications" -> schema("integer", "minimum" -> 1, "default" -> 1),
      "num_distinct_keys" -> schema("integer", "minimum" -> 1, "default" -> 100000),
      "data_skew_risk" -> schema("string", "enum" -> Seq("low", "medium", "high"),
        "default" -> "low"),
      "bandwidth_capacity_gbps" -> schema("integer", "exclusiveMinimum" -> 0, "default" -> 10),
      "expected_latency_seconds" -> schema("number", "exclusiveMinimum" -> 0, "default" -> 5.0),
      "simple_statements" -> schema("integer", "minimum" -> 0, "default" -> 2),
      "medium_statements" -> schema("integer", "minimum" -> 0, "default" -> 1),
      "complex_statements" -> schema("integer", "minimum" -> 0, "default" -> 1),
      "worker_node_memory_mb" -> schema("number", "exclusiveMinimum" -> 0,
        "maximum" -> 524288, "default" -> 16384),
      "worker_node_cpu_max" -> schema("integer", "minimum" -> 2, "maximum" -> 256,
        "default" -> 8),
      "nb_worker_nodes" -> schema("integer", "minimum" -> 1, "default" -> 1),
      "worker_node_type" -> schema("string", "enum" -> Seq("bare_metal", "VM"),
        "default" -> "bare_metal"),
      "worker_node_t_size" -> Map("anyOf" -> Seq(
        schema("string", "enum" -> Seq("S", "M", "L")), Map("type" -> "null")),
        "default" -> null),
    ),
  )

  private val resultSchemas: Map[String, Any] = Map(
    "InputSummary" -> Map("type" -> "object", "properties" -> Map(
      "messages_per_second" -> schema("integer"),
      "avg_record_size_bytes" -> schema("integer"),
      "total_throughput_mb_per_sec" -> schema("number"),
      "num_distinct_keys" -> schema("integer"),
      "data_skew_risk" -> schema("string"),
      "bandwidth_capacity_mbps" -> schema("integer"),
      "expected_latency_seconds" -> schema("number"),
      "simple_statements" -> schema("integer"),
      "medium_statements" -> schema("integer"),
      "complex_statements" -> schema("integer"),
      "total_statements" -> schema("integer"),
      "worker_node_memory_capacity_mb" -> schema("number"),
      "worker_node_cpu_capacity" -> schema("integer"),
      "nb_worker_nodes" -> schema("integer"),
      "worker_node_t_size" -> Map("anyOf" -> Seq(
        schema("string"), Map("type" -> "null"))),
    )),
    "ResourceEstimates" -> Map("type" -> "object", "properties" -> Map(
      "total_memory_mb" -> schema("integer"),
      "total_cpus" -> schema("integer"),
      "total_worker_node_needed" -> schema("integer"),
      "processing_load_score" -> schema("number"),
    )),
    "JobManagerConfig" -> Map("type" -> "object", "properties" -> Map(
      "count" -> schema("integer"),
      "memory_mb" -> schema("integer"),
      "total_cpus" -> schema("number", "minimum" -> 0.5),
    )),
    "TaskManagerConfig" -> Map("type" -> "object", "properties" -> Map(
      "count" -> schema("integer"),
      "total_memory_mb" -> schema("integer"),
      "total_cpus" -> schema("integer"),
      "memory_mb_each" -> schema("number"),
    )),
    "ClusterRecommendations" -> Map("type" -> "object", "properties" -> Map(
      "jobmanager" -> ref("JobManagerConfig"),
      "taskmanagers" -> ref("TaskManagerConfig"),
    )),
    "ScalingRecommendations" -> Map("type" -> "object", "properties" -> Map(
      "min_parallelism" -> schema("integer"),
      "recommended_parallelism" -> schema("integer"),
      "max_parallelism" -> schema("integer"),
      "checkpointing_interval_ms" -> schema("integer"),
    )),
    "CapacityAnalysis" -> Map("type" -> "object", "properties" -> Map(
      "total_flink_statements" -> schema("integer"),
      "total_flink_applications" -> schema("integer"),
    )),
    "EstimationResult" -> Map("type" -> "object", "properties" -> Map(
      "input_summary" -> ref("InputSummary"),
      "resource_estimates" -> ref("ResourceEstimates"),
      "cluster_recommendations" -> ref("ClusterRecommendations"),
      "scaling_recommendations" -> Map("anyOf" -> Seq(
        ref("ScalingRecommendations"), Map("type" -> "null"))),
      "capacity_analysis" -> ref("CapacityAnalysis"),
    )),
  )

  private def ref(name: String): Map[String, Any] =
    Map("$ref" -> s"#/components/schemas/$name")

  private def op(summary: String, extra: (String, Any)*): Map[String, Any] =
    (Map[String, Any]("summary" -> summary,
      "responses" -> Map("200" -> Map("description" -> "Successful Response")))
      ++ extra).toMap

  private def htmlOp(summary: String): Map[String, Any] = op(summary)

  private def queryParam(name: String, tpe: String, required: Boolean,
      default: Option[Any] = None): Map[String, Any] =
    Map("name" -> name, "in" -> "query", "required" -> required,
      "schema" -> (schema(tpe) ++ default.map("default" -> _).toMap))

  /** GET /api/estimate's query surface — main.py:226-242's signature with
    * its OWN defaults (skew medium, latency 1.0, 0 statements, memory in
    * GB, 3 nodes), which differ from the model defaults on purpose. */
  private val apiEstimateGetParams: Seq[Map[String, Any]] = Seq(
    queryParam("project_name", "string", required = true),
    queryParam("messages_per_second", "integer", required = true),
    queryParam("avg_record_size_bytes", "integer", required = true),
    queryParam("number_flink_applications", "integer", false, Some(1)),
    queryParam("num_distinct_keys", "integer", false, Some(100000)),
    queryParam("data_skew_risk", "string", false, Some("medium")),
    queryParam("bandwidth_capacity_gbps", "integer", false, Some(10)),
    queryParam("expected_latency_seconds", "number", false, Some(1.0)),
    queryParam("simple_statements", "integer", false, Some(0)),
    queryParam("medium_statements", "integer", false, Some(0)),
    queryParam("complex_statements", "integer", false, Some(0)),
    queryParam("worker_node_memory_gb", "number", false, Some(2.0)),
    queryParam("worker_node_cpu_max", "integer", false, Some(8)),
    queryParam("nb_worker_nodes", "integer", false, Some(3)),
    queryParam("worker_node_type", "string", false, Some("bare_metal")),
    queryParam("worker_node_t_size", "string", false),
  )

  private def pathParam(name: String): Map[String, Any] =
    Map("name" -> name, "in" -> "path", "required" -> true,
      "schema" -> schema("string"))

  private val inputBody = Map("required" -> true, "content" -> Map(
    "application/json" -> Map("schema" -> ref("EstimationInput"))))

  private val resultResponse = Map("200" -> Map(
    "description" -> "Successful Response",
    "content" -> Map("application/json" -> Map(
      "schema" -> ref("EstimationResult")))))

  val document: Map[String, Any] = Map(
    "openapi" -> "3.1.0",
    "info" -> Map(
      "title" -> "Flink Resource Estimator",
      "description" -> "Tool to estimate Flink cluster resources based on workload parameters",
      "version" -> "0.1.0"),
    "paths" -> Map(
      "/health" -> Map("get" -> op("Health check")),
      "/" -> Map("get" -> htmlOp("Home page with navigation tiles")),
      "/estimation-form" -> Map("get" -> htmlOp(
        "Estimation form page; query string pre-fills fields")),
      "/considerations" -> Map("get" -> htmlOp("Considerations/guide page")),
      "/saved" -> Map("get" -> htmlOp("Saved estimations page")),
      "/estimate" -> Map("post" -> htmlOp(
        "Form flow: estimate and render the results page")),
      "/api/estimate" -> Map(
        "get" -> op("Estimate via query parameters",
          "parameters" -> apiEstimateGetParams,
          "responses" -> resultResponse),
        "post" -> op("Estimate via JSON EstimationInput body",
          "requestBody" -> inputBody,
          "responses" -> resultResponse)),
      "/save-estimation" -> Map("post" -> htmlOp(
        "Form flow: estimate, save, render results with message")),
      "/api/save-estimation" -> Map("post" -> op(
        "Save an estimation from a JSON EstimationInput body",
        "requestBody" -> inputBody)),
      "/download/{filename}" -> Map("get" -> op("Download a saved estimation",
        "parameters" -> Seq(pathParam("filename")))),
      "/delete-estimation/{filename}" -> Map("delete" -> op(
        "Delete a saved estimation (400 on traversal, 404 on missing)",
        "parameters" -> Seq(pathParam("filename")))),
      "/reload/{filename}" -> Map("get" -> op(
        "Reload a saved estimation onto the results page",
        "parameters" -> Seq(pathParam("filename")))),
      "/saved-estimations" -> Map("get" -> op(
        "List saved estimations as {success, files, count}")),
      "/openapi.json" -> Map("get" -> op("This document")),
      "/docs" -> Map("get" -> htmlOp("Human-readable API documentation")),
    ),
    "components" -> Map("schemas" ->
      (resultSchemas + ("EstimationInput" -> estimationInputSchema))),
  )

  /** The serialized document — computed once; the route handler serves it. */
  lazy val json: String = {
    val mapper = new ObjectMapper().registerModule(DefaultScalaModule)
    mapper.writeValueAsString(document)
  }
}
