package graft.engine

import graft.core.Validation
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Validation as pure Column predicates (SURVEY §1.1): the same rules as
  * [[graft.core.Validation.validate]], but evaluated inside whole-stage
  * codegen on a raw DataFrame — no case-class deserialization, so a 10^9-row
  * sweep validates at scan speed and routes rejects without ever throwing.
  *
  * Three consumption modes, mirroring the reference's HTTP semantics
  * (main.py:267-283):
  *  - [[withErrors]]: annotate every row with an `_errors` array (422 body);
  *  - [[partition]]: split into (valid-normalized, rejects) — the bulk path;
  *  - [[strict]]: `raise_error` on the first invalid row — fail-fast mode
  *    for pipelines that treat bad input as a bug.
  */
object ColumnValidation {

  /** (violation predicate, message) — message text matches Validation.
    *
    * Every predicate over a REQUIRED column folds in `isNull`: a raw frame
    * (spark.read.json of a sweep file) can carry nulls, and a bare
    * `null <= 0` evaluates to NULL, which `when(...)` drops — the row
    * would be classified VALID here and then crash downstream at
    * case-class deserialization ("Null value appeared in non-nullable
    * field"), the exact throw this class exists to route around. The only
    * genuinely Optional field is worker_node_t_size. Likewise
    * expected_latency_seconds checks `isnan`: Spark orders NaN above every
    * value so `NaN > 0` is true, while the scalar validator's Java
    * `NaN > 0` is false — NaN must reject in both. */
  val rules: Seq[(Column, String)] = {
    def c(name: String): Column = col(name)
    Seq(
      (c("project_name").isNull || length(c("project_name")) === 0,
        "project_name: must have at least 1 character"),
      (length(c("project_name")) > 100,
        "project_name: must have at most 100 characters"),
      (length(c("project_name")) > 0 && length(trim(c("project_name"))) === 0,
        "Project name cannot be empty or just whitespace"),
      (c("messages_per_second").isNull || c("messages_per_second") <= 0,
        "messages_per_second: must be greater than 0"),
      (c("avg_record_size_bytes").isNull || c("avg_record_size_bytes") <= 0,
        "avg_record_size_bytes: must be greater than 0"),
      (c("number_flink_applications").isNull || c("number_flink_applications") < 1,
        "number_flink_applications: must be >= 1"),
      (c("num_distinct_keys").isNull || c("num_distinct_keys") < 1,
        "num_distinct_keys: must be >= 1"),
      (c("data_skew_risk").isNull || !c("data_skew_risk").isin("low", "medium", "high"),
        "data_skew_risk: must be one of low|medium|high"),
      (c("bandwidth_capacity_gbps").isNull || c("bandwidth_capacity_gbps") <= 0,
        "bandwidth_capacity_gbps: must be greater than 0"),
      (c("expected_latency_seconds").isNull || isnan(c("expected_latency_seconds")) ||
        !(c("expected_latency_seconds") > 0),
        "expected_latency_seconds: must be greater than 0"),
      (c("simple_statements").isNull || c("simple_statements") < 0,
        "simple_statements: must be >= 0"),
      (c("medium_statements").isNull || c("medium_statements") < 0,
        "medium_statements: must be >= 0"),
      (c("complex_statements").isNull || c("complex_statements") < 0,
        "complex_statements: must be >= 0"),
      (c("worker_node_memory_mb").isNull || !(c("worker_node_memory_mb") > 0),
        "worker_node_memory_mb: must be greater than 0"),
      (c("worker_node_memory_mb") > 512 * 1024, "worker_node_memory_mb: must be <= 524288"),
      (c("worker_node_cpu_max").isNull ||
        c("worker_node_cpu_max") < 2 || c("worker_node_cpu_max") > 256,
        "worker_node_cpu_max: must be in [2, 256]"),
      (c("nb_worker_nodes").isNull || c("nb_worker_nodes") < 1,
        "nb_worker_nodes: must be >= 1"),
      (c("worker_node_type").isNull || !c("worker_node_type").isin("bare_metal", "VM"),
        "worker_node_type: must be one of bare_metal|VM"),
      (c("worker_node_t_size").isNotNull && !c("worker_node_t_size").isin("S", "M", "L"),
        "worker_node_t_size: must be one of S|M|L"),
      (c("worker_node_type") === "VM" && c("worker_node_t_size").isNull,
        "worker_node_t_size is required when worker_node_type is VM"),
    )
  }

  /** All violated rule messages per row, as `_errors ARRAY<STRING>`
    * (empty = valid). One codegen'd projection. */
  def withErrors(df: DataFrame): DataFrame =
    df.withColumn("_errors", array_compact(array(
      rules.map { case (violated, msg) => when(violated, lit(msg)) }: _*)))

  /** The Column form of the VM t-shirt rewrite + project-name trim
    * (Validation.applyTshirt / models.py:61-76). */
  private def normalize(df: DataFrame): DataFrame = {
    val isVm = col("worker_node_type") === "VM" && col("worker_node_t_size").isNotNull
    val (mem, cpu) = Validation.VmTshirtMbCpu.foldLeft(
      (col("worker_node_memory_mb"), col("worker_node_cpu_max"))) {
      case ((m, u), (size, (mb, cpus))) =>
        (when(isVm && col("worker_node_t_size") === size, lit(mb)).otherwise(m),
          when(isVm && col("worker_node_t_size") === size, lit(cpus)).otherwise(u))
    }
    df.withColumn("project_name", trim(col("project_name")))
      .withColumn("worker_node_memory_mb", mem)
      .withColumn("worker_node_cpu_max", cpu)
  }

  /** Bulk sweep split: (valid rows, normalized like the smart constructor;
    * reject rows carrying their `_errors`). Both frames share one scan —
    * Spark re-reads or caches as the consumer decides. */
  def partition(df: DataFrame): (DataFrame, DataFrame) = {
    val annotated = withErrors(df)
    val valid = normalize(annotated.filter(size(col("_errors")) === 0).drop("_errors"))
    val rejects = annotated.filter(size(col("_errors")) > 0)
    (valid, rejects)
  }

  /** Fail-fast mode: any invalid row kills the job with the rule message
    * (`when(...).otherwise(raise_error(...))` — the 400-as-exception path).
    * The guard is woven into a kept column (project_name) so column pruning
    * can never optimize the check away. */
  def strict(df: DataFrame): DataFrame = {
    val anyViolation = rules.map(_._1).reduce(_ || _)
    val firstMsg = coalesce(
      rules.map { case (violated, msg) => when(violated, lit(msg)) } :+
        lit("invalid input"): _*)
    normalize(df.withColumn("project_name",
      when(anyViolation, raise_error(firstMsg)).otherwise(col("project_name"))))
  }
}
