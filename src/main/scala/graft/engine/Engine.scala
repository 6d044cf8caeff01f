package graft.engine

import graft.core._
import graft.kernel.Estimator
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One sizing outcome of a sweep row: exactly one of `result` / `error` is
  * set. Mirrors the reference's HTTP semantics (200 result vs 400/500 error,
  * /root/reference/src/main.py:267-283) as data, so a 10^9-row sweep routes
  * failures to a rejects sink instead of killing the job.
  */
final case class EstimationOutcome(
    input: EstimationInput,
    result: Option[EstimationResult],
    error: Option[String],
) {
  def ok: Boolean = result.isDefined
}

/** Spark bindings for the sizing kernel (SURVEY.md §3: one scenario and 10^9
  * scenarios share one code path).
  *
  * The kernel is a deterministic per-row function, so the sweep is a single
  * narrow `map` — embarrassingly parallel, no shuffle at any scale; Catalyst
  * sees a typed DeserializeToObject/MapElements/SerializeFromObject pipeline.
  * Validation runs inside the same map (not a separate pass) so each row is
  * touched once.
  */
object Engine {

  /** Validate + estimate one scenario — the `POST /api/estimate` semantics
    * (main.py:274-283): validation failures come back as the error channel,
    * estimation failures (impossible placement, overflow) likewise.
    */
  def estimateOne(in: EstimationInput): EstimationOutcome = {
    val outcome = Validation.validate(in) match {
      case Left(errs) => EstimationOutcome(in, None, Some(errs.mkString("; ")))
      case Right(normalized) =>
        Estimator.estimate(normalized) match {
          case Left(err)  => EstimationOutcome(in, None, Some(err))
          case Right(res) => EstimationOutcome(in, Some(res), None)
        }
    }
    // A22 parity: FLINK_ESTIMATOR_DEBUG dumps each outcome (reference
    // estimation.py:400-403); stderr so driver JSON parsing stays clean.
    // Value-checked like the reference — FLINK_ESTIMATOR_DEBUG=0/false
    // must stay silent, not flood a sweep's executor logs.
    if (debugEnabled) System.err.println(outcome)
    outcome
  }

  private lazy val debugEnabled: Boolean =
    Set("1", "true", "yes").contains(
      sys.env.getOrElse("FLINK_ESTIMATOR_DEBUG", "").trim.toLowerCase)

  /** The scenario sweep: Dataset in, Dataset of outcomes out. Narrow map,
    * no shuffle; scales linearly with executor count.
    */
  def sweep(scenarios: Dataset[EstimationInput]): Dataset[EstimationOutcome] = {
    val spark = scenarios.sparkSession
    import spark.implicits._
    scenarios.map(estimateOne)
  }

  /** Successful results only (the common sweep consumer). */
  def sweepResults(scenarios: Dataset[EstimationInput]): Dataset[EstimationResult] = {
    val spark = scenarios.sparkSession
    import spark.implicits._
    scenarios.flatMap(in => estimateOne(in).result)
  }

  /** Rejected rows with their reasons — the 400/422 path as a Dataset. */
  def sweepRejects(scenarios: Dataset[EstimationInput]): Dataset[(EstimationInput, String)] = {
    val spark = scenarios.sparkSession
    import spark.implicits._
    scenarios.flatMap(in => estimateOne(in).error.map(e => (in, e)))
  }

  /** Register `flink_estimate(struct(...))` for SQL access: takes a struct
    * column shaped like EstimationInput, returns the full nested
    * EstimationResult struct (NULL on validation/sizing failure — SQL callers
    * test `flink_estimate(s) IS NULL` for the reject path; use
    * `flink_estimate_error` for the reason).
    *
    * A Scala UDF is an optimization barrier, but the kernel consumes one
    * 16-scalar row and returns one struct — there is nothing for Catalyst to
    * optimize through (SURVEY §4).
    */
  def registerUdfs(spark: SparkSession): Unit = {
    // Row-based UDFs, not typed-case-class ones: Spark cannot DECODE a
    // NULL struct into a case class with primitive fields (an outer join
    // produces exactly that shape — EXPRESSION_DECODING_FAILED before the
    // lambda ever runs), so the null check must happen on the Row. A null
    // input struct returns NULL, per the documented IS-NULL reject path.
    val resultType = org.apache.spark.sql.Encoders.product[EstimationResult].schema
    spark.udf.register("flink_estimate",
      new org.apache.spark.sql.api.java.UDF1[org.apache.spark.sql.Row, Any] {
        override def call(r: org.apache.spark.sql.Row): Any =
          if (r == null) null else estimateOne(rowToInput(r)).result.orNull
      }, resultType)
    spark.udf.register("flink_estimate_error",
      new org.apache.spark.sql.api.java.UDF1[org.apache.spark.sql.Row, String] {
        override def call(r: org.apache.spark.sql.Row): String =
          if (r == null) null else estimateOne(rowToInput(r)).error.orNull
      }, org.apache.spark.sql.types.StringType)
  }

  /** The `struct(s.*)` positional shape of [[EstimationInput]] — the same
    * field-order contract the typed encoder enforced. */
  private def rowToInput(r: org.apache.spark.sql.Row): EstimationInput =
    EstimationInput(
      project_name = r.getString(0),
      messages_per_second = r.getInt(1),
      avg_record_size_bytes = r.getInt(2),
      number_flink_applications = r.getInt(3),
      num_distinct_keys = r.getLong(4),
      data_skew_risk = r.getString(5),
      bandwidth_capacity_gbps = r.getInt(6),
      expected_latency_seconds = r.getDouble(7),
      simple_statements = r.getInt(8),
      medium_statements = r.getInt(9),
      complex_statements = r.getInt(10),
      worker_node_memory_mb = r.getDouble(11),
      worker_node_cpu_max = r.getInt(12),
      nb_worker_nodes = r.getInt(13),
      worker_node_type = r.getString(14),
      worker_node_t_size = Option(r.getAs[String](15)))

  /** Deterministic demo sweep grid (the driver's rows-only correctness entry):
    * crosses throughput x latency x statement mix x skew x node shape. 144
    * scenarios, all valid; a handful hit the VM-S placement-error path on
    * purpose (large state on small nodes), exercising the reject channel.
    */
  def demoGrid: Seq[EstimationInput] = {
    for {
      mps <- Seq(1000, 10000, 100000)
      lat <- Seq(0.5, 1.0, 5.0)
      (s, m, c) <- Seq((2, 1, 1), (1, 0, 0), (0, 2, 2), (5, 3, 2))
      skew <- Seq("low", "high")
      (tpe, tsize) <- Seq(("VM", Some("S")), ("bare_metal", None))
    } yield EstimationInput(
      project_name = s"grid mps=$mps lat=$lat s=$s m=$m c=$c skew=$skew node=${tsize.getOrElse("bm")}",
      messages_per_second = mps,
      avg_record_size_bytes = 512,
      num_distinct_keys = 1000000L,
      data_skew_risk = skew,
      expected_latency_seconds = lat,
      simple_statements = s,
      medium_statements = m,
      complex_statements = c,
      worker_node_type = tpe,
      worker_node_t_size = tsize,
    )
  }

  /** SparkEntry.queries entry for the B5 list pipeline: save a deterministic
    * demo corpus into a fresh temp store, then run the real Spark
    * scan-filter-project-sort over it (rows-only check: size/mtime columns
    * are machine-dependent by nature; structure is pinned by RunStoreSpec).
    */
  def savedRunsListQuery(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_runs").toString
    val store = new RunStore(spark, tmp)
    store.saveDemoRuns(8)
    store.list()
  }

  /** SparkEntry.queries entry: run the demo grid sweep and flatten headline
    * outputs to scalar columns (driver records a rows-only check — the
    * kernel itself is pinned value-exactly by the ScalaTest parity suite).
    */
  def sweepQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val outcomes = sweep(spark.createDataset(demoGrid))
    outcomes.select(
      col("input.project_name").as("project_name"),
      col("result.resource_estimates.total_memory_mb").as("total_memory_mb"),
      col("result.resource_estimates.total_cpus").as("total_cpus"),
      col("result.resource_estimates.total_worker_node_needed").as("nodes"),
      col("result.cluster_recommendations.taskmanagers.count").as("tm_count"),
      col("result.cluster_recommendations.taskmanagers.memory_mb_each").as("tm_memory_mb_each"),
      col("result.scaling_recommendations.recommended_parallelism").as("rec_parallelism"),
      col("result.scaling_recommendations.checkpointing_interval_ms").as("ckpt_ms"),
      col("error"),
    ).orderBy(col("project_name"))
  }
}
