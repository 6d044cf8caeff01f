package graft.sources

import graft.core.EstimationInput
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Source constructors (SURVEY §2.C scan/source row): schema-explicit batch
  * readers live in [[graft.operators.Tables]]; this module adds the
  * streaming sources — file-replay of the events table (the Kafka stand-in
  * in a zero-egress environment: same micro-batch semantics, different
  * connector string in production) and scenario streams for the estimator
  * surface.
  */
object Sources {

  /** The events table's schema, declared once for streaming reads (a
    * streaming source cannot infer schemas). */
  val eventsDdl: String =
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  /** File-replay stream over parquet event files in `dir`: each discovered
    * file becomes micro-batch input — the standard backfill/replay source.
    * `maxFilesPerTrigger 1` paces the replay so windows/watermarks advance
    * the way they would on a live stream. */
  def eventsFileStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsDdl)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)

  /** Turn any streaming frame with a BIGINT `value` column (rate source,
    * MemoryStream of longs, a Kafka offset feed) into a deterministic
    * scenario-per-row stream for the estimation engine: the streaming form
    * of the reference's request flow (SURVEY §1.1 "Streams"), to be
    * consumed by [[graft.engine.Engine.sweep]] — the same narrow map runs
    * unchanged on a streaming Dataset. */
  def scenarioStream(raw: DataFrame): Dataset[EstimationInput] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col("value").cast("long")).as[Long].map { n =>
      EstimationInput(
        project_name = s"stream scenario $n",
        messages_per_second = (1000 + (n % 100) * 500).toInt,
        avg_record_size_bytes = (256 << (n % 4)).toInt,
        num_distinct_keys = 100000L * (1 + n % 50),
        data_skew_risk = Seq("low", "medium", "high")((n % 3).toInt),
        expected_latency_seconds = Seq(0.5, 1.0, 5.0)((n % 3).toInt),
        simple_statements = (n % 5).toInt,
        medium_statements = (n % 3).toInt,
        complex_statements = (n % 2).toInt,
        worker_node_type = "VM",
        worker_node_t_size = Some(Seq("S", "M", "L")((n % 3).toInt)))
    }
  }

  /** Live synthetic scenario stream off the rate source (rowsPerSecond
    * scenarios/s) — the demo feed for a continuously-sizing deployment. */
  def rateScenarios(spark: SparkSession, rowsPerSecond: Int): Dataset[EstimationInput] =
    scenarioStream(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond.toString).load())

  /** Encoder-backed schema, exported for sinks that need it. */
  val scenarioSchema = Encoders.product[EstimationInput].schema
}
