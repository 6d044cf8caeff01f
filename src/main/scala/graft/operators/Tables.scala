package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided TPC-H-ish testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `dir` (e.g. /root/testdata/sf0.01).
  * Reads are plain `spark.read.parquet` so Catalyst's DataSource V2 path gives
  * predicate pushdown + column pruning for free; callers must NOT cache here —
  * at 100 TB these are scans, and the per-query plan decides what to prune.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Sessions set spark.sql.legacy.parquet.nanosAsLong=true (see
    * [[Sessions.tune]]); here the raw nanos come back as LongType and are
    * floor-divided to micros (integer arithmetic — a double division would
    * lose precision above 2^53 ns; DIV alone truncates toward zero, which
    * for pre-epoch negative nanos would round UP while DuckDB's
    * TIMESTAMP_NS->TIMESTAMP cast floors — ADVICE r1) to rebuild a
    * TimestampType column aligned with the oracle. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = apply(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        timestamp_micros(expr("ts DIV 1000 + (CASE WHEN ts % 1000 < 0 THEN -1 ELSE 0 END)")))
      // TIMESTAMP-NTZ is what DuckDB/pandas write by default — the most
      // common externally-produced events shape. Sessions pin the session
      // zone to UTC, so the cast is a value-identity re-tag and every
      // downstream unix_micros/window agrees with the oracle's own read.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
