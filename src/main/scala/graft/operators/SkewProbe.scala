package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cheap hot-key probe that auto-switches the skew-safe formulations
  * (VERDICT r6 next-round #6): instead of asking the operator caller to
  * know their corpus ("set `spark.graft.spans.skewSafe=true` if a license
  * header might be everywhere"), a one-job sample census decides at plan
  * time whether the window form (one shuffle, but a hot key lands whole in
  * one AQE-unsplittable window partition) or the census+rejoin form
  * (map-side partials + AQE skew-join splitting, at the cost of shuffling
  * the stream twice) is the right plan.
  *
  * Criterion — mirrors AQE's own `skewedPartitionFactor` logic, scaled to
  * keys: the top key is HOT when its (sampled) row count would exceed
  * `factor` fair partition shares, i.e. `top * shufflePartitions >= factor
  * * totalRows`, with an absolute floor `minTopRows` so a handful of
  * sampled rows never triggers the switch. This is partition-relative on
  * purpose: a key with 10k rows is skew on a 32-partition local run and
  * noise on a 20k-partition cluster where each reducer holds millions of
  * rows — a fixed row-share threshold can't express both.
  *
  * Cost: one narrow job over a `sampleFraction` sample of the KEY column
  * only (callers sample the *input docs* BEFORE any explode, so the heavy
  * per-doc kernel work also runs on the sample), one collapsed groupBy
  * (map-side partials absorb the hot key), a 2-value aggregate. No full
  * shuffle, no full scan beyond the sampled fraction's lineage.
  */
object SkewProbe {
  private[graft] val FractionKey = "spark.graft.skew.sampleFraction"
  private[graft] val FactorKey = "spark.graft.skew.partitionFactor"
  private[graft] val MinTopKey = "spark.graft.skew.minTopRows"
  /** The doc-sample fraction callers apply BEFORE key extraction. */
  def sampleFraction(spark: org.apache.spark.sql.SparkSession): Double =
    spark.conf.get(FractionKey, "0.05").toDouble

  /** Content-keyed doc sample — the md5-mod discipline every sampling
    * operator in the catalog follows, NOT a seeded `.sample` (Bernoulli
    * draws are keyed by (seed, partitionIndex), so re-sharding the same
    * corpus changes the sample and can flip the auto-chosen plan between
    * environments; a hash of the key column picks the same rows under any
    * file or partition layout). Keeps rows whose key hashes into the
    * first `fraction` of 10k buckets; fraction >= 1 keeps everything. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(pmod(xxhash64(col(keyCol)), lit(10000L)) <
      lit(math.round(fraction * 10000)))

  /** True when the most frequent key of the (pre-sampled) one-column frame
    * would overload a window/join partition at the session's shuffle
    * parallelism. */
  def hasHotKey(keys: DataFrame): Boolean = {
    val spark = keys.sparkSession
    val factor = spark.conf.get(FactorKey, "4").toLong
    val minTop = spark.conf.get(MinTopKey, "20").toLong
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "200").toLong
    val k = keys.columns.head
    val row = keys
      .groupBy(col(k)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top"), sum(col("c")).as("n"))
      .head()
    if (row.isNullAt(0) || row.isNullAt(1)) false // empty sample: no signal
    else {
      val top = row.getLong(0)
      val n = row.getLong(1)
      top >= minTop && top * parts >= factor * n
    }
  }

  /** Resolve a three-valued skew-safe conf: `"true"`/`"false"` are
    * explicit operator pins (the 100 TB escape hatch stays available);
    * `"auto"` runs `probe` — by-name, so explicit settings pay nothing. */
  def resolve(spark: org.apache.spark.sql.SparkSession, confKey: String,
      default: String)(probe: => Boolean): Boolean =
    spark.conf.get(confKey, default) match {
      case "auto" => probe
      case v => v.toBoolean
    }
}
