package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, pmod, xxhash64}

/** Partitioned-parquet sink utilities: the write-side discipline that makes
  * 100 TB readable. Two failure modes this prevents:
  *
  *  1. Small-files explosion: `partitionBy` alone makes EVERY task open a
  *     writer for EVERY partition value it sees — tasks x values files.
  *     Repartitioning by the partition columns first routes each value to
  *     one task (plus `filesPerPartition` salt buckets when one value is
  *     huge), so file count is O(values x filesPerPartition).
  *  2. Unbounded file sizes: `maxRecordsPerFile` caps the rows per file, so
  *     a skewed partition value rolls into N bounded files instead of one
  *     multi-GB file that a downstream scan cannot split (parquet splits at
  *     row-group boundaries; a single huge row group is one task forever —
  *     the testdata's own single-row-group layout demonstrates the cost).
  *
  * Readback earns partition pruning: a filter on the partition column
  * becomes a directory-listing PartitionFilter (zero data read for pruned
  * values) — asserted at the plan level in SinksSpec.
  */
object Sinks {

  /** Write `df` as partitioned parquet with bounded file count and size.
    *
    * @param filesPerPartition salt width: tasks writing each partition
    *        value (raise for skewed/huge values so the write parallelizes)
    * @param maxRecordsPerFile row cap per output file */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      filesPerPartition: Int = 1,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val pcols = partitionCols.map(col)
    // deterministic salt: same row -> same bucket (idempotent retries)
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), org.apache.spark.sql.functions.lit(filesPerPartition.toLong)))
    salted
      .repartition((pcols :+ col("__salt")): _*)
      .drop("__salt")
      .write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
  }
}
