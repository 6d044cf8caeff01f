package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact 1-based global rank WITHOUT a single-partition window — the
  * scale-safe replacement for `row_number().over(Window.orderBy(...))`,
  * which funnels every row through ONE task (the q94-r8 scale bug
  * PlanInvariantSpec permanently rejects).
  *
  * Shape (extracted from q94, VERDICT r9 #9): range-partition on the sort
  * keys + sort within partitions + per-partition `row_number` (a
  * PARTITIONED window) + a partition-offset broadcast join. The only
  * driver traffic is the per-partition row-count collect — ≤
  * `spark.sql.shuffle.partitions` rows, config-bounded like the IVF
  * codebook collects — so the operator works at any corpus scale while
  * returning EXACTLY the ranks the global window would.
  *
  * Contract:
  *   - `keys` must define a STRICT total order (pass a unique tiebreaker,
  *     e.g. the primary key, last) — under ties the per-partition
  *     row_number is partitioning-dependent, same as a global window's
  *     tie behavior being sort-instability-dependent.
  *   - Sort direction travels inside the Columns (`col("x").desc`); the
  *     same expressions drive the range partitioner, the local sort, and
  *     the local window, so they can never disagree.
  *   - EAGER: the input is [[Materialize]]d (the offsets cannot be known
  *     without running the partitioning) — the q94/q101 catalog
  *     eagerness note applies to every caller.
  *
  * Returns the input frame with `rankCol` added, plus the total row
  * count (free from the offsets collect; q94 sizes its terciles with it).
  *
  * The column names `__pid`/`__rn`/`__off` are RESERVED working columns:
  * an input frame already carrying one of them would be silently
  * overwritten by `withColumn` and then deleted by the final `drop`, so
  * the operator rejects such inputs up front (ADVICE r10).
  */
object GlobalRank {

  private val Reserved = Seq("__pid", "__rn", "__off")

  def withGlobalRank(df: DataFrame, rankCol: String, keys: Seq[Column])
      : (DataFrame, Long) = {
    import org.apache.spark.sql.expressions.Window
    val clash = df.columns.toSet.intersect(Reserved.toSet + rankCol)
    require(clash.isEmpty,
      s"withGlobalRank: input schema contains reserved/output column(s) ${clash.mkString(", ")} " +
        s"(${Reserved.mkString("/")} are internal working names; rename before calling)")
    val spark = df.sparkSession
    import spark.implicits._
    val parted = Materialize.materialize(
      df.repartitionByRange(keys: _*)
        .sortWithinPartitions(keys: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__pid")).orderBy(keys: _*))))
    val partCounts = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val n = partCounts.map(_._2).sum
    val offsets = partCounts.map(_._1)
      .zip(partCounts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val out = parted
      .join(broadcast(offsets.toDF("__pid", "__off")), "__pid")
      .withColumn(rankCol, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
    (out, n)
  }
}
