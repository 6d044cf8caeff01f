package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table utilities: pre-shuffle once at write time so repeated
  * fact-fact joins and aggregations on the bucket key run with ZERO
  * exchanges — the dominant cost lever for a 100 TB fact table that is
  * joined on the same key by every downstream query.
  *
  * Uses Spark's built-in (non-Hive) catalog: `bucketBy(n, key).sortBy(key)`
  * + saveAsTable; readers that join two tables bucketed the same way get
  * a SortMergeJoin with no ShuffleExchange on either side.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and sorted) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Join two same-bucketed tables on their bucket keys — the plan this
    * produces is the point: SortMergeJoin with both exchanges elided. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).alias("l")
    val r = spark.table(rightTable).alias("r")
    l.join(r, col(s"l.$leftKey") === col(s"r.$rightKey"))
  }
}
