package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CUBE/PIVOT/sampling/map-fn semantics beyond the DuckDB gate. */
class AnalyticsSpec extends AnyFunSuite with SparkTestSession {
  private val dir = "/root/testdata/sf0.001"

  test("cube emits all four grouping sets consistently") {
    val rows = AnalyticsQueries.q48Cube(spark, dir).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = grand.head.getLong(2)
    // each grouping set partitions the same row universe
    val byStatus = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
    val byPrio = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum
    val byBoth = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum
    assert(byStatus == total && byPrio == total && byBoth == total)
  }

  test("pivot columns reconcile with the plain group-by") {
    val pivoted = AnalyticsQueries.q49Pivot(spark, dir).collect()
      .map(r => r.getString(0) -> (1 to 5).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum)
      .toMap
    val plain = Tables.orders(spark, dir).groupBy(col("o_orderstatus")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pivoted == plain)
  }

  test("hash-mod sampling is deterministic and near the per-stratum targets") {
    val a = AnalyticsQueries.q50StratifiedSample(spark, dir).collect().map(_.toSeq)
    val b = AnalyticsQueries.q50StratifiedSample(spark, dir).collect().map(_.toSeq)
    assert(a.sameElements(b), "same data, same sample — always")
    val rates = a.map(r => r(0).asInstanceOf[String] ->
      r(2).asInstanceOf[Long].toDouble / r(1).asInstanceOf[Long]).toMap
    val targets = Map("A" -> 12.0 / 256, "N" -> 25.0 / 256, "R" -> 51.0 / 256)
    targets.foreach { case (k, t) =>
      assert(math.abs(rates(k) - t) < 0.04, s"stratum $k rate ${rates(k)} vs target $t")
    }
  }

  test("map functions agree with the struct-schema twin on sum_k") {
    val viaMap = AnalyticsQueries.q51MapFns(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val viaStruct = Tables.events(spark, dir)
      .withColumn("p", from_json(col("props"), lit("k INT")))
      .groupBy(col("event_type")).agg(sum(col("p.k")).cast("long").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMap == viaStruct)
  }
}
