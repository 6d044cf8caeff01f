package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the exact-global-rank helper: on random data under a
  * strict total order, withGlobalRank must equal `row_number()` over the
  * global window it replaces — at shuffle-partition counts 1, 7, and 200
  * (partition boundaries must never leak into ranks). */
class GlobalRankSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def randomDf(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // duplicate-heavy sort values force the tiebreaker to matter
    (0L until 5000L).map(i => (i, rnd.nextInt(50), rnd.nextDouble()))
      .toDF("id", "grp", "v")
  }

  test("rank equals the global-window row_number at partitions 1, 7, 200") {
    import org.apache.spark.sql.expressions.Window
    val df = randomDf(42)
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("grp").asc, col("id").asc)).cast("long"))
      .select(col("id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (p <- Seq("1", "7", "200")) {
        spark.conf.set("spark.sql.shuffle.partitions", p)
        val (ranked, n) = GlobalRank.withGlobalRank(df, "rank",
          Seq(col("grp").asc, col("id").asc))
        val got = ranked.select(col("id"), col("rank"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(n === 5000L, s"partitions=$p")
        assert(got === want, s"partitions=$p")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("descending keys and mixed directions rank correctly") {
    import org.apache.spark.sql.expressions.Window
    val df = randomDf(7)
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("v").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (ranked, n) = GlobalRank.withGlobalRank(df, "rank",
      Seq(col("v").desc, col("id").asc))
    val got = ranked.select(col("id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n === 5000L)
    assert(got === want)
  }

  test("empty input yields an empty frame and zero total") {
    val (ranked, n) = GlobalRank.withGlobalRank(
      Seq.empty[(Long, Int)].toDF("id", "v"), "rank", Seq(col("v").asc, col("id").asc))
    assert(n === 0L)
    assert(ranked.count() === 0L)
  }
}
