package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native IVF assignment kernel: differential agreement with the
  * declarative struct-array argmin it replaced (including tie-breaks),
  * null-element semantics, and codegen presence.
  */
class NearestCellLongSpec extends AnyFunSuite with SparkTestSession {

  // 4 centroids in 3 dims: three symmetric axis centroids (tie fodder) + one off-axis
  private val centroids: Seq[Seq[Long]] =
    Seq(Seq(10L, 0L, 0L), Seq(0L, 10L, 0L), Seq(0L, 0L, 10L), Seq(7L, 7L, 7L))
  private val norms: Seq[Long] = centroids.map(c => c.map(x => x * x).sum)

  private def nativeCell = NearestCellLong(
    col("v"), typedLit(centroids), typedLit(norms))

  /** The pre-r5 formulation: argmin via lexicographic struct min. */
  private def structCell = {
    val scores = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        (lit(norms(i)) - lit(2L) * DotProductLong(col("v"), typedLit(c))).as("d"),
        lit(i).as("cell"))
    }
    array_min(array(scores: _*)).getField("cell")
  }

  test("agrees with the declarative struct-min argmin on a vector sweep") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val vecs = (0 until 500).map(i =>
      (i.toLong, Seq.fill(3)(rng.nextLong() % 20)))
    val rows = vecs.toDF("id", "v")
      .withColumn("native", nativeCell)
      .withColumn("declarative", structCell)
      .collect()
    rows.foreach(r => assert(r.getInt(2) == r.getInt(3),
      s"id ${r.getLong(0)}: native ${r.getInt(2)} != struct ${r.getInt(3)}"))
  }

  test("ties break toward the lower cell index in both formulations") {
    import spark.implicits._
    // (0,0,0): all three axis centroids tie at d=100 (c3 is 147) — index 0
    // must win; (5,5,0): c0 and c1 tie at d=0 (c2=100, c3=7) — index 0 wins
    val rows = Seq((1L, Seq(0L, 0L, 0L)), (2L, Seq(5L, 5L, 0L)))
      .toDF("id", "v")
      .withColumn("native", nativeCell)
      .withColumn("declarative", structCell)
      .collect()
    rows.foreach { r =>
      assert(r.getInt(2) == 0 && r.getInt(3) == 0, r)
    }
  }

  test("null vector yields null; null elements contribute zero") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some(Seq(Some(10L), None, Some(0L)))),
      (2L, Option.empty[Seq[Option[Long]]]))
      .toDF("id", "v")
      .withColumn("cell", nativeCell)
      .collect().sortBy(_.getLong(0))
    // (10, _, 0) with the null skipped: dot with c0 = 100 -> d0 = -100, best
    assert(rows(0).getInt(2) == 0)
    assert(rows(1).isNullAt(2))
  }

  test("stays inside whole-stage codegen") {
    // a local Seq would be constant-folded to a LocalTableScan; use a real
    // parquet scan so a codegen stage exists to inspect
    // plain Cast, not a transform() lambda: higher-order functions are
    // CodegenFallback and would drag the collapsed projection out of
    // codegen, failing the assertion for reasons unrelated to this kernel
    val emb = graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("v", expr("slice(cast(embedding AS ARRAY<BIGINT>), 1, 3)"))
    val plan = emb.select(nativeCell.as("cell"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[nearest_cell_long.*"), plan)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = NearestCellLong(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("v")),
      org.apache.spark.sql.graft.ColumnBridge.expression(typedLit(centroids)),
      org.apache.spark.sql.graft.ColumnBridge.expression(typedLit(norms)))
    assert(!e.isInstanceOf[CodegenFallback])
  }
}
