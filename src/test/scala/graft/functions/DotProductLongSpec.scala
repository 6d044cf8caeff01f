package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native dot-product expression: agreement with the higher-order
  * equivalent, null semantics, SQL registration, and codegen presence.
  */
class DotProductLongSpec extends AnyFunSuite with SparkTestSession {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (2L, Seq(-1L, 0L, 7L), Seq(2L, 9L, 3L)),
      (3L, Seq(0L, 0L, 0L), Seq(1L, 1L, 1L)),
    ).toDF("id", "a", "b")
  }

  test("matches the higher-order aggregate(zip_with(...)) fold") {
    val rows = df
      .withColumn("native", DotProductLong(col("a"), col("b")))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
      .collect()
    rows.foreach(r => assert(r.getLong(3) == r.getLong(4), r))
    assert(rows.map(_.getLong(3)).toSeq == Seq(32L, 19L, 0L))
  }

  test("null array yields null; null elements contribute zero") {
    import spark.implicits._
    val d = Seq(
      (1L, Option(Seq(Option(2L), None)), Option(Seq(Option(3L), Option(5L)))),
      (2L, None: Option[Seq[Option[Long]]], Option(Seq(Option(1L)))),
    ).toDF("id", "a", "b")
    val out = d.withColumn("dot", DotProductLong(col("a"), col("b")))
      .orderBy(col("id")).collect()
    assert(out(0).getLong(3) == 6L)
    assert(out(1).isNullAt(3))
  }

  test("registered in SQL via SparkSessionExtensions") {
    df.createOrReplaceTempView("dots")
    val got = spark.sql(
      "SELECT id, dot_product_long(a, b) AS d FROM dots ORDER BY id")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(32L, 19L, 0L))
  }

  test("stays inside whole-stage codegen") {
    // a local Seq would be constant-folded to a LocalTableScan; use a real
    // parquet scan so a codegen stage exists to inspect
    val emb = graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("q", expr("transform(embedding, x -> cast(x AS BIGINT))"))
    val plan = emb.select(DotProductLong(col("q"), col("q")).as("d"))
      .queryExecution.executedPlan.toString
    // the * prefix marks operators inside a WholeStageCodegen stage
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_product_long.*"), plan)
    // and the expression itself reports codegen support
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = DotProductLong(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("a")),
      org.apache.spark.sql.graft.ColumnBridge.expression(col("b")))
    assert(!e.isInstanceOf[CodegenFallback])
  }

  test("type check rejects non-long arrays") {
    import spark.implicits._
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(DotProductLong(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array"))
  }
}
