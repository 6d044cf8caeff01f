package graft.plans

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dot-product rewrite rule: fires on the exact idiom, preserves
  * results, and declines near-misses.
  */
class RewriteDotProductSpec extends AnyFunSuite with SparkTestSession {

  /** Non-null-element ARRAY<BIGINT> columns from the embeddings table. */
  private def quantized = {
    graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> coalesce(cast(round(cast(x AS DOUBLE) * 1000, 0) AS BIGINT), 0L))")
        .as("q"))
  }

  test("the HOF idiom is rewritten to dot_product_long") {
    val df = quantized.select(expr(
      "aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dot_product_long"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewritten query returns the same values as the unoptimized fold") {
    import spark.implicits._
    // compute expectation driver-side, beyond the rule's reach
    val vs = graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val expected = vs.map { case (id, v) =>
      val q = v.map(x => math.round(x.toDouble * 1000))
      id -> q.map(x => x * x).sum
    }.toMap
    val got = quantized.select(col("vec_id"), expr(
      "aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("near-miss idioms are left alone") {
    // different seed (1L) — not a plain dot product
    val seeded = quantized.select(expr(
      "aggregate(zip_with(q, q, (x, y) -> x * y), 1L, (acc, v) -> acc + v)").as("d"))
    assert(!seeded.queryExecution.optimizedPlan.toString.contains("dot_product_long"))
    // addition lambda instead of multiply
    val sums = quantized.select(expr(
      "aggregate(zip_with(q, q, (x, y) -> x + y), 0L, (acc, v) -> acc + v)").as("d"))
    assert(!sums.queryExecution.optimizedPlan.toString.contains("dot_product_long"))
  }

  test("unequal-length arrays stay NULL through the rewrite (HOF parity)") {
    // zip_with pads the shorter array with nulls -> the fold nulls out;
    // the kernel alone would return a TRUNCATED dot product, so the
    // rewrite must guard on length equality. Parquet-backed so constant
    // folding can't collapse the plan before the assertion.
    val out = quantized
      .select(col("q").as("a"), expr("slice(q, 1, 3)").as("b"))
      .select(expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
    assert(out.queryExecution.optimizedPlan.toString.contains("dot_product_long"))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(0)),
      "HOF semantics: unequal lengths -> NULL")
  }

  test("ansi kernel fails loudly on Long overflow; legacy kernel wraps") {
    import spark.implicits._
    import org.apache.spark.sql.graft.ColumnBridge
    val df = Seq((Seq(Long.MaxValue), Seq(2L))).toDF("a", "b")
    def kernel(ansi: Boolean) = ColumnBridge.column(graft.functions.DotProductLong(
      ColumnBridge.expression(col("a")), ColumnBridge.expression(col("b")), ansi))
    val e = intercept[Throwable] { df.select(kernel(ansi = true)).collect() }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(
        x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.toLowerCase.contains("overflow")), chain(e).mkString(" | "))
    assert(df.select(kernel(ansi = false)).collect().head.getLong(0) == -2L)
  }

  test("nullable-element arrays are not rewritten (semantics differ)") {
    // transform without coalesce: elements stay nullable
    val nullable = graft.operators.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(expr("transform(embedding, x -> cast(x AS BIGINT))").as("q"))
      .select(expr(
        "aggregate(zip_with(q, q, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("d"))
    assert(!nullable.queryExecution.optimizedPlan.toString.contains("dot_product_long"))
  }
}
