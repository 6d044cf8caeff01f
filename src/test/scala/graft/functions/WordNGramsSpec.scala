package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential net for the native word-n-gram kernel: plain-Scala
  * reference, HOF-idiom equivalence over the real corpus, null semantics,
  * and codegen presence. */
class WordNGramsSpec extends AnyFunSuite with SparkTestSession {

  private def reference(text: String, n: Int): Seq[String] = {
    val w = text.split(" ", -1).toSeq
    if (w.length < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("matches the plain-Scala reference on edge-case strings, n = 1..4") {
    import spark.implicits._
    val cases = Seq("", " ", "  ", "a", "a b", "a b c d", "a  b", " a b ",
      "héllo wörld grüß gott", "你好 世界 x",
      "a b  c   d e", "trailing space ")
    for (n <- 1 to 4) {
      val got = cases.toDF("text")
        .select(col("text"), WordNGrams(col("text"), n).as("g"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
      cases.foreach { t =>
        assert(got(t) == reference(t, n), s"n=$n text='$t'")
      }
    }
  }

  test("agrees with the declarative HOF idiom over the real corpus") {
    val docs = graft.operators.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= 3)
    val native = docs.select(col("doc_id"), WordNGrams(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val hof = docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), expr(
        "transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3)))").as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(native.nonEmpty && native == hof)
  }

  test("null text yields null; short text yields an empty array") {
    import spark.implicits._
    val got = Seq((1L, "a b"), (2L, null: String)).toDF("id", "text")
      .select(col("id"), WordNGrams(col("text"), 3).as("g"))
      .collect().sortBy(_.getLong(0))
    assert(got(0).getSeq[String](1).isEmpty)
    assert(got(1).isNullAt(1))
  }

  test("stays inside whole-stage codegen") {
    val docs = graft.operators.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = docs.select(WordNGrams(col("text"), 3).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[word_ngrams.*"), plan)
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val e = WordNGrams(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("text")),
      org.apache.spark.sql.graft.ColumnBridge.expression(lit(3)))
    assert(!e.isInstanceOf[CodegenFallback])
  }
}
