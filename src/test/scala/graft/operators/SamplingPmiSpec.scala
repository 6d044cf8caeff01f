package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins for q96 (weighted priority sampling) and q97 (adjacent-pair PMI):
  * both must equal a direct driver-side recomputation from the raw
  * corpus — the engine's distributed top-K / census plans may not change
  * a single selected row or value. */
class SamplingPmiSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q96 equals a driver-side priority-sampling recomputation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs.map { case (id, w) =>
      val u = java.lang.Long.parseLong(md5Hex(id.toString).take(8), 16)
      (id, w, u, w.toDouble * 4294967296.0 / (u + 1))
    }.sortBy { case (id, _, _, p) => (-p, id) }.take(100)
    val got = AnalyticsQueries.q96PrioritySample(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === expected.length)
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"rank ${i + 1}")
    }
  }

  test("q96 is weight-biased: the sample over-represents heavy docs") {
    import org.apache.spark.sql.functions._
    val all = Tables.documents(spark, dir)
      .filter(col("text").isNotNull && col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampled = AnalyticsQueries.q96PrioritySample(spark, dir)
      .agg(avg(col("weight"))).collect().head.getDouble(0)
    assert(sampled > all, s"sample mean $sampled should exceed corpus mean $all")
  }

  test("q97 equals a driver-side PMI recomputation") {
    import org.apache.spark.sql.functions._
    val texts = Tables.documents(spark, dir).filter(col("text").isNotNull)
      .select("text").collect().map(_.getString(0))
    val pairs = texts.flatMap { t =>
      val toks = t.split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Nil else toks.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val cp = pairs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val ca = cp.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cb = cp.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val nn = cp.values.sum
    val expected = cp.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log(c.toDouble * nn / (ca(a).toDouble * cb(b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, pmi)
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(200)
    val got = TextQueries.q97PmiPairs(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === expected.toSeq)
  }
}
