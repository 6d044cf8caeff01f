package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-tolerance net: the catalog must survive NULLs in nullable payload
  * columns. Declarative plans inherit SQL null semantics for free, but the
  * typed hot loops (shingling, simhash, media encode) see raw values — a
  * null String NPEs a mapPartitions unless the operator guards it. The
  * corpus here is sf0.001 with every 7th document's text/lang and every
  * 7th event's props/event_type nulled; the contract is "no crash, and
  * null docs behave like absent docs", not value parity (the driver gate
  * pins values on the null-free corpus).
  */
class NullInputSpec extends AnyFunSuite with SparkTestSession {

  private lazy val nullDir: String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_nulls").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val mutated = t match {
        case "documents" => df
          .withColumn("text", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("text")))
          .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null)).otherwise(col("lang")))
        case "events" => df
          .withColumn("props", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("props")))
          .withColumn("event_type", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("event_type")))
        case _ => df
      }
      mutated.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private val exempt = Set("q21_estimator_sweep", "q34_saved_runs_list")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (n, _) => exempt(n) }
    .foreach { case (name, fn) =>
      test(s"$name tolerates nulls in payload columns") {
        fn(spark, nullDir).collect() // contract: no crash
      }
    }
}
