package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode net: the catalog must handle multi-byte text (CJK, emoji,
  * combining diacritics) — every 5th document's text gets a multi-byte
  * prefix. Guards the hashing loops' byte/char assumptions (md5 over
  * explicit UTF-8 bytes, char-indexed gram windows, whitespace splits on
  * multi-byte words). Contract: no crash, deterministic output.
  */
class UnicodeInputSpec extends AnyFunSuite with SparkTestSession {

  private lazy val uniDir: String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_uni").toString
    val prefix = "日本語 テキスト émojis 🎉🚀 and ñ combining é́ "
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val mutated =
        if (t == "documents")
          df.withColumn("text",
            when(col("doc_id") % 5 === 0, concat(lit(prefix), col("text")))
              .otherwise(col("text")))
        else df
      mutated.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private val exempt = Set("q21_estimator_sweep", "q34_saved_runs_list")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (n, _) => exempt(n) }
    .foreach { case (name, fn) =>
      test(s"$name handles multi-byte text deterministically") {
        val a = fn(spark, uniDir).collect()
        val b = fn(spark, uniDir).collect()
        assert(a.toSeq == b.toSeq, s"$name nondeterministic on unicode corpus")
      }
    }
}
