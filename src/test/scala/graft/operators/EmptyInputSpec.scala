package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Engine robustness net: EVERY catalog query must run on an all-empty
  * corpus (zero-row tables, real schemas) without throwing — an engine
  * library meets empty partitions, empty filters, and freshly-created
  * tables constantly, and "crashes on empty input" is the classic
  * iterative/stateful-operator bug (q56's label-sum NPE was exactly this
  * class). Aggregates may return 0 or 1 rows; pair/row emitters must
  * return 0.
  */
class EmptyInputSpec extends AnyFunSuite with SparkTestSession {

  private lazy val emptyDir: String = {
    val src = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      val schema = spark.read.parquet(s"$src/$t.parquet").schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  // q21/q121/q123/q127 (estimator sweep + kernel passes + TM fixpoint +
  // greedy placement) and q34 (run-store listing) source their own
  // scenario/store data, not the corpus — empty-corpus runs are identical
  // to normal runs for them and exercised elsewhere.
  // q113 emits its FIXED 6-row (kind x split pair) audit shape with zero
  // counts by design — the DuckDB oracle produces the same 6 zero rows on
  // an empty corpus, so the rows are the audit's constant frame, not
  // invented data.
  private val exempt =
    Set("q21_estimator_sweep", "q121_kernel_passes", "q123_tm_fixpoint",
      "q127_greedy_placement", "q34_saved_runs_list", "q113_split_leakage")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (n, _) => exempt(n) }
    .foreach { case (name, fn) =>
      test(s"$name runs on an all-empty corpus") {
        val rows = fn(spark, emptyDir).collect()
        assert(rows.length <= 1, s"$name emitted ${rows.length} rows from nothing")
      }
    }
}
