package graft.operators

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Meta-property over the whole catalog: every query entry is
  * run-to-run deterministic (collected rows identical across two
  * executions at sf0.001). The oracle gate can't see nondeterminism that
  * happens to hash equal per run — this does.
  */
class CatalogDeterminismSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  /** q34 lists freshly-saved files: its modified_time/size columns are
    * wall-clock-dependent by nature, so compare its stable columns only. */
  private val unstableColumns = Map("q34_saved_runs_list" -> Set("modified_time", "size_bytes"))

  test("Bench families partition the query catalog exactly") {
    // the forked bench mode times SparkEntry.families; an entry present
    // in queries but absent from every family would be silently
    // unmeasured (neither timed nor failed) — pin coverage here so the
    // gap fails CI before it fails a bench artifact (review r11)
    val familyKeys = SparkEntry.families.flatMap(_._2)
    assert(familyKeys.length === familyKeys.distinct.length,
      "duplicate keys across families")
    assert(familyKeys.toSet === SparkEntry.queries.keySet)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      def run(): Seq[String] = {
        val df = fn(spark, dir)
        val drop = unstableColumns.getOrElse(name, Set.empty)
        val kept = df.columns.filterNot(drop).toSeq
        df.select(kept.head, kept.tail: _*).collect().map(_.toString).toSeq
      }
      val a = run()
      val b = run()
      assert(a == b, s"$name differs across runs")
      assert(a.nonEmpty || name == "q07_anti_join", s"$name returned no rows")
    }
  }
}
