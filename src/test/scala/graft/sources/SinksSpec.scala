package graft.sources

import graft.SparkTestSession
import graft.operators.Tables
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Partitioned-write discipline: layout, file bounds, round-trip, and the
  * plan-level proof that readback filters become partition pruning. */
class SinksSpec extends AnyFunSuite with SparkTestSession with AdaptiveSparkPlanHelper {
  private val dir = "/root/testdata/sf0.001"
  private val out = Files.createTempDirectory("graft_sinks").toString

  private lazy val written: Unit = Sinks.writePartitioned(
    Tables.events(spark, dir), out, Seq("event_type"),
    filesPerPartition = 2, maxRecordsPerFile = 100)

  test("layout: one directory per partition value, bounded files inside") {
    written
    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => Files.isDirectory(p)).map(_.getFileName.toString).toSet
    assert(dirs == Set("click", "error", "purchase", "signup", "view")
      .map(v => s"event_type=$v"))
    dirs.foreach { d =>
      val files = Files.list(Paths.get(out, d)).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      // ~200 rows per type at sf0.001, cap 100/file, 2 salt buckets => 2..4
      assert(files >= 2 && files <= 6, s"$d has $files files")
    }
  }

  test("round-trip: partitioned copy equals the source") {
    written
    val src = Tables.events(spark, dir)
    val back = spark.read.parquet(out)
    assert(back.count() == src.count())
    val a = src.groupBy(col("event_type")).agg(sum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = back.groupBy(col("event_type")).agg(sum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(v - b(k)) < 1e-6) }
  }

  test("readback filter on the partition column prunes at the plan level") {
    written
    val q = spark.read.parquet(out).filter(col("event_type") === "click")
    val n = q.count()
    assert(n > 0)
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // the predicate must be a partition filter (directory pruning), not a
    // data filter evaluated per row
    assert(scan.partitionFilters.exists(_.toString.contains("event_type")),
      s"partitionFilters=${scan.partitionFilters}")
    // and the scan reads ONLY the matching directory's files
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    assert(selected.nonEmpty && selected.forall(_.contains("event_type=click")),
      selected.mkString(", "))
  }
}
