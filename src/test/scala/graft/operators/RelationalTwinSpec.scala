package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Twin-form parity: q100 (partial aggregation below the join) must be
  * row-identical to q20 (the naive fan-out join it re-shapes) on the real
  * corpus — the same both-forms-bench-paired discipline as q61/q45. */
class RelationalTwinSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("q100 pre-agg twin is row-identical to q20's fan-out join") {
    val naive = RelationalQueries.q20FanOut(spark, dir).collect().toSeq
    val preagg = RelationalQueries.q100FanOutPreAgg(spark, dir).collect().toSeq
    assert(naive.nonEmpty && naive == preagg)
  }

  test("q100 aggregates lineitem below the join (one partial agg per orderkey)") {
    val plan = RelationalQueries.q100FanOutPreAgg(spark, dir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // there must exist a Join with an Aggregate on one input side — the
    // pre-collapse; the naive q20 has its only aggregates ABOVE the join
    val found = plan.collect {
      case j: Join if j.children.exists(_.collectFirst { case a: Aggregate => a }.isDefined) => j
    }
    assert(found.nonEmpty, s"expected an aggregate below the join:\n$plan")
  }
}
