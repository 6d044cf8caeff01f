package graft

/** Plan audit: print the formatted physical plan of every catalog query (or
  * the ones named in args) so scan pruning, pushed filters, join strategies,
  * and window limits can be eyeballed against each query's scaladoc claims.
  *
  * NOTE (ADVICE r16): a handful of entries are EAGER at DataFrame
  * construction (q94/q95/q101/q104/q120/q124 — driver loops and training
  * collects; each scaladoc says so), so `fn(...)` itself runs Spark jobs and
  * the printed plan covers only the final assembled frame (q95: a
  * LocalTableScan of the precomputed census rows). That is the audit's
  * documented blind spot, not a bug — the distributed halves of those
  * entries are pinned by their specs (GraphSpec pins q95 == powerIteration).
  *
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val spark = Sessions.build("local[4]", 8, "graft-plan-audit")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    spark.stop()
  }
}
