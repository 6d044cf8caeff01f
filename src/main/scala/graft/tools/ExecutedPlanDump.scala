package graft.tools

import graft.{Sessions, SparkEntry}

/** Post-execution plan dump: run the named catalog queries through the noop
  * sink, then print the FINAL adaptive physical plan (isFinalPlan=true) —
  * the one place AQE's runtime decisions (ReusedQueryStage /
  * AQEShuffleRead / runtime join rewrites) are visible, which the
  * pre-execution `explain` in [[graft.PlanAudit]] cannot show (r17; guide
  * §7.2's "the SQL tab shows the final re-optimised plan", reproduced
  * headlessly).
  *
  * Usage: runMain graft.tools.ExecutedPlanDump [sfDir] [queryName...]
  */
object ExecutedPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.build(s"local[$cpus]", cpus, "graft-executed-plan")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name (executed) =====")
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable => println(s"run failed: $e") }
      }
    spark.stop()
  }
}
