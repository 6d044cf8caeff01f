package graft.tools

import graft.core.EstimationInput
import graft.engine.Engine

/** Estimator-sweep throughput smoke (VERDICT r10 #8 / r11 #4): re-measure
  * the sizing kernel's scenarios/s on the CURRENT tree against
  * BASELINE.md's >=11k scenarios/s target (measured there as 20k scenarios
  * in 1.8 s on local[4], job overhead included).
  *
  * The sweep is a narrow no-shuffle map over a distributed Dataset
  * (EngineSpec pins the plan), so the smoke generates its scenario grid
  * DISTRIBUTED (spark.range -> deterministic per-id input; nothing is
  * collected) and times full materialization through the noop sink —
  * warmup pass first, then min-of-3, the Bench discipline.
  *
  * Usage: runMain graft.tools.SweepSmoke [n] [cores]   (default 200000, 32)
  * Prints one JSON line; also written to target/sweep_smoke.json.
  */
object SweepSmoke {
  /** Deterministic scenario for a grid index — same knobs as
    * Engine.demoGrid, spread over the id space so every index is a valid,
    * distinct input (a handful hit the VM-S reject path, as in the grid). */
  def scenarioFor(i: Long): EstimationInput = {
    val mps = Seq(1000, 10000, 100000)(((i % 3) + 3).toInt % 3)
    val lat = Seq(0.5, 1.0, 5.0)((i / 3 % 3).toInt)
    val (s, m, c) = Seq((2, 1, 1), (1, 0, 0), (0, 2, 2), (5, 3, 2))((i / 9 % 4).toInt)
    val skew = if (i / 36 % 2 == 0) "low" else "high"
    val (tpe, tsize) =
      if (i / 72 % 2 == 0) ("VM", Some("S")) else ("bare_metal", None)
    EstimationInput(
      project_name = s"smoke_$i",
      messages_per_second = mps,
      avg_record_size_bytes = 256 + (i % 1024).toInt,
      num_distinct_keys = 1000L + i % 10000000L,
      data_skew_risk = skew,
      expected_latency_seconds = lat,
      simple_statements = s,
      medium_statements = m,
      complex_statements = c,
      worker_node_type = tpe,
      worker_node_t_size = tsize,
    )
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cores = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.Sessions.build(s"local[$cores]", cores, "graft-sweep-smoke")
    import spark.implicits._
    def sweepOnce(): Long = {
      val scenarios = spark.range(0, n, 1, cores).map(i => scenarioFor(i))
      // count() on the typed map still executes the kernel per row (a
      // Dataset map cannot be pruned away) and collects nothing
      Engine.sweep(scenarios).count()
    }
    sweepOnce() // warmup (codegen + JIT)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val cnt = sweepOnce()
      require(cnt == n, s"sweep returned $cnt of $n outcomes")
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    val rate = n / best
    val json =
      f"""{"metric":"sweep_scenarios_per_sec","value":$rate%.0f,"n":$n,"seconds_min_of_3":$best%.3f,"cores":$cores,"baseline_target":11000}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/sweep_smoke.json"), json + "\n")
    spark.stop()
  }
}
