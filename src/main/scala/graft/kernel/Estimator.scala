package graft.kernel

import graft.core._
import scala.math.BigDecimal.RoundingMode

/** The sizing kernel: a deterministic, Spark-free re-expression of the
  * reference's estimation math (/root/reference/src/flink_estimator/
  * estimation.py:100-597). One call sizes one scenario; graft.engine maps it
  * over a Dataset for sweeps — the function is a narrow transformation, so
  * the sweep is embarrassingly parallel with no shuffle at any scale.
  *
  * Behavioral quirks preserved on purpose (SURVEY.md §2.A Q1-Q6):
  *  - Q1 total_worker_node_needed = min(nodes actually used, node count from
  *    the throughput pass) — can understate when placement grew the count.
  *  - Q2 data_skew_risk / bandwidth affect only summary + scaling, not CPUs.
  *  - Q3 capacity_analysis.total_flink_statements multiplies apps twice.
  *  - Q4 placement mutates the requested node count in place; the state pass
  *    runs before the throughput pass reads it (ordering is load-bearing).
  *  - Q5 memory_mb_each uses Python round() = half-even.
  *  - Q6 JM cpu folds into CPU needs before the apps multiplier; node-0
  *    memory subtracts jm_memory * apps; JM count stays 1.
  */
object Estimator {

  // Constants — estimation.py:101-123.
  val OsMemMb = 512
  val SimpleRps = 24000
  val MediumRps = 11000
  val ComplexRps = 2500
  val JmTshirtCpuMb: Map[String, (Int, Int)] =
    Map("S" -> (1, 2048), "M" -> (2, 4096), "L" -> (4, 8192))
  val TmMemMb = 4096
  val TmMmPercent = 0.4
  val TmProcessMemoryMaxMb = 64 * 1024
  val InFlightToBuffer = 0.4
  val ThroughputBufferK = 1.4
  val TmVcpus = 4

  /** Python round(x, n): correctly-rounded decimal half-even on the double.
    * Uses the exact binary expansion of x (new java.math.BigDecimal), not the
    * shortest-string repr (BigDecimal.valueOf) — Python rounds the exact
    * binary value, e.g. round(2.675, 2) == 2.67 because 2.675 is stored as
    * 2.67499999..., and valueOf would wrongly give 2.68. */
  def roundHalfEven(x: Double, scale: Int): Double =
    new java.math.BigDecimal(x).setScale(scale, java.math.RoundingMode.HALF_EVEN).doubleValue()

  /** ceil to Int, failing loudly on overflow instead of silently saturating
    * at Int.MaxValue (the reference's Python ints are unbounded; an input
    * large enough to overflow here cannot be sized on real hardware, so an
    * explicit error beats a silently-divergent result — ADVICE r1). */
  private def ceilToInt(x: Double, what: String): Int = {
    val c = math.ceil(x)
    if (c > Int.MaxValue) throw new ArithmeticException(s"$what overflows Int: $c")
    c.toInt
  }

  /** estimation.py:126-137. */
  def managedMemoryPercentByLatency(lat: Double): Double =
    if (lat <= 0.5) 0.32
    else if (lat <= 1.0) 0.35
    else if (lat < 5.0) 0.38
    else TmMmPercent

  /** estimation.py:140-159 — state-driven Flink process memory (MB).
    * The byte product is taken exactly (BigInt: keys can be 1e9 and records
    * 10 MiB — a Long could overflow, a Double would round early) and divided
    * by 2^20 the way Python divides ints: true division, correctly rounded.
    */
  def stateFlinkProcessMemoryMb(in: EstimationInput): Double = {
    val bytes = BigInt(in.num_distinct_keys) *
      (in.medium_statements + in.complex_statements) *
      in.number_flink_applications *
      in.avg_record_size_bytes
    val mb = (BigDecimal(bytes) / BigDecimal(1024 * 1024)).toDouble
    val totalManagedMb = math.ceil(mb)
    totalManagedMb / managedMemoryPercentByLatency(in.expected_latency_seconds)
  }

  /** estimation.py:162-191 — per-TM network/in-flight buffer heuristic. */
  def networkBufferMinProcessMemoryMb(
      in: EstimationInput, totalThroughputMbPerSec: Double, nbTaskManagers: Int): Int = {
    val n = math.max(1, nbTaskManagers)
    val thrPerTm = totalThroughputMbPerSec / n
    val lat = math.max(in.expected_latency_seconds, 0.01)
    val latCapped = math.min(lat, 30.0)
    val inFlightPerTm = totalThroughputMbPerSec * latCapped / n
    val pressure =
      if (in.expected_latency_seconds <= 0.5) 2.0
      else if (in.expected_latency_seconds <= 1.0) 1.5
      else if (in.expected_latency_seconds < 5.0) 1.15
      else 1.0
    val rec = math.max(100, in.avg_record_size_bytes) / 1024.0
    val recScale = 1.0 + 0.02 * math.min(rec, 64.0)
    val pipe = math.max(1, in.total_statements)
    val throughTerm = thrPerTm * ThroughputBufferK * recScale * pressure
    val inFlightTerm = InFlightToBuffer * inFlightPerTm
    val extra = 256.0 * (1.0 + 0.01 * pipe.toDouble)
    math.max(0, ceilToInt(throughTerm + inFlightTerm + extra, "network buffer MB"))
  }

  /** estimation.py:194-202 — per-TM process-memory ceiling. */
  def perTmCapMb(workerNodeMemoryMb: Double): Int =
    math.min(TmProcessMemoryMaxMb, math.max(workerNodeMemoryMb.toInt - OsMemMb, TmMemMb))

  /** estimation.py:408-415. */
  def latencyCpuFactor(lat: Double): Double =
    if (lat <= 0.5) 1.5
    else if (lat <= 1.0) 1.2
    else if (lat < 5.0) 1.1
    else 1.0

  /** estimation.py:418-425 — JM t-shirt by key cardinality. */
  def assessJobmanagerSize(numDistinctKeys: Long): (Int, Int) =
    if (numDistinctKeys <= 10000000L) JmTshirtCpuMb("S")
    else if (numDistinctKeys <= 100000000L) JmTshirtCpuMb("M")
    else JmTshirtCpuMb("L")

  /** estimation.py:428-457 — best-fit-decreasing-ish packing; ties break to
    * the lower node index. Returns (alloc, maxOnNode, success, remaining).
    * O(TMs x nodes), faithful to the reference's loop: inputs implying
    * ~10^5+ TaskManagers (absurd clusters) take correspondingly long —
    * such scenarios overflow-fail upstream long before this matters. */
  def greedyPackTaskmanagers(
      freeMemPerNode: IndexedSeq[Double], nbTaskmanagers: Int, tmMemMb: Int)
      : (Array[Int], Int, Boolean, Array[Double]) = {
    val n = freeMemPerNode.length
    val alloc = new Array[Int](n)
    val remaining = freeMemPerNode.toArray
    var placed = 0
    while (placed < nbTaskmanagers) {
      var bestI = -1
      var bestRem = -1.0
      var i = 0
      while (i < n) {
        val r = remaining(i)
        if (r >= tmMemMb && r > bestRem) { bestRem = r; bestI = i }
        i += 1
      }
      if (bestI < 0)
        return (alloc, if (n > 0) alloc.max else 0, false, remaining)
      remaining(bestI) -= tmMemMb
      alloc(bestI) += 1
      placed += 1
    }
    (alloc, if (n > 0) alloc.max else 0, true, remaining)
  }

  /** Mutable sizing state standing in for the reference's in-place mutation
    * of input_params.nb_worker_nodes (estimation.py:232,244 — quirk Q4). */
  private final class Ctx(val in: EstimationInput) {
    var nbWorkerNodes: Int = in.nb_worker_nodes
  }

  /** estimation.py:483-495 — free MB per node; node 0 hosts the JMs. */
  private def assessFreeMemPerNode(ctx: Ctx, jmMemory: Int): (Array[Double], Double) = {
    val free = Array.fill(ctx.nbWorkerNodes)(ctx.in.worker_node_memory_mb - OsMemMb)
    free(0) -= jmMemory.toDouble * ctx.in.number_flink_applications
    (free, free.sum)
  }

  /** estimation.py:205-244 — place TMs, growing the node count on memory
    * shortfall or packing failure. The "total free < required" branch jumps
    * straight to the first node count with enough aggregate memory (same
    * fixpoint as the reference's one-node-at-a-time loop, since that branch
    * has no other effect); packing failures still grow one node at a time.
    * Returns (jm + nbTm*tmMem, alloc) or the reference's error message. */
  private def placeTaskmanagersWithNodeGrowth(
      ctx: Ctx, jmMemory: Int, nbTaskmanagers: Int, tmMemMb: Int)
      : Either[String, (Long, Array[Int])] = {
    val required = nbTaskmanagers.toLong * tmMemMb
    while (true) {
      val (free, totalFree) = assessFreeMemPerNode(ctx, jmMemory)
      if (free.isEmpty || free.max < tmMemMb) {
        val mx = if (free.isEmpty) 0.0 else free.max
        // Message parity quirk (parity_diff find, round 8): on the VM path the
        // reference's t-shirt rewrite assigns an INT into the float field
        // (models.py:73-74, estimation.py:602-605 — no re-coercion without
        // validate_assignment), so every free-mem value downstream is a Python
        // int and the error formats "60928", not "60928.0". Bare-metal inputs
        // arrive as floats and keep the ".0".
        val mxStr =
          if (ctx.in.worker_node_type == "VM" && ctx.in.worker_node_t_size.isDefined)
            mx.toLong.toString
          else mx.toString
        return Left(
          s"No worker can host a $tmMemMb MB task manager: " +
          s"max free memory on a node is $mxStr MB. " +
          "Increase worker_node_memory (or use a larger VM t-shirt) so each node can hold at least one TM.")
      }
      if (totalFree < required) {
        val perNode = ctx.in.worker_node_memory_mb - OsMemMb
        val deficit = required - totalFree
        ctx.nbWorkerNodes += math.max(1, ceilToInt(deficit / perNode, "node growth"))
      } else {
        val (alloc, _, ok, _) =
          greedyPackTaskmanagers(free.toIndexedSeq, nbTaskmanagers, tmMemMb)
        if (ok) return Right((jmMemory + required, alloc))
        ctx.nbWorkerNodes += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** estimation.py:460-481 — state pass at the default 4096 MB/TM.
    * Returns (total mem incl. JM, TM count, per-node alloc, raw process MB). */
  private def assessTaskmanagerBasedOnState(ctx: Ctx, jmMemory: Int, tmMemMb: Int = TmMemMb)
      : Either[String, (Long, Int, Array[Int], Double)] = {
    val raw = stateFlinkProcessMemoryMb(ctx.in)
    val totalFlink = math.max(TmMemMb.toDouble, raw)
    val nbTaskmanagers = math.max(1, ceilToInt(totalFlink / tmMemMb, "state TM count"))
    placeTaskmanagersWithNodeGrowth(ctx, jmMemory, nbTaskmanagers, tmMemMb).map {
      case (totalMem, alloc) => (totalMem, nbTaskmanagers, alloc, raw)
    }
  }

  /** estimation.py:556-597 — CPU pass. Per class: cpu = min(4, thr/classThr)
    * * count; total = ceil(sum*latencyFactor + jmCpu) * apps; grow the LOCAL
    * node count until nodes*coresPerNode covers it (closed form of the
    * reference's +1 loop); TMs = ceil((total - jmCpu)/4). */
  private def assessTaskmanagerBasedOnThroughput(
      totalThroughputMbPerSec: Double, ctx: Ctx, jmCpu: Int): (Int, Int, Int) = {
    val in = ctx.in
    val bytes = in.avg_record_size_bytes.toDouble
    def cpuNeeds(rps: Int, count: Int): Double = {
      val classMbps = rps * bytes / (1024.0 * 1024.0)
      math.min(TmVcpus.toDouble, totalThroughputMbPerSec / classMbps) * count
    }
    val sum = cpuNeeds(SimpleRps, in.simple_statements) +
      cpuNeeds(MediumRps, in.medium_statements) +
      cpuNeeds(ComplexRps, in.complex_statements)
    val totalCpuNeedsL =
      math.ceil(sum * latencyCpuFactor(in.expected_latency_seconds) + jmCpu).toLong *
        in.number_flink_applications
    if (totalCpuNeedsL > Int.MaxValue)
      throw new ArithmeticException(s"total CPU needs overflows Int: $totalCpuNeedsL")
    val totalCpuNeeds = totalCpuNeedsL.toInt
    val coresPerNode =
      if (in.worker_node_type == "VM" && in.worker_node_t_size.isDefined)
        Validation.VmTshirtMbCpu(in.worker_node_t_size.get)._2
      else in.worker_node_cpu_max
    var nbWorkerNodes = ctx.nbWorkerNodes
    if (nbWorkerNodes.toLong * coresPerNode < totalCpuNeeds)
      nbWorkerNodes = ceilToInt(totalCpuNeeds.toDouble / coresPerNode, "worker nodes")
    val nbTaskManagers = ceilToInt((totalCpuNeeds - jmCpu).toDouble / TmVcpus, "CPU TM count")
    (nbTaskManagers, totalCpuNeeds, nbWorkerNodes)
  }

  /** estimation.py:247-281 — the per-TM-memory / TM-count fixpoint (<=12
    * iterations): P' = min(max(4096, perTmState, buffer(N)), cap);
    * N' = max(ceil(max(4096, raw)/P'), nbTmCpu). */
  private def resolveTmProcessMemoryMb(
      ctx: Ctx, totalThroughputMbPerSec: Double, rawFlinkProcessMb: Double,
      nbTmState: Int, nbTmCpu: Int): (Int, Int) = {
    val cap = perTmCapMb(ctx.in.worker_node_memory_mb)
    val perTmState = ceilToInt(
      math.max(TmMemMb.toDouble, rawFlinkProcessMb) / math.max(1, nbTmState), "per-TM state MB")
    var p = TmMemMb
    var n = math.max(nbTmState, nbTmCpu)
    var i = 0
    while (i < 12) {
      val bufferMb = networkBufferMinProcessMemoryMb(ctx.in, totalThroughputMbPerSec, n)
      val pNew = math.min(math.max(TmMemMb, math.max(perTmState, bufferMb)), cap)
      val nS2 = math.max(1, ceilToInt(
        math.max(TmMemMb.toDouble, rawFlinkProcessMb) / pNew, "fixpoint TM count"))
      val nNew = math.max(nS2, nbTmCpu)
      if (pNew == p && nNew == n) return (pNew, nNew)
      p = pNew; n = nNew
      i += 1
    }
    (p, n)
  }

  /** estimation.py:500-553 — skew-tiered parallelism + checkpoint interval. */
  def computeScalingRecommendations(in: EstimationInput, totalCpuCores: Int): ScalingRecommendations = {
    val processingLoad = 1 // placeholder, matches estimation.py:512
    val keys = in.num_distinct_keys
    var (minPar, recPar, maxPar, baseCkpt) = in.data_skew_risk match {
      case "high" =>
        val rec = math.max(totalCpuCores / 2,
          math.min(keys / 1000L, totalCpuCores.toLong).toInt)
        (math.max(1, totalCpuCores / 3), rec, totalCpuCores,
          math.min(60000, math.max(10000, 15000 + processingLoad * 1000)))
      case "medium" =>
        val rec = math.min(totalCpuCores.toLong,
          math.max((totalCpuCores / 2).toLong, keys / 2000L)).toInt
        (math.max(1, totalCpuCores / 2), rec, Math.multiplyExact(totalCpuCores, 2),
          math.min(60000, math.max(5000, 10000 + processingLoad * 1000)))
      case _ =>
        (math.max(1, totalCpuCores / 2), totalCpuCores, Math.multiplyExact(totalCpuCores, 2),
          math.min(60000, math.max(5000, 8000 + processingLoad * 1000)))
    }
    val ckpt =
      if (in.expected_latency_seconds <= 0.5) math.min(baseCkpt, 5000)
      else if (in.expected_latency_seconds <= 1.0) math.min(baseCkpt, 10000)
      else if (in.expected_latency_seconds <= 5.0) math.min(baseCkpt, 20000)
      else baseCkpt
    if (in.expected_latency_seconds <= 1.0) {
      val boost = math.max(1L, (2.0 / in.expected_latency_seconds).toLong)
      // saturate instead of multiplying: Python's unbounded ints give
      // min(max, rec*boost) = max for a huge boost; recPar.toLong * boost
      // can wrap Long for tiny latencies and emit a NEGATIVE parallelism.
      // boost > maxPar/recPar  ==>  recPar*boost > maxPar, no product needed
      recPar =
        if (recPar > 0 && boost > maxPar.toLong / recPar) maxPar
        else math.min(maxPar.toLong, recPar.toLong * boost).toInt
    }
    ScalingRecommendations(minPar, recPar, maxPar, ckpt)
  }

  /** estimation.py:284-405 — the orchestrator. Pass ordering is semantics
    * (quirk Q4): state pass may grow the node count that the throughput pass
    * then reads; the final placement may grow it further, and input_summary
    * reports the grown value while total_worker_node_needed floors against
    * the throughput pass's count (quirk Q1). */
  def estimate(inputRaw: EstimationInput): Either[String, EstimationResult] =
    try estimateOrThrow(inputRaw)
    catch { case e: ArithmeticException => Left(s"sizing overflow: ${e.getMessage}") }

  private def estimateOrThrow(inputRaw: EstimationInput): Either[String, EstimationResult] = {
    val in = Validation.applyTshirt(inputRaw) // _defaulting_input_params (A17)
    val ctx = new Ctx(in)
    val totalThroughputMbPerSec = in.total_throughput_mb_per_sec
    val (jmCpu, jmMemory) = assessJobmanagerSize(in.num_distinct_keys)

    assessTaskmanagerBasedOnState(ctx, jmMemory, TmMemMb).flatMap {
      case (_, nbTmState, _, rawFlink) =>
        val (nbTmCpu, totalCpuForThroughput, nbWorkerNodes) =
          assessTaskmanagerBasedOnThroughput(totalThroughputMbPerSec, ctx, jmCpu)
        val (tmProcessMemoryMb, nbTaskManagers) = resolveTmProcessMemoryMb(
          ctx, totalThroughputMbPerSec, rawFlink, nbTmState, nbTmCpu)
        val totalCpuNeeds = math.max(totalCpuForThroughput, nbTaskManagers * TmVcpus)

        placeTaskmanagersWithNodeGrowth(ctx, jmMemory, nbTaskManagers, tmProcessMemoryMb).map {
          case (totalMemoryMb, nodeAllocations) =>
            val taskmanagerMemoryMb = nbTaskManagers.toLong * tmProcessMemoryMb
            val nonZeroNodes = nodeAllocations.count(_ > 0)
            val totalNodes = math.min(nonZeroNodes, nbWorkerNodes)
            // multiplyExact: a silent Int wrap here would report a NEGATIVE
            // bandwidth in the summary (the file's fail-loud discipline;
            // estimate() converts the throw to a sizing-overflow reject —
            // Python's unbounded ints succeed, but a >2M-gbps input is
            // better rejected loudly than reported wrapped)
            val bandwidthMbps = Math.multiplyExact(in.bandwidth_capacity_gbps, 1000)

            val inputSummary = InputSummary(
              messages_per_second = in.messages_per_second,
              avg_record_size_bytes = in.avg_record_size_bytes,
              total_throughput_mb_per_sec = roundHalfEven(totalThroughputMbPerSec, 2),
              num_distinct_keys = in.num_distinct_keys,
              data_skew_risk = in.data_skew_risk,
              bandwidth_capacity_mbps = bandwidthMbps,
              expected_latency_seconds = in.expected_latency_seconds,
              simple_statements = in.simple_statements,
              medium_statements = in.medium_statements,
              complex_statements = in.complex_statements,
              total_statements = in.total_statements,
              worker_node_memory_capacity_mb = in.worker_node_memory_mb,
              worker_node_cpu_capacity = in.worker_node_cpu_max,
              nb_worker_nodes = ctx.nbWorkerNodes,
              worker_node_t_size = in.worker_node_t_size)

            val resourceEstimates = ResourceEstimates(
              total_memory_mb = totalMemoryMb,
              total_cpus = totalCpuNeeds,
              total_worker_node_needed = totalNodes,
              processing_load_score = 1.0)

            val jobmanagerConfig = JobManagerConfig(
              count = 1, memory_mb = jmMemory, total_cpus = jmCpu.toDouble)

            val tmTotalMem = taskmanagerMemoryMb
            val memoryMbEach =
              if (nbTaskManagers != 0)
                roundHalfEven(tmTotalMem.toDouble / nbTaskManagers, 0)
              else 0.0
            val taskmanagerConfig = TaskManagerConfig(
              count = nbTaskManagers,
              total_memory_mb = tmTotalMem,
              total_cpus = totalCpuNeeds - jmCpu,
              memory_mb_each = memoryMbEach)

            EstimationResult(
              input_summary = inputSummary,
              resource_estimates = resourceEstimates,
              cluster_recommendations =
                ClusterRecommendations(jobmanagerConfig, taskmanagerConfig),
              scaling_recommendations =
                Some(computeScalingRecommendations(in, taskmanagerConfig.total_cpus)),
              capacity_analysis = CapacityAnalysis(
                total_flink_statements = in.total_statements * in.number_flink_applications,
                total_flink_applications = in.number_flink_applications))
        }
    }
  }

  /** Internal passes exposed for the parity suite (mirrors the reference's
    * unit tests exercising private helpers). */
  private[graft] def statePass(in: EstimationInput, jmMemory: Int, tmMemMb: Int = TmMemMb)
      : Either[String, (Long, Int, Array[Int], Double, Int)] = {
    val ctx = new Ctx(Validation.applyTshirt(in))
    assessTaskmanagerBasedOnState(ctx, jmMemory, tmMemMb).map {
      case (a, b, c, d) => (a, b, c, d, ctx.nbWorkerNodes)
    }
  }

  private[graft] def throughputPass(in: EstimationInput, jmCpu: Int): (Int, Int, Int) = {
    val ctx = new Ctx(Validation.applyTshirt(in))
    assessTaskmanagerBasedOnThroughput(ctx.in.total_throughput_mb_per_sec, ctx, jmCpu)
  }

  /** A8 exposed for the oracle-checked catalog entry (q123): the per-TM
    * memory / TM-count fixpoint together with its closed-form inputs. The
    * fixpoint never reads placement state — rawFlink, nbTmState and
    * nbTmCpu are pure arithmetic of the validated input row (placement and
    * node growth, the only passes that can error or mutate the node count,
    * feed nothing here; quirk Q4's ordering matters to NODE counts, not TM
    * counts) — so it is well-defined for every scenario, including ones
    * whose placement later rejects. Returns (nbTmState, nbTmCpu,
    * tmProcessMemoryMb, nbTaskManagers); the published
    * taskmanagers.memory_mb_each/count equal the last two whenever the
    * orchestrator succeeds (round-half-even of p*n/n is p exactly). */
  private[graft] def tmFixpointPass(inputRaw: EstimationInput): (Int, Int, Int, Int) = {
    val in = Validation.applyTshirt(inputRaw)
    val ctx = new Ctx(in)
    val thr = in.total_throughput_mb_per_sec
    val (jmCpu, _) = assessJobmanagerSize(in.num_distinct_keys)
    val raw = stateFlinkProcessMemoryMb(in)
    val nbTmState = math.max(1,
      ceilToInt(math.max(TmMemMb.toDouble, raw) / TmMemMb, "state TM count"))
    val (nbTmCpu, _, _) = assessTaskmanagerBasedOnThroughput(thr, ctx, jmCpu)
    val (p, n) = resolveTmProcessMemoryMb(ctx, thr, raw, nbTmState, nbTmCpu)
    (nbTmState, nbTmCpu, p, n)
  }

  private[graft] def freeMemPerNode(in: EstimationInput, jmMemory: Int): (Array[Double], Double) =
    assessFreeMemPerNode(new Ctx(Validation.applyTshirt(in)), jmMemory)

  /** One scenario's A13/A14 observables for the q127 oracle entry: the node
    * count after each growth phase, the fixpoint's (P, N), and the final
    * placement outcome (per-node allocation vector, or the reference's
    * host-error message). */
  private[graft] final case class PlacementTrace(
      projectName: String,
      n0: Int,
      nAfterState: Int,
      nThr: Int,
      tmMemMb: Int,
      tmCount: Int,
      outcome: Either[String, (Long, Array[Int])])

  /** A13 (greedy packing, estimation.py:428-457) + A14 (node growth,
    * estimation.py:205-244) exposed for the oracle-checked catalog entry
    * (q127) — the REAL production loops run end to end in orchestrator
    * order (state pass grows the node count the final placement starts
    * from; the throughput pass's count feeds only the quirk-Q1 floor), and
    * every observable the orchestrator reads from them is returned: the
    * grown node counts, the per-node allocation vector (whose length is
    * input_summary.nb_worker_nodes and whose nonzero count floors
    * total_worker_node_needed), the total memory, and the verbatim
    * host-error message. The oracle re-derives the same values closed-form
    * (free memory is identical on every node but node 0, so the greedy
    * "max remaining, ties to the lowest index" order is exactly the slot
    * sort by (free_i - (k-1)*T) DESC, node ASC, k ASC — see
    * [[graft.engine.Engine.placementOracleSql]]).
    *
    * Grid rows must not error in the STATE pass (T=4096 there; every grid
    * node holds at least one default TM by construction) — asserted loudly
    * so a grid edit cannot silently skip the oracle's error-path rows. */
  private[graft] def placementTrace(inputRaw: EstimationInput): PlacementTrace = try {
    val in = Validation.applyTshirt(inputRaw)
    val ctx = new Ctx(in)
    val thr = in.total_throughput_mb_per_sec
    val (jmCpu, jmMemory) = assessJobmanagerSize(in.num_distinct_keys)
    val st = assessTaskmanagerBasedOnState(ctx, jmMemory, TmMemMb)
    val (_, nbTmState, _, rawFlink) = st.getOrElse(throw new IllegalArgumentException(
      s"placement grid row '${in.project_name}' errors in the state pass: " +
        st.swap.getOrElse("")))
    val nAfterState = ctx.nbWorkerNodes
    val (nbTmCpu, _, nThr) = assessTaskmanagerBasedOnThroughput(thr, ctx, jmCpu)
    val (p, n) = resolveTmProcessMemoryMb(ctx, thr, rawFlink, nbTmState, nbTmCpu)
    PlacementTrace(in.project_name, inputRaw.nb_worker_nodes, nAfterState, nThr,
      p, n, placeTaskmanagersWithNodeGrowth(ctx, jmMemory, n, p))
  } catch {
    // estimate() converts kernel overflow to a sizing-overflow REJECT; the
    // trace has no (p, n) to report at that point, so it fails loudly with
    // the grid-precondition message instead of crashing the Dataset map
    // with a bare ArithmeticException (review r16). KernelPlacementSpec
    // runs every grid row, so a row entering this path cannot ship.
    case e: ArithmeticException => throw new IllegalArgumentException(
      s"placement grid row '${inputRaw.project_name}' overflows the sizing " +
        s"kernel (estimate() would reject it; q127 rows must stay in the " +
        s"kernel's numeric domain): ${e.getMessage}", e)
  }
}
