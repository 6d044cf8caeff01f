package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator as-of join — SURVEY §4 custom-operator ladder rung (c):
  * a custom LogicalPlan + planner Strategy + physical operator, registered
  * through SparkSessionExtensions (the same seam the native dot_product_long
  * expression and the RewriteDotProduct rule use).
  *
  * Semantics: LEFT AS-OF — every left row is emitted once, joined to the
  * right row with the greatest time <= the left row's time within the same
  * key, or right-nulls when none exists. Null keys/times never match (SQL
  * join semantics); among right rows tying on (key, time) the last in sort
  * order wins.
  *
  * Physical shape (the part that matters at 100 TB): both sides
  * hash-partition on the key and sort by (key, time) — exactly a
  * sort-merge join's distribution, which EnsureRequirements co-partitions —
  * then a single forward-only merge sweep per partition: O(n+m) time after
  * the sorts, O(1) state (ONE buffered right row), no range-join blow-up,
  * no per-key grouping in memory. Compare graft.operators.AsOfQueries.q46,
  * which reaches the same semantics by composition (union + window); the
  * window plan carries every right row through the shuffle into the window
  * sort, while this operator streams the right side and never materializes
  * it downstream — the gap widens as the right side grows.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // SMJ-style requirements: co-partition on the key, sort by (key, time).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  // rows keep the left child's clustering and ordering
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightArity = right.output.size

    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (leftIter, rightIter) =>
      val nullRight = new GenericInternalRow(rightArity)
      val joined = new JoinedRow
      // r4 hot-loop rework: the previous shape eval'd key/time expressions
      // to BOXED values and compared through a boxed ordering — measured
      // behind the codegen'd window composition at 100x data. Both sides
      // now project (key, time) into a reused 2-col UnsafeRow (primitive
      // writes, no allocation) and compare with CODEGEN'D row orderings —
      // the same machinery SMJ's generated keys use.
      val lPairProj = UnsafeProjection.create(Array(lKey, lTime))
      val rPairProj = UnsafeProjection.create(Array(rKey, rTime))
      val keyOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(0, keyType, nullable = true), Ascending)))
      val timeOrd = GenerateOrdering.generate(
        Seq(SortOrder(BoundReference(1, timeType, nullable = true), Ascending)))
      // consumers (and SparkPlan.getByteArrayRdd when we are the root
      // operator) expect UnsafeRow — same final projection SMJ uses
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      var rightNext: InternalRow = if (rightIter.hasNext) rightIter.next() else null
      var rightPair: InternalRow = if (rightNext != null) rPairProj(rightNext) else null
      // the single piece of merge state: the best right row seen so far
      var candidate: InternalRow = null
      var candidatePair: InternalRow = null

      def advanceRight(): Unit = {
        rightNext = if (rightIter.hasNext) rightIter.next() else null
        rightPair = if (rightNext != null) rPairProj(rightNext) else null
      }

      leftIter.map { leftRow =>
        val lPair = lPairProj(leftRow)
        if (lPair.isNullAt(0) || lPair.isNullAt(1)) {
          resultProj(joined(leftRow, nullRight))
        } else {
          var advancing = true
          while (advancing && rightNext != null) {
            if (rightPair.isNullAt(0) || rightPair.isNullAt(1)) {
              advanceRight() // unmatched-able right row: skip
            } else {
              val c = keyOrd.compare(rightPair, lPair)
              if (c < 0 || (c == 0 && timeOrd.compare(rightPair, lPair) <= 0)) {
                if (c == 0) {
                  // shuffle/sort iterators reuse the row object — copy the
                  // one row (and its tiny key pair) we keep
                  candidate = rightNext.copy()
                  candidatePair = rightPair.copy()
                }
                advanceRight()
              } else {
                advancing = false
              }
            }
          }
          if (candidate != null && keyOrd.compare(candidatePair, lPair) == 0) {
            resultProj(joined(leftRow, candidate))
          } else {
            resultProj(joined(leftRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan -> AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }

  def inject(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
}

/** Public API for the operator. Key/time are passed by COLUMN NAME and
  * resolved per side after the right side is re-aliased: the two inputs may
  * share a lineage (self-as-of over one table), which would otherwise leave
  * duplicate attribute ids across the custom node's children — the analyzer
  * dedups built-in Join nodes, not third-party ones. Right-side columns
  * whose names clash with a left column are suffixed (default "_r") so the
  * joined output has unambiguous names. */
object AsOfJoin {
  def asOf(
      leftDf: DataFrame,
      rightDf: DataFrame,
      keyCol: String,
      timeCol: String,
      rightSuffix: String = "_r"): DataFrame = {
    val spark = leftDf.sparkSession
    // name matching follows the session's resolution mode (case-insensitive
    // by default) — built-in joins resolve "TS" against "ts"; this one must
    // not be stricter
    val resolver = spark.sessionState.conf.resolver
    val leftNames = leftDf.columns.toSet
    def rName(c: String): String =
      if (leftNames.exists(l => resolver(l, c))) c + rightSuffix else c
    // fresh exprIds on the right side (Alias allocates new ids)
    val rightAliased = rightDf.select(
      rightDf.columns.map(c => rightDf.col(c).as(rName(c))).toIndexedSeq: _*)
    val lPlan = ColumnBridge.analyzedPlan(leftDf)
    val rPlan = ColumnBridge.analyzedPlan(rightAliased)
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val (lKey, rKey) = (resolve(lPlan, keyCol), resolve(rPlan, rName(keyCol)))
    val (lTime, rTime) = (resolve(lPlan, timeCol), resolve(rPlan, rName(timeCol)))
    // both codegen'd orderings in AsOfJoinExec are generated from the LEFT
    // side's types and read the packed pair row positionally — a right side
    // of a different physical type (INT vs BIGINT key, DATE vs TIMESTAMP
    // time) would be reinterpreted bit-wise, silently matching wrong rows.
    // Unlike built-in joins there is no analyzer coercion on a third-party
    // node, so mismatches are rejected loudly; cast a side explicitly.
    def sameType(side: String, l: Expression, r: Expression): Unit =
      require(l.dataType.sql == r.dataType.sql,
        s"as-of $side type mismatch: left ${l.dataType.sql} vs right " +
          s"${r.dataType.sql} — cast one side before asOf()")
    sameType("key", lKey, rKey)
    sameType("time", lTime, rTime)
    ColumnBridge.dataFrame(spark,
      AsOfJoinPlan(lPlan, rPlan, lKey, rKey, lTime, rTime))
  }
}
