package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the most recent right row
  * at-or-before its timestamp within the same key — the trades/quotes join
  * of time-series engines, and the attribution join ("purchase -> last
  * preceding click") of event pipelines. The reference prices keyed-stream
  * temporal lookups; Spark has no batch ASOF operator, so the engine
  * provides one (SURVEY §4 custom-operator ladder, rung (a): composition).
  *
  * Scale shape: the naive formulation is a range join (every purchase x
  * every earlier click of that user — quadratic in events per key) or a
  * per-key max-date subquery (two joins, two shuffles). This formulation is
  * the canonical single-shuffle one: UNION both sides tagged, hash-shuffle
  * once on the key, sort once by (ts, side), and carry the latest right row
  * forward with last(_, ignoreNulls) over an unbounded-preceding frame.
  * O(n log n) per partition, no join blow-up, and at 100 TB it is one
  * exchange of each input — strictly better than any join-based plan.
  * Catalyst pipelines the two window functions into ONE Window operator
  * (same partitioning/ordering), plan-verified.
  */
object AsOfQueries {

  /** Q46 — click-attribution as-of join over `events`: each purchase joined
    * to the user's most recent click at-or-before it (LEFT semantics: the
    * first purchase of a user may precede any click -> NULL attribution).
    * (user_id, ts) is unique in the testdata, so tie-break order between a
    * click and a purchase at the same instant cannot arise; the window still
    * orders clicks first (is_purchase asc) so equal-instant clicks would
    * count, matching the oracle's `p.ts >= c.ts` ASOF condition. Oracle:
    * DuckDB's native ASOF LEFT JOIN — an independent implementation of the
    * same semantics, not a mirror of this plan.
    *
    * sf1.0 floor ruling (r15, benched alone min-of-3): 1.66 s vs DuckDB
    * 0.28 s. The plan is ONE exchange + one sort + one Window over the
    * filtered event union — the minimal as-of shape (tagging both sides
    * into one stream turns the inequality join into a running
    * last(ignoreNulls) sweep; an inequality SortMergeJoin would be
    * strictly worse). The residual is
    * the row-at-a-time Window exec over ~2M filtered events vs DuckDB's
    * native vectorized ASOF operator. Single shuffle, partitioned by
    * user_id — the 100 TB shape. Floor. */
  def q46AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .filter($"event_type".isin("purchase", "click"))
      .select($"user_id", $"ts", $"event_id",
        ($"event_type" === "purchase").as("is_purchase"))
    val tagged = ev.select(
      $"user_id", $"ts", $"event_id", $"is_purchase",
      // a null-ts click is not an attribution candidate: the oracle's
      // ASOF `p.ts >= c.ts` never matches NULL and the q47 custom
      // operator skips null-time right rows — without this guard the
      // nulls-first sort would attribute such a click with a NULL gap
      when(!$"is_purchase" && $"ts".isNotNull, $"event_id").as("click_id"),
      when(!$"is_purchase" && $"ts".isNotNull, unix_micros($"ts")).as("click_us"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"is_purchase".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_us", last($"click_us", ignoreNulls = true).over(w))
      .filter($"is_purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts",
        $"last_click_id",
        (unix_micros($"ts") - $"last_click_us").as("gap_us"))
      .orderBy($"user_id".asc, $"purchase_id".asc)
  }

  /** Q47 — the same attribution as-of, through the custom whole-operator
    * path ([[graft.plans.AsOfJoin]]: LogicalPlan + Strategy + merge-sweep
    * SparkPlan, SURVEY §4 ladder rung (c)) instead of the union+window
    * composition. Same independent DuckDB ASOF oracle as q46 — the two
    * entries cross-check each other through the gate. */
  def q47AsOfCustom(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("last_click_id"))
    graft.plans.AsOfJoin.asOf(purchases, clicks, "user_id", "ts")
      .select($"user_id", $"purchase_id", $"ts", $"last_click_id",
        (unix_micros($"ts") - unix_micros($"ts_r")).as("gap_us"))
      .orderBy($"user_id".asc, $"purchase_id".asc)
  }

  val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q46_asof_join" -> (q46AsOfJoin _),
    "q47_asof_custom" -> (q47AsOfCustom _),
  )

  /** DuckDB's ASOF implementation matches a NULL-ts probe to the LAST
    * right row, contradicting its own `p.ts >= c.ts` predicate (NULL
    * comparisons never hold); both engine sides here define null-time
    * rows as unmatchable, so the oracle makes that explicit — null-ts
    * clicks are filtered out, null-ts purchases keep their row with the
    * attribution nulled. */
  private val asofOracleSql =
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts,
      |  CASE WHEN p.ts IS NULL THEN NULL ELSE c.event_id END AS last_click_id,
      |  CASE WHEN p.ts IS NULL THEN NULL
      |       ELSE epoch_us(p.ts) - epoch_us(c.ts) END AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events
      |                WHERE event_type = 'click' AND ts IS NOT NULL) c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.user_id NULLS FIRST, purchase_id NULLS FIRST""".stripMargin

  val oracle: Map[String, String] = Map(
    "q46_asof_join" -> asofOracleSql,
    "q47_asof_custom" -> asofOracleSql,
  )
}
