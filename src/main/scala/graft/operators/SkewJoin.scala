package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (data_skew_risk is a first-class input of
  * the reference model — models.py:26 — and a first-class failure mode at
  * 100 TB).
  *
  * Preference order in this engine:
  *  1. AQE skew-join (on by default in Sessions) — handles detected skew at
  *     runtime with no code change;
  *  2. broadcast — when one side fits (fixed-size dims);
  *  3. [[saltedJoin]] — when the hot side is too big to broadcast AND the
  *     shape defeats AQE (e.g. stream-static joins, or a single key holding
  *     >1 reducer of data): explode the dim side x saltFactor, scatter the
  *     fact side uniformly across the salt space, join on (key, salt).
  *     Costs saltFactor x dim shuffle volume to buy factor-x parallelism on
  *     the hot keys.
  */
object SkewJoin {

  /** Equi-join fact⋈dim on factKey == dimKey with the fact side salted into
    * `saltFactor` sub-keys. Row-deterministic salt (hash of the whole fact
    * row modulo factor) so replays/retries land identically — rand() would
    * break exactly-once sinks. Inner and left_outer are semantics-safe
    * (every fact row meets the full dim partition for its key exactly
    * once); right/full joins would duplicate unmatched dim rows and are
    * rejected. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"salting preserves semantics only for inner/left joins, got $joinType")
    // hash of the whole row: fully duplicate fact rows share a salt (they
    // are indistinguishable anyway); pipelines with a row id should salt on
    // that instead
    val factCols: Seq[Column] = fact.columns.map(col).toSeq
    val salted = fact.withColumn("_salt_f",
      pmod(xxhash64(factCols: _*), lit(saltFactor)).cast("int"))
    val exploded = dim.withColumn("_salt_d",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(exploded,
        salted(factKey) === exploded(dimKey) &&
          salted("_salt_f") === exploded("_salt_d"),
        joinType)
      .drop("_salt_f", "_salt_d")
  }
}
