package graft.tools

import graft.Sessions
import graft.operators.{DedupQueries, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Controlled q122 scale measurement (VERDICT r15 #2): the sf10 smoke read
  * 13x wall-clock for 10x data, attributed — not measured — to family
  * growth. gen_scale keeps the POST-SHIFT doc_id%7==0 slice verbatim per
  * replica (replica 0 entirely verbatim); since the 10^6 id shift is ~1
  * mod 7, a base doc is kept in every 7th replica — so cross-replica
  * exact-dup families run ~2-3 copies at sf1.0 (10 reps) but ~15-16 at
  * sf10 (100 reps). q122's OUTPUT is k-1 rows per k-copy family, so its
  * output cardinality is corpus-linear only when family size is held
  * fixed; across the raw smoke pair both the pair surface and the CC
  * resolve's candidate edges grow faster than the corpus.
  *
  * This tool separates the two variables with a CONTROLLED 10x corpus:
  * ten copies of sf1.0 under disjoint id ranges, with every whitespace
  * token tagged "_g" per copy. Word-level tagging maps each shard's
  * shingle universe bijectively onto a disjoint one, so WITHIN a shard
  * both exact-equality classes and minhash similarity structure are
  * identical to sf1.0's, while ACROSS shards no shingle is shared — no
  * band collisions, no family merges (a trailing-suffix control would
  * fail exactly there: texts differing only in a tail token still
  * signature-collide). Family COUNT grows 10x; the size distribution is
  * sf1.0's verbatim. The tool races q122 over sf1.0, raw sf10, and the
  * control, reporting wall-clock AND output rows plus rows-normalized
  * ratios. The claim under test: the controlled ratio is ~linear
  * (<= ~data ratio), and the raw-vs-control gap matches the
  * output-cardinality law above — i.e. q122 is corpus-linear at fixed
  * family size, and the sf10 excess is output, not plan defect.
  * (Expect the control's rows_ratio to sit a few percent off exactly
  * 10.0: renaming changes the md5 inputs, so each shard draws its own
  * LSH realization and BORDERLINE near-dup band collisions differ per
  * shard — the Jaccard structure, not the candidate draw, is what the
  * tagging preserves. Verified at sf0.01: zero cross-shard families.)
  *
  * Usage: runMain graft.tools.FamilyScaleSmoke [outJson]
  *   SPARK_GRAFT_SF1_DIR  (default target/sf1.0)
  *   SPARK_GRAFT_SF10_DIR (default target/sf10)
  */
object FamilyScaleSmoke {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val out = args.headOption.getOrElse("artifacts/FAMILY_SMOKE_r16.json")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1.0")
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "target/sf10")
    // control-dir name tracks the source dir: a trial run at a smaller SF
    // must not satisfy the real run's idempotent skip
    val ctlDir = s"target/fam_ctl_${Paths.get(sf1).getFileName}"
    val spark = Sessions.build("local[32]", 32, "graft-family-scale")

    buildControlled(spark, sf1, ctlDir)

    def leg(dir: String): (Double, Long) = {
      var rows = 0L
      val sec = SmokeHarness.timed(spark) {
        rows = DedupQueries.q122CanonicalPairs(spark, dir).count()
      }
      (sec, rows)
    }
    val (t1, r1) = leg(sf1)
    System.err.println(f"[family] sf1 $t1%.2f s, $r1 rows")
    val (t10, r10) = leg(sf10)
    System.err.println(f"[family] sf10 raw $t10%.2f s, $r10 rows")
    val (tc, rc) = leg(ctlDir)
    System.err.println(f"[family] sf10 fam_ctl $tc%.2f s, $rc rows")

    // max(1, rows) guards the per-row normalizations: a zero-row leg must
    // not render Infinity/NaN into the JSON artifact (review r16)
    def g(r: Long): Double = math.max(1L, r).toDouble
    val json =
      f"""{"metric":"q122_family_scale","data_ratio":10.0,""" +
        f""""sf1":{"sec":$t1%.3f,"rows":$r1},""" +
        f""""sf10_raw":{"sec":$t10%.3f,"rows":$r10,"ratio":${t10 / t1}%.2f,"rows_ratio":${r10 / g(r1)}%.2f,"sec_per_row_ratio":${(t10 / g(r10)) / (t1 / g(r1))}%.2f},""" +
        f""""sf10_fam_ctl":{"sec":$tc%.3f,"rows":$rc,"ratio":${tc / t1}%.2f,"rows_ratio":${rc / g(r1)}%.2f,"sec_per_row_ratio":${(tc / g(rc)) / (t1 / g(r1))}%.2f}}"""
    println(json)
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }

  /** The controlled corpus: ten tagged copies of the sf1.0 documents
    * table. Copy g shifts doc_id by g*10^9 and maps every whitespace
    * token w -> w_g. EVERY shard is tagged, shard 0 included: with
    * same-length pairwise-distinct suffixes, a cross-shard token equality
    * orig_a+T_a == orig_b+T_b forces T_a == T_b (last character), so
    * shingle disjointness across shards holds UNCONDITIONALLY — an
    * untagged shard 0 would re-admit collisions for original tokens that
    * happen to end in another shard's tag (review r16). Within a shard
    * the rename is bijective, so the family-size distribution is sf1.0's
    * verbatim. n_chars tracks the rewritten text. Idempotent: skipped
    * only when Spark's _SUCCESS marker exists — a crashed partial write
    * must rebuild, not get measured (review r16). */
  private def buildControlled(spark: SparkSession, sf1: String, ctlDir: String): Unit = {
    val done = Paths.get(ctlDir, "documents.parquet")
    if (Files.exists(done.resolve("_SUCCESS"))) return
    val docs = Tables.documents(spark, sf1)
    val shards = (0 until 10).map { g =>
      docs.withColumn("text",
          when(col("text").isNotNull,
            array_join(transform(split(col("text"), " "),
              w => concat(w, lit(s"_$g"))), " ")))
        .withColumn("doc_id", col("doc_id") + lit(g.toLong * 1000000000L))
        .withColumn("n_chars",
          when(col("text").isNotNull, length(col("text")).cast("long")))
    }
    shards.reduce(_ unionByName _).write.mode("overwrite").parquet(done.toString)
  }
}
