package graft.tools

import graft.Sessions
import graft.operators.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocab-scale smoke for BPE training (dev tool; VERDICT r9 #2 "done"
  * evidence): the collapse-first claim is that after the one corpus scan
  * that builds the (word, freq) census, every merge round touches only
  * the VOCABULARY — so growing the corpus without growing the vocab must
  * leave per-round cost flat. The smoke builds a fixed-vocab synthetic
  * corpus at 1× and 4× duplication, times [[TextQueries.bpeTrain]] at 2
  * and 8 rounds at each scale (per-round cost = (t8 − t2) / 6, isolating
  * the loop from the initial census), and also asserts the 4× corpus
  * yields the SAME merge sequence with every count exactly 4× — exact
  * duplication scales every pair count uniformly, so the argmax path
  * cannot change.
  *
  * Usage: runMain graft.tools.BpeSmoke [smallDocs] [vocab]
  */
object BpeSmoke {
  private val PerDoc = 30

  /** nDocs docs of PerDoc words drawn deterministically from a fixed
    * vocab of `vocab` multi-char words; `rep` exact duplications. */
  private def corpus(spark: SparkSession, nDocs: Int, vocab: Int, rep: Int): DataFrame =
    spark.range(nDocs.toLong * rep).select(
      concat_ws(" ", (0 until PerDoc).map { p =>
        // id % nDocs: replica r is an exact copy of replica 0
        concat(lit("w"), (((col("id") % nDocs) * 31 + p * 7) % vocab).cast("string"))
      }: _*).as("text"))
      .repartition(32)
      .localCheckpoint() // time the trainer, not the generator

  private def timed(f: => DataFrame): Double = {
    def run(): Double = {
      val t0 = System.nanoTime()
      f.count() // bpeTrain is driver-eager; the count just forces the tiny result
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    math.min(run(), run())
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val small = args.headOption.map(_.toInt).getOrElse(20000)
    val vocab = args.lift(1).map(_.toInt).getOrElse(30000)
    val spark = Sessions.build("local[32]", 32, "graft-bpe-smoke")

    val ds = corpus(spark, small, vocab, 1)
    val db = corpus(spark, small, vocab, 4)

    // merge-sequence invariance under exact duplication: same pairs in the
    // same order, counts exactly 4x
    val ms = TextQueries.bpeTrain(ds, 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
    val mb = TextQueries.bpeTrain(db, 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
    require(ms.map(t => (t._1, t._2)).sameElements(mb.map(t => (t._1, t._2))),
      s"merge sequence changed under duplication:\n${ms.mkString("\n")}\nvs\n${mb.mkString("\n")}")
    require(ms.zip(mb).forall { case (s, b) => b._3 == 4L * s._3 },
      "duplicated counts are not exactly 4x")

    val t2s = timed(TextQueries.bpeTrain(ds, 2))
    val t8s = timed(TextQueries.bpeTrain(ds, 8))
    val t2b = timed(TextQueries.bpeTrain(db, 2))
    val t8b = timed(TextQueries.bpeTrain(db, 8))
    val perRoundS = (t8s - t2s) / 6
    val perRoundB = (t8b - t2b) / 6
    println(
      f"""{"metric":"bpe_smoke","small_docs":$small,"vocab":$vocab,"rep":4,"t2_small_sec":$t2s%.2f,"t8_small_sec":$t8s%.2f,"t2_big_sec":$t2b%.2f,"t8_big_sec":$t8b%.2f,"per_round_small_sec":$perRoundS%.3f,"per_round_big_sec":$perRoundB%.3f,"per_round_growth":${perRoundB / perRoundS}%.2f}""")
    spark.stop()
  }
}
