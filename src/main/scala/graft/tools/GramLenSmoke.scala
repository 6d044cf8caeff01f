package graft.tools

import graft.Sessions
import graft.operators.TextQueries
import org.apache.spark.sql.functions._

/** Decontamination gram-length smoke (dev tool): run the q66 probe at the
  * default 3-word gram and at the published 13-word setting (GPT-3-style
  * overlap filtering; `spark.graft.decontam.grams`) on a real corpus,
  * recording wall time and the contaminated-doc fraction — evidence the
  * family is length-PARAMETERIZED: only the ngram window changes; the
  * distinct-gram collapse, the broadcast benchmark probe, and every
  * shuffle key keep their shape, and longer grams mean FEWER rows on both
  * sides.
  *
  * Usage: runMain graft.tools.GramLenSmoke [sfDir]
  */
object GramLenSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("local[32]", 32, "graft-gramlen-smoke")
    val trainDocs = graft.operators.Tables.documents(spark, dir)
      .filter(col("doc_id") % TextQueries.DecontamMod =!= TextQueries.DecontamRes)
      .count()
    def runAt(n: Int): (Double, Long) = {
      spark.conf.set(TextQueries.DecontamGramsKey, n.toString)
      val t0 = System.nanoTime()
      val hit = TextQueries.q66Decontamination(spark, dir).count()
      ((System.nanoTime() - t0) / 1e9, hit)
    }
    val results = Seq(3, 13).map { n =>
      val (sec, hit) = runAt(n)
      f"""{"grams":$n,"sec":$sec%.2f,"train_docs":$trainDocs,"contaminated":$hit,"frac":${hit.toDouble / trainDocs}%.5f}"""
    }
    spark.conf.unset(TextQueries.DecontamGramsKey)
    println(s"""{"metric":"gramlen_smoke","dir":"$dir","runs":[${results.mkString(",")}]}""")
    spark.stop()
  }
}
