package graft.tools

import graft.Sessions
import graft.operators._
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf10-class scale smoke (VERDICT r12 #5): race the flagship chains at
  * sf1.0 (tools/gen_scale.py, 10 reps of sf0.1) against sf10 (100 reps —
  * 500k docs / 200k embeddings) and report per-stage wall-clock with the
  * 10x data ratio. The claim under test: every shipped plan is
  * census/band/bounded-shaped, so a 10x corpus costs ~10x (linear) or
  * less on fixed cores — a super-linear stage is a plan defect (pair
  * blow-up, unbounded state), exactly what this smoke exists to catch.
  *
  * The sf10 dir carries documents + embeddings only (the LLM-pipeline
  * tables); every raced stage reads only those. Index lifecycles race
  * build and probe separately (the probe batch is the q74 IncrMod split).
  *
  * Usage: runMain graft.tools.Scale100Smoke [outJson]
  *   SPARK_GRAFT_SF1_DIR  (default target/sf1.0)
  *   SPARK_GRAFT_SF10_DIR (default target/sf10)
  */
object Scale100Smoke {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val out = args.headOption.getOrElse("artifacts/SCALE_SMOKE_r13.json")
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1.0")
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "target/sf10")
    val spark = Sessions.build("local[32]", 32, "graft-scale100")

    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => Unit): Double = SmokeHarness.timed(spark)(f)

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def race(name: String)(f: String => Unit): Unit = {
      val t1 = timed(f(sf1))
      val t10 = timed(f(sf10))
      results(name) = (t1, t10)
      System.err.println(f"[scale100] $name sf1=$t1%.2f sf10=$t10%.2f ratio=${t10 / t1}%.2f")
    }

    // document chains
    race("q22_dedup_exact")(d => mat(DedupQueries.q22ExactDedup(spark, d)))
    // q23 vs q62 is the smoke's designed contrast: the sf10 corpus carries
    // 100-copy exact-duplicate families (gen_scale keeps doc_id%7==0
    // verbatim across replicas), so q23's pair-list CONTRACT is quadratic
    // in family multiplicity (C(100,2) pairs per family is the OUTPUT,
    // not a plan defect) while the collapse-first q62 pairs uniques and
    // carries multiplicity as a column — the documented scale path.
    race("q23_minhash_lsh")(d => mat(DedupQueries.q23MinhashLsh(spark, d)))
    race("q62_collapse_first")(d => mat(DedupQueries.q62MinhashUnique(spark, d)))
    // q56 consumes star edges (k-1 per bucket, r13) + contraction CC —
    // the connectivity consumer's answer to the mega-family corpus
    race("q56_dup_clusters")(d => mat(DedupQueries.q56DupClusters(spark, d)))
    race("q71_exact_spans")(d => mat(DedupQueries.q71ExactSpans(spark, d)))
    race("q76_source_overlap")(d => mat(DedupQueries.q76SourceOverlap(spark, d)))
    race("q77_span_dedup")(d => mat(DedupQueries.q77SpanDedup(spark, d)))
    race("q52_curation")(d => mat(CurationPipeline.q52Curation(spark, d)))
    race("q75_curation_v2")(d => mat(CurationPipeline.q75CurationV2(spark, d)))
    race("q88_web_curation")(d => mat(WebCurationQueries.q88WebCuration(spark, d)))
    race("q104_bpe_encode")(d => mat(TextQueries.q104BpeEncode(spark, d)))
    race("q109_bigram_lm")(d => mat(TextQueries.q109BigramLm(spark, d)))
    race("q116_domain_mixture")(d => mat(TextQueries.q116DomainMixture(spark, d)))
    // learned-gate family (r14, VERDICT r13 #6): the LM-census scoring
    // joins (per-occurrence LEFT joins on Zipf-headed gram keys) are the
    // likeliest super-linear surprise after the pair-list contracts — the
    // r13 smoke covered dedup/ANN/pipelines but none of these
    race("q112_trigram_lm")(d => mat(TextQueries.q112TrigramLm(spark, d)))
    race("q102_quality_classifier")(d =>
      mat(WebCurationQueries.q102QualityClassifier(spark, d)))
    race("q115_dsir_weights")(d =>
      mat(WebCurationQueries.q115DsirWeights(spark, d)))
    race("q118_dsir_resample")(d =>
      mat(WebCurationQueries.q118DsirResample(spark, d)))
    // the DoReMi family's heavy half is the census chain — the loops are
    // driver-side over bounded tables, so these two measure the real
    // distributed cost (VERDICT r14 #5: q124 must appear in the smoke)
    race("q124_doremi_refresh")(d => mat(TextQueries.q124DoremiRefresh(spark, d)))
    race("q125_doremi_proxy_retrain")(d =>
      mat(WebCurationQueries.q125DoremiProxyRetrain(spark, d)))
    // the r14 scale-safe pair contract (VERDICT r13 #4 'done' bar: <= ~7x)
    race("q122_neardup_canonical_pairs")(d =>
      mat(DedupQueries.q122CanonicalPairs(spark, d)))
    // multimodal family (VERDICT r15 #5): the media bytes are derived
    // deterministically from documents, so these race on the same corpus;
    // the interesting constant is the per-asset codec work inside the one
    // narrow mapPartitions — q126's PNG decode (CRC walk + Inflater + five
    // defilters per asset) is exactly the stage whose constants could
    // shift at scale
    race("q98_image_phash")(d =>
      mat(graft.multimodal.MultimodalOps.q98ImagePhash(spark, d)))
    race("q99_audio_fingerprint")(d =>
      mat(graft.multimodal.MultimodalOps.q99AudioFingerprint(spark, d)))
    race("q103_video_fingerprint")(d =>
      mat(graft.multimodal.MultimodalOps.q103VideoFingerprint(spark, d)))
    race("q126_png_phash")(d =>
      mat(graft.multimodal.MultimodalOps.q126PngPhash(spark, d)))

    // band-index lifecycle: build on the standing corpus, probe the
    // IncrMod arrival batch against it (the q74 split)
    race("band_index_build") { d =>
      val docs = graft.operators.Tables.documents(spark, d)
        .filter(col("doc_id") % DedupQueries.IncrMod =!= DedupQueries.IncrRes)
      DedupQueries.buildNearDupIndex(spark, docs,
        s"/tmp/graft_scale100_band_${d.split('/').last}")
    }
    race("band_index_probe") { d =>
      val batch = graft.operators.Tables.documents(spark, d)
        .filter(col("doc_id") % DedupQueries.IncrMod === DedupQueries.IncrRes)
      mat(DedupQueries.nearDupAgainstIndex(spark, batch,
        s"/tmp/graft_scale100_band_${d.split('/').last}"))
    }

    // IVF lifecycle: build (codebook + assignments), then the fused
    // build+probe entry as the serving-path stand-in
    race("ivf_index_build") { d =>
      SimilarityQueries.buildIvfIndex(spark, d,
        s"/tmp/graft_scale100_ivf_${d.split('/').last}")
    }
    race("q42_ivf_ann")(d => mat(SimilarityQueries.q42IvfAnn(spark, d)))

    val rows = results.map { case (k, (t1, t10)) =>
      f""""$k":{"sf1_sec":$t1%.3f,"sf10_sec":$t10%.3f,"ratio":${t10 / t1}%.2f}"""
    }.mkString(",")
    val maxRatio = results.values.map { case (a, b) => b / a }.max
    val json =
      f"""{"metric":"scale100_smoke","sf1_dir":"$sf1","sf10_dir":"$sf10","data_ratio":10.0,"max_stage_ratio":$maxRatio%.2f,"stages":{$rows}}"""
    println(json)
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json + "\n")
    spark.stop()
  }
}
