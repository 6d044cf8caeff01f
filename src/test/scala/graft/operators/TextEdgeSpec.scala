package graft.operators

import graft.SparkTestSession
import graft.engine.Api
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics not covered by the oracle gate: lang-ID tie-break order,
  * MapType JSON parsing (map functions beyond the struct path), and the
  * API's VM t-size route.
  */
class TextEdgeSpec extends AnyFunSuite with SparkTestSession {

  test("lang-ID tie-break: zero scores everywhere predict 'en' (fold order)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("langid").toString
    Seq(
      (1L, "no marker words here at all", "zh", "s", 27L),
      (2L, "le la et le la", "fr", "s", 14L), // fr markers dominate
      (3L, "der die und the a and", "de", "s", 21L), // 3-3 tie: en wins (earlier)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.q31LangId(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "fr")
    assert(got(3L) == "en", "ties keep the earlier language in fold order")
  }

  test("events.props parses as MapType too (map functions path)") {
    import spark.implicits._
    val df = Seq("""{"k": 1}""", """{"k": 2, "extra": 9}""").toDF("props")
      .withColumn("m", from_json(col("props"), lit("MAP<STRING, INT>")))
    val exploded = df.select(explode(col("m")).as(Seq("key", "value")))
      .groupBy(col("key")).agg(sum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exploded == Map("k" -> 3L, "extra" -> 9L))
    // map functions over the parsed column
    val keys = df.select(map_keys(col("m")).as("ks")).collect()
      .flatMap(_.getSeq[String](0)).toSet
    assert(keys == Set("k", "extra"))
  }

  test("API GET path honors VM t-size normalization end to end") {
    val r = Api.estimateFromParams(Map(
      "project_name" -> "VM via params",
      "messages_per_second" -> "5000",
      "avg_record_size_bytes" -> "512",
      "worker_node_type" -> "VM",
      "worker_node_t_size" -> " s ", // normalized to S
      "nb_worker_nodes" -> "1",
      "simple_statements" -> "2",
      "medium_statements" -> "1",
      "complex_statements" -> "1",
      "expected_latency_seconds" -> "5.0",
      "data_skew_risk" -> "low",
      "num_distinct_keys" -> "100000",
    )).fold(e => fail(e), identity)
    // t-shirt S overrides the GET default memory (2 GB -> 16384 MB)
    assert(r.input_summary.worker_node_memory_capacity_mb == 16384.0)
    assert(r.input_summary.worker_node_t_size.contains("S"))
    // and matches the VM-S golden sizing
    assert(r.resource_estimates.total_memory_mb == 6144)
  }

  test("multimodal resize preserves decodability over the real corpus") {
    import graft.multimodal.MultimodalOps
    val media = MultimodalOps.mediaFromDocuments(spark, "/root/testdata/sf0.001").limit(50)
    val resized = MultimodalOps.resize(media, newWidth = 8, newHeight = 8)
    val metas = MultimodalOps.decodeMeta(resized).collect()
    assert(metas.length == 50)
    assert(metas.forall(m => m.width == 8 && m.height == 8))
  }

  test("sequence packing fills each bin to the budget (contiguous invariant)") {
    val w = TextQueries.PackBudget
    val bins = TextQueries.q63SequencePacking(spark, "/root/testdata/sf0.001").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    assert(bins.nonEmpty)
    bins.foreach { case ((lang, shard), bs) =>
      // bins are consecutive from 0 and non-empty
      assert(bs.map(_._1).toSeq == (0L until bs.length.toLong), s"$lang/$shard bins")
      assert(bs.forall(_._2 >= 1))
      // pre-sum packing: the cumulative total through every NON-final bin b
      // lands in [(b+1)W, (b+2)W) — each bin fills its budget with at most
      // one doc of overhang
      var cum = 0L
      bs.dropRight(1).zipWithIndex.foreach { case ((b, _, sum), _) =>
        cum += sum
        assert(cum >= (b + 1) * w && cum < (b + 2) * w,
          s"$lang/$shard bin $b: cumulative $cum outside [${(b + 1) * w}, ${(b + 2) * w})")
      }
    }
  }
}
