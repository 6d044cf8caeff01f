package graft.engine

import graft.SparkTestSession
import graft.core.{EstimationInput, Validation}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Column-predicate validation vs the Scala smart constructor: the property
  * VERDICT r1 asked for — a sweep of N valid + M invalid rows yields exactly
  * N results and M rejects, with rule-level agreement row by row.
  *
  * Properties run over ScalaCheck generators sampled from fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache; explicit seeds
  * also make failures replayable).
  */
class ColumnValidationSpec extends AnyFunSuite with SparkTestSession {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"generator exhausted at seed $seed"))

  private val genValid: Gen[EstimationInput] = for {
    name <- Gen.alphaNumStr.suchThat(_.trim.nonEmpty).map(_.take(50))
    mps <- Gen.choose(1, 2000000)
    bytes <- Gen.choose(1, 1048576)
    apps <- Gen.choose(1, 5)
    keys <- Gen.choose(1L, 2000000000L)
    skew <- Gen.oneOf("low", "medium", "high")
    lat <- Gen.oneOf(0.1, 0.5, 1.0, 5.0, 30.0)
    s <- Gen.choose(0, 20); m <- Gen.choose(0, 20); c <- Gen.choose(0, 20)
    memMb <- Gen.choose(4096.0, 512 * 1024.0)
    cpu <- Gen.choose(2, 256)
    nodes <- Gen.choose(1, 50)
    (tpe, tsize) <- Gen.oneOf(("bare_metal", None), ("VM", Some("S")),
      ("VM", Some("M")), ("VM", Some("L")))
  } yield EstimationInput(name, mps, bytes, apps, keys, skew, 10, lat, s, m, c,
    memMb, cpu, nodes, tpe, tsize)

  /** Corrupt one field of a valid input in a recognizably-invalid way. */
  private val breakages: Seq[EstimationInput => EstimationInput] = Seq(
    in => in.copy(project_name = "   "),
    in => in.copy(messages_per_second = 0),
    in => in.copy(avg_record_size_bytes = -5),
    in => in.copy(num_distinct_keys = 0),
    in => in.copy(data_skew_risk = "extreme"),
    in => in.copy(expected_latency_seconds = 0.0),
    in => in.copy(simple_statements = -1),
    in => in.copy(worker_node_memory_mb = 512 * 1024 + 1),
    in => in.copy(worker_node_cpu_max = 1),
    in => in.copy(worker_node_type = "VM", worker_node_t_size = None),
    in => in.copy(worker_node_t_size = Some("XL")))

  private val genInvalid: Gen[EstimationInput] = for {
    base <- genValid
    breakage <- Gen.oneOf(breakages)
  } yield breakage(base)

  test("property: N valid + M invalid rows yield N results and M rejects") {
    import spark.implicits._
    (1L to 10L).foreach { seed =>
      val good = sample(Gen.listOfN(8, genValid), seed)
      val bad = sample(Gen.listOfN(5, genInvalid), seed + 1000)
      val mixed = new scala.util.Random(seed).shuffle(good ++ bad)
      val (valid, rejects) = ColumnValidation.partition(
        spark.createDataset(mixed).toDF())
      assert(valid.count() == good.size.toLong, s"seed $seed")
      assert(rejects.count() == bad.size.toLong, s"seed $seed")
    }
  }

  test("property: column rules agree with the Scala validator rule-for-rule") {
    import spark.implicits._
    (1L to 10L).foreach { seed =>
      val inputs = sample(Gen.listOfN(6, Gen.oneOf(genValid, genInvalid)), seed)
      val got = ColumnValidation.withErrors(spark.createDataset(inputs).toDF())
        .select("project_name", "_errors").collect()
        .map(r => r.getSeq[String](1).toList)
      // row order is preserved for a narrow projection over a local dataset
      inputs.zip(got).foreach { case (in, colErrs) =>
        val scalaErrs = Validation.validate(in).left.getOrElse(Nil)
        assert(colErrs == scalaErrs, s"seed $seed: rule disagreement for $in")
      }
    }
  }

  test("null required columns and NaN latency reject instead of passing as valid") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    // a raw frame (spark.read.json of a sweep file) can carry nulls the
    // case class cannot; a bare `null <= 0` predicate is NULL, which
    // when() drops — these rows used to land in the VALID partition and
    // crash at deserialization
    val base = spark.createDataset(Seq(sample(genValid, 7L))).toDF()
    def errs(df: org.apache.spark.sql.DataFrame): Seq[String] =
      ColumnValidation.withErrors(df).select("_errors")
        .as[Seq[String]].collect().head
    val nullMps = base.withColumn("messages_per_second", lit(null).cast("int"))
    assert(errs(nullMps).exists(_.startsWith("messages_per_second")))
    val nullType = base.withColumn("worker_node_type", lit(null).cast("string"))
    assert(errs(nullType).exists(_.startsWith("worker_node_type")))
    val nanLat = base.withColumn("expected_latency_seconds", lit(Double.NaN))
    // Spark orders NaN above every value (NaN > 0 is TRUE); the scalar
    // validator's Java NaN > 0 is false — both must reject
    assert(errs(nanLat).exists(_.startsWith("expected_latency_seconds")))
    val (valid, rejects) = ColumnValidation.partition(nullMps)
    assert(valid.count() == 0 && rejects.count() == 1)
  }

  test("partition normalizes valid rows like the smart constructor") {
    import spark.implicits._
    val in = EstimationInput(project_name = "  Padded  ",
      worker_node_type = "VM", worker_node_t_size = Some("M"),
      worker_node_memory_mb = 1.0, worker_node_cpu_max = 99)
    val (valid, rejects) = ColumnValidation.partition(
      spark.createDataset(Seq(in)).toDF())
    assert(rejects.count() == 0)
    val row = valid.head()
    assert(row.getString(row.fieldIndex("project_name")) == "Padded")
    assert(row.getDouble(row.fieldIndex("worker_node_memory_mb")) == 65536.0)
    assert(row.getInt(row.fieldIndex("worker_node_cpu_max")) == 16)
  }

  test("strict mode raises with the rule message on invalid rows") {
    import spark.implicits._
    val bad = EstimationInput(project_name = "x", messages_per_second = -1)
    // raise_error surfaces as SparkRuntimeException, which is
    // private[spark] at the Scala level — catch by shape instead.
    val ex = intercept[RuntimeException] {
      ColumnValidation.strict(spark.createDataset(Seq(bad)).toDF()).collect()
    }
    assert(ex.getClass.getSimpleName.contains("Spark"))
    assert(ex.getMessage.contains("messages_per_second"))
    // and passes valid rows through untouched
    val ok = EstimationInput(project_name = "x")
    val out = ColumnValidation.strict(spark.createDataset(Seq(ok)).toDF()).collect()
    assert(out.length == 1)
  }
}
