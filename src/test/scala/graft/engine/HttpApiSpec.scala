package graft.engine

import graft.SparkTestSession
import graft.core.EstimationInput
import org.scalatest.funsuite.AnyFunSuite
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.http.HttpRequest.BodyPublishers
import java.net.http.HttpResponse.BodyHandlers

/** End-to-end tests of the web surface against a live ephemeral-port server:
  * every reference endpoint (main.py:126-525) answered with the same status
  * codes and envelopes, and the JSON/form paths agreeing with the direct
  * [[Engine]]/[[Api]] calls the oracle entries already pin.
  */
class HttpApiSpec extends AnyFunSuite with SparkTestSession {

  private lazy val runDir =
    java.nio.file.Files.createTempDirectory("http_runs").toString
  private lazy val api =
    new HttpApi(new RunStore(spark, runDir)).start()
  private lazy val base = s"http://localhost:${api.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET.build(),
      BodyHandlers.ofString())

  private def post(path: String, body: String, ctype: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", ctype)
      .POST(BodyPublishers.ofString(body)).build(), BodyHandlers.ofString())

  private def delete(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).DELETE.build(),
      BodyHandlers.ofString())

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("health endpoint answers") {
    val r = get("/health")
    assert(r.statusCode == 200 && r.body.contains("ok"))
  }

  test("static assets serve with correct content types; pages link them") {
    val css = get("/static/style.css")
    assert(css.statusCode == 200, css.body)
    assert(css.headers.firstValue("Content-Type").orElse("") == "text/css; charset=utf-8")
    assert(css.body.contains("body"))
    val png = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/static/logo.png")).GET.build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(png.statusCode == 200)
    assert(png.headers.firstValue("Content-Type").orElse("") == "image/png")
    assert(png.body.take(4).sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    // the HTML shell references the stylesheet; the landing page the logo
    assert(get("/").body.contains("/static/style.css"))
    assert(get("/").body.contains("/static/logo.png"))
  }

  test("static route 404s unknown assets and rejects traversal names") {
    assert(get("/static/nope.css").statusCode == 404)
    assert(get("/static/").statusCode == 404)
    // encoded traversal must not escape the static namespace
    assert(get("/static/..%2Flog4j2.properties").statusCode == 404)
  }

  test("GET /api/estimate computes with query-param defaults; agrees with " +
      "the direct Api path; 400 on missing/invalid params") {
    // the GET defaults are 2 GB / 3 nodes: pass a worker size that can
    // actually host the TM (the kernel 400s infeasible placements)
    val r = get("/api/estimate?project_name=web%20test&messages_per_second=5000" +
      "&avg_record_size_bytes=512&worker_node_memory_gb=16")
    assert(r.statusCode == 200, r.body)
    val direct = Api.estimateFromParams(Map(
      "project_name" -> "web test", "messages_per_second" -> "5000",
      "avg_record_size_bytes" -> "512",
      "worker_node_memory_gb" -> "16")).toOption.get
    val got = mapper.readTree(r.body)
    assert(got.get("resource_estimates").get("total_cpus").asInt ==
      direct.resource_estimates.total_cpus)
    assert(got.get("resource_estimates").get("total_memory_mb").asLong ==
      direct.resource_estimates.total_memory_mb)
    assert(got.get("cluster_recommendations").get("taskmanagers")
      .get("count").asInt == direct.cluster_recommendations.taskmanagers.count)
    // missing required param -> 400 with the reference envelope
    val bad = get("/api/estimate?messages_per_second=5000")
    assert(bad.statusCode == 400, bad.body)
    assert(mapper.readTree(bad.body).get("message").asText ==
      "Invalid input parameters")
    // unparsable number -> 400 too
    val bad2 = get("/api/estimate?project_name=x&messages_per_second=abc" +
      "&avg_record_size_bytes=512")
    assert(bad2.statusCode == 400)
  }

  test("POST /api/estimate decodes JSON with MODEL defaults (not the GET " +
      "defaults) and 500s on invalid input") {
    // only required field: everything else takes EstimationInput defaults
    val r = post("/api/estimate", """{"project_name":"json test"}""",
      "application/json")
    assert(r.statusCode == 200, r.body)
    val direct = Engine.estimateOne(
      EstimationInput(project_name = "json test")).result.get
    val got = mapper.readTree(r.body)
    assert(got.get("resource_estimates").get("total_cpus").asInt ==
      direct.resource_estimates.total_cpus)
    assert(got.get("input_summary").get("total_throughput_mb_per_sec").asDouble ==
      direct.input_summary.total_throughput_mb_per_sec)
    // model default latency is 5.0 (GET default is 1.0): check the decode
    // honored the model default via the scaling recs' checkpoint interval
    val explicit = post("/api/estimate",
      """{"project_name":"json test","expected_latency_seconds":5.0}""",
      "application/json")
    assert(mapper.readTree(explicit.body) == got)
    // invalid -> 500 with the reference envelope (main.py:279-283)
    val bad = post("/api/estimate",
      """{"project_name":"x","messages_per_second":-5}""", "application/json")
    assert(bad.statusCode == 500, bad.body)
    assert(mapper.readTree(bad.body).get("message").asText ==
      "Failed to calculate estimation")
    val notJson = post("/api/estimate", "not json", "application/json")
    assert(notJson.statusCode == 500)
  }

  test("save / list / download / delete lifecycle over HTTP") {
    val saved = post("/api/save-estimation",
      """{"project_name":"http lifecycle","messages_per_second":9000}""",
      "application/json")
    assert(saved.statusCode == 200, saved.body)
    val env = mapper.readTree(saved.body)
    assert(env.get("success").asBoolean)
    val filename = env.get("filename").asText
    assert(filename.startsWith("http_lifecycle_") && filename.endsWith(".json"))

    val listed = mapper.readTree(get("/saved-estimations").body)
    assert(listed.get("success").asBoolean)
    assert(listed.get("count").asInt >= 1)
    val names = (0 until listed.get("files").size)
      .map(listed.get("files").get(_).get("filename").asText)
    assert(names.contains(filename))

    val dl = get(s"/download/$filename")
    assert(dl.statusCode == 200)
    val stored = mapper.readTree(dl.body)
    assert(stored.get("metadata").get("project_name").asText == "http lifecycle")
    assert(stored.get("input_parameters").get("messages_per_second").asInt == 9000)

    // reload renders the results page for the stored run
    val reloaded = get(s"/reload/$filename")
    assert(reloaded.statusCode == 200 && reloaded.body.contains("http lifecycle"))

    // traversal guard 400; delete 200; second delete 404
    assert(delete("/delete-estimation/..%2Fetc").statusCode == 400)
    assert(delete(s"/delete-estimation/$filename").statusCode == 200)
    assert(delete(s"/delete-estimation/$filename").statusCode == 404)
    assert(get(s"/download/$filename").statusCode == 404)
  }

  test("HTML form flow (B3): form page renders, POST /estimate returns the " +
      "results page with conf snippet and prefill round-trip") {
    val form = get("/estimation-form")
    assert(form.statusCode == 200)
    assert(form.body.contains("name=\"messages_per_second\""))
    // query-param prefill (main.py:93-112)
    val prefilled = get("/estimation-form?project_name=prefilled&messages_per_second=123")
    assert(prefilled.body.contains("value=\"prefilled\"") &&
      prefilled.body.contains("value=\"123\""))

    val res = post("/estimate",
      "project_name=form+flow&messages_per_second=5000&avg_record_size_bytes=512" +
        "&worker_node_memory_gb=16",
      "application/x-www-form-urlencoded")
    assert(res.statusCode == 200, res.body)
    assert(res.body.contains("form flow"))
    // B11 snippet present with the ceil-div slot count
    assert(res.body.contains("taskmanager.numberOfTaskSlots"))
    // B10 prefill round-trip: the rendered hidden form re-submits the run
    assert(res.body.contains("name=\"messages_per_second\" value=\"5000\""))
    // invalid form input renders the error banner, not a 5xx
    val err = post("/estimate", "project_name=&messages_per_second=5000",
      "application/x-www-form-urlencoded")
    assert(err.statusCode == 200 && err.body.contains("Estimation failed"))

    // form save flow writes through the same RunStore
    val saved = post("/save-estimation",
      "project_name=form+saved&messages_per_second=5000&avg_record_size_bytes=512" +
        "&worker_node_memory_gb=16",
      "application/x-www-form-urlencoded")
    assert(saved.statusCode == 200 && saved.body.contains("saved successfully"))
    val listed = mapper.readTree(get("/saved-estimations").body)
    val names = (0 until listed.get("files").size)
      .map(listed.get("files").get(_).get("project_name").asText)
    assert(names.contains("form saved"))
  }

  test("saved and considerations pages render; unknown path 404s") {
    assert(get("/saved").statusCode == 200)
    assert(get("/considerations").statusCode == 200)
    assert(get("/nope").statusCode == 404)
  }

  test("GET / is a landing page distinct from the form, linking the four pages " +
      "(main.py:126-129 home.html; VERDICT r7 what's-missing #3)") {
    val home = get("/")
    assert(home.statusCode == 200)
    // navigation, not the form: no input fields, links to each page
    assert(!home.body.contains("<form"))
    assert(!home.body.contains("name=\"messages_per_second\""))
    for (target <- Seq("/estimation-form", "/considerations", "/saved", "/docs"))
      assert(home.body.contains(s"href=\"$target\""), s"missing link to $target")
    // the form page remains a distinct, different document
    assert(get("/estimation-form").body != home.body)
  }

  test("GET /openapi.json describes every route and the full EstimationInput " +
      "schema (VERDICT r7 what's-missing #1)") {
    val r = get("/openapi.json")
    assert(r.statusCode == 200)
    val doc = mapper.readTree(r.body)
    assert(doc.get("openapi").asText.startsWith("3.1"))
    assert(doc.get("info").get("title").asText == "Flink Resource Estimator")
    val paths = doc.get("paths")
    // every route the server answers is described
    val expected = Seq("/health", "/", "/estimation-form", "/considerations",
      "/saved", "/estimate", "/api/estimate", "/save-estimation",
      "/api/save-estimation", "/download/{filename}",
      "/delete-estimation/{filename}", "/reload/{filename}",
      "/saved-estimations", "/openapi.json", "/docs")
    for (p <- expected) assert(paths.has(p), s"missing path $p")
    // both methods on /api/estimate; DELETE on delete-estimation
    assert(paths.get("/api/estimate").has("get") && paths.get("/api/estimate").has("post"))
    assert(paths.get("/delete-estimation/{filename}").has("delete"))
    // EstimationInput schema carries every reference field (models.py:19-84)
    val input = doc.get("components").get("schemas").get("EstimationInput")
    val fields = Seq("project_name", "messages_per_second",
      "avg_record_size_bytes", "number_flink_applications",
      "num_distinct_keys", "data_skew_risk", "bandwidth_capacity_gbps",
      "expected_latency_seconds", "simple_statements", "medium_statements",
      "complex_statements", "worker_node_memory_mb", "worker_node_cpu_max",
      "nb_worker_nodes", "worker_node_type", "worker_node_t_size")
    for (f <- fields) assert(input.get("properties").has(f), s"missing field $f")
    // reference bounds survive: skew enum, memory cap, cpu range, name length
    assert(input.get("properties").get("data_skew_risk").get("enum").size == 3)
    assert(input.get("properties").get("worker_node_memory_mb").get("maximum").asInt == 524288)
    assert(input.get("properties").get("worker_node_cpu_max").get("maximum").asInt == 256)
    assert(input.get("properties").get("project_name").get("maxLength").asInt == 100)
    // GET /api/estimate documents the QUERY surface: gb-denominated memory
    // with the main.py:226-242 defaults, not the model defaults
    val getParams = paths.get("/api/estimate").get("get").get("parameters")
    val byName = (0 until getParams.size).map(getParams.get)
      .map(p => p.get("name").asText -> p).toMap
    assert(byName.contains("worker_node_memory_gb"))
    assert(byName("data_skew_risk").get("schema").get("default").asText == "medium")
    assert(byName("project_name").get("required").asBoolean)
    // result schema is nested like the reference models
    val schemas = doc.get("components").get("schemas")
    for (s <- Seq("EstimationResult", "InputSummary", "ResourceEstimates",
      "ClusterRecommendations", "JobManagerConfig", "TaskManagerConfig",
      "ScalingRecommendations", "CapacityAnalysis"))
      assert(schemas.has(s), s"missing schema $s")
  }

  test("GET /docs renders the route table from the OpenAPI document") {
    val r = get("/docs")
    assert(r.statusCode == 200)
    assert(r.body.contains("/openapi.json"))
    assert(r.body.contains("/api/estimate"))
    assert(r.body.contains("DELETE"))
  }

  test("JSON decode is pydantic-lenient: null Optional and numeric strings " +
      "estimate 200 instead of 500") {
    val withNull = post("/api/estimate",
      """{"project_name":"lenient","worker_node_t_size":null}""",
      "application/json")
    assert(withNull.statusCode == 200, withNull.body)
    val strNum = post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":"5000"}""",
      "application/json")
    assert(strNum.statusCode == 200, strNum.body)
    // and the coerced value is actually used, not a default
    val r = mapper.readTree(strNum.body)
    assert(r.get("input_summary").get("messages_per_second").asInt == 5000, strNum.body)
    // genuinely non-numeric still fails with the reference's 500 envelope
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":"abc"}""",
      "application/json").statusCode == 500)
    // ...and so do the coercions pydantic rejects: fractional strings for
    // int fields, trailing garbage, and null on a NON-Optional field
    // (worker_node_t_size is the only Optional in the reference model)
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":"5.5"}""",
      "application/json").statusCode == 500)
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":"123abc"}""",
      "application/json").statusCode == 500)
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":null}""",
      "application/json").statusCode == 500)
    // RAW JSON numbers get the same strictness as their string forms:
    // 5.5 for an int field must not truncate to 5, an out-of-int-range
    // literal must not wrap through Jackson's (int) cast — pydantic
    // rejects both; a WHOLE float (5000.0) lax-coerces, also like pydantic
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":5.5}""",
      "application/json").statusCode == 500)
    assert(post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":4294967301}""",
      "application/json").statusCode == 500)
    val whole = post("/api/estimate",
      """{"project_name":"lenient","messages_per_second":5000.0}""",
      "application/json")
    assert(whole.statusCode == 200, whole.body)
    assert(mapper.readTree(whole.body)
      .get("input_summary").get("messages_per_second").asInt == 5000)
  }

  test("form save persists the VALIDATED input: t-shirt rewrite applied, " +
      "identical to what the JSON surface stores") {
    val form = "project_name=tshirt+form+save&messages_per_second=1000&" +
      "avg_record_size_bytes=512&worker_node_type=VM&worker_node_t_size=M"
    val resp = post("/save-estimation", form, "application/x-www-form-urlencoded")
    assert(resp.statusCode == 200 && resp.body.contains("saved successfully"), resp.body)
    val listed = mapper.readTree(get("/saved-estimations").body)
    val filename = (0 until listed.get("files").size)
      .map(listed.get("files").get(_))
      .find(_.get("project_name").asText == "tshirt form save")
      .map(_.get("filename").asText)
    assert(filename.isDefined, listed.toString)
    val stored = mapper.readTree(get(s"/download/${filename.get}").body)
    val in = stored.get("input_parameters")
    // the t-shirt rewrite (B9) must be IN the stored input, as the
    // reference's pydantic model_validator guarantees — not the raw form
    // memory default alongside t-size-derived results
    val (expectedMb, expectedCpu) = graft.core.Validation.VmTshirtMbCpu("M")
    assert(in.get("worker_node_memory_mb").asDouble == expectedMb,
      s"stored input must carry the rewritten memory: $in")
    assert(in.get("worker_node_cpu_max").asInt == expectedCpu, in.toString)
  }
}
