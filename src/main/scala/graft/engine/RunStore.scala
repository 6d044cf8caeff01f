package graft.engine

import graft.core._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Saved-run persistence: the reference's save/list/download/delete/reload
  * surface (A19-A20, B4-B8; /root/reference/src/main.py:286-520,
  * estimation.py:611-656) re-expressed over a Spark-readable store.
  *
  * Single-run save/reload are driver-side file ops (one JSON object per
  * file, the reference's wire format); the LIST endpoint — the reference's
  * one truly executed scan-filter-project-sort pipeline — runs as a real Spark
  * plan over the binaryFile source, so at 10^6 saved runs it parallelizes
  * instead of os.listdir-ing.
  */
final class RunStore(spark: SparkSession, val dir: String) {
  Files.createDirectories(Paths.get(dir)) // mirrors os.makedirs at import

  private val savedSchema = Encoders.product[SavedEstimation].schema

  /** Filename sanitize (estimation.py:645-648): keep alnum / space / dash /
    * underscore, strip trailing whitespace, spaces to underscores. */
  def sanitizeProjectName(name: String): String =
    name.filter(c => c.isLetterOrDigit || c == ' ' || c == '-' || c == '_')
      .reverse.dropWhile(_.isWhitespace).reverse
      .replace(' ', '_')

  /** Path-traversal guard (main.py:395-399). Blank names are rejected too:
    * `path("")` resolves to the store directory itself, so delete("")
    * would target the whole store and download("") read a directory. */
  def traversalSafe(filename: String): Boolean =
    filename.trim.nonEmpty &&
      !filename.contains("..") && !filename.contains("/") && !filename.contains("\\")

  private def path(filename: String): Path = Paths.get(dir, filename)

  /** Save a computed run (B4 + A19): uuid-prefix id, ISO timestamp,
    * `{sanitized}_{yyyyMMdd_HHmmss}_{id}.json`. `now`/`id` injectable for
    * deterministic tests. Returns the filename. */
  def save(input: EstimationInput, result: EstimationResult,
      now: LocalDateTime = LocalDateTime.now(),
      id: String = java.util.UUID.randomUUID().toString.take(8)): String =
    // Spark's JSON codec writes the exact StructType field names (the
    // reference's snake_case wire shape) — no hand-rolled serializer.
    saveAll(Seq((input, result, now, id))).head

  /** List saved runs (B5): scan dir -> filter *.json -> project {filename,
    * project_name, saved_at, size_bytes, modified_time} with per-file
    * 'Unknown' fallback -> sort by modified_time desc. A real Spark plan
    * over the binaryFile source: predicate (glob) pushed to listing, narrow
    * JSON-peek projection, one small sort. */
  def list(): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(dir)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("filename"),
        coalesce(get_json_object(col("content").cast("string"),
          "$.metadata.project_name"), lit("Unknown")).as("project_name"),
        coalesce(get_json_object(col("content").cast("string"),
          "$.metadata.saved_at"), lit("Unknown")).as("saved_at"),
        col("length").as("size_bytes"),
        date_format(col("modificationTime"), "yyyy-MM-dd HH:mm:ss").as("modified_time"))
      .orderBy(col("modified_time").desc, col("filename").asc)

  /** Download (B6): file content, 404-as-Left. */
  def download(filename: String): Either[String, String] =
    if (!traversalSafe(filename)) Left("Invalid filename")
    else if (!Files.exists(path(filename))) Left("File not found")
    else Right(Files.readString(path(filename)))

  /** Delete (B7): traversal guard (400), missing file (404), then remove. */
  def delete(filename: String): Either[String, String] =
    if (!traversalSafe(filename)) Left("Invalid filename")
    else if (!Files.exists(path(filename))) Left("File not found")
    else {
      Files.delete(path(filename))
      Right(s"Estimation '$filename' deleted successfully")
    }

  /** Bulk save: one Spark serialization job for N runs (the per-run save()
    * launches one tiny job each — fine interactively, wasteful for batch
    * export). Returns the filenames in input order. */
  def saveAll(runs: Seq[(EstimationInput, EstimationResult, LocalDateTime, String)]): Seq[String] = {
    import spark.implicits._
    val saved = runs.map { case (in, res, now, id) =>
      SavedEstimation(
        EstimationMetadata(
          estimation_id = id,
          timestamp = now.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME),
          project_name = in.project_name,
          saved_at = now.format(DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))),
        in, res)
    }
    val jsons = spark.createDataset(saved).toJSON.collect()
    runs.zip(jsons).map { case ((in, _, now, id), json) =>
      val filename =
        s"${sanitizeProjectName(in.project_name)}_" +
          s"${now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))}_$id.json"
      Files.writeString(path(filename), json)
      // Stamp mtime from the run timestamp: it IS the run's modification
      // time semantically, and it makes list()'s mtime-desc sort
      // deterministic (write-clock mtimes truncate to the same second for
      // a batch, leaving the order at the mercy of a second boundary).
      Files.setLastModifiedTime(path(filename), java.nio.file.attribute.FileTime.from(
        now.atZone(java.time.ZoneId.systemDefault()).toInstant))
      filename
    }
  }

  /** Save every successful demo-grid run (a deterministic small corpus for
    * the list-pipeline query entry). */
  private[engine] def saveDemoRuns(n: Int): Unit =
    saveAll(Engine.demoGrid.take(n).zipWithIndex.flatMap { case (in, i) =>
      Engine.estimateOne(in).result.map { r =>
        (in, r, LocalDateTime.of(2026, 8, 12, 10, i, 0), f"$i%08x")
      }
    })

  /** Reload (B8): read one file through the schema-validated JSON decode
    * (SavedEstimation(**data) equivalent), then re-validate the input
    * parameters like the Pydantic model would. */
  def reload(filename: String): Either[String, SavedEstimation] =
    if (!traversalSafe(filename)) Left("Invalid filename")
    else if (!Files.exists(path(filename))) Left("File not found")
    else {
      import spark.implicits._
      val ds = spark.read.schema(savedSchema).json(path(filename).toString)
        .as[SavedEstimation]
      ds.collect().toList match {
        case saved :: Nil if saved.metadata != null && saved.input_parameters != null =>
          Validation.validate(saved.input_parameters) match {
            case Left(errs) => Left(s"Invalid saved input: ${errs.mkString("; ")}")
            case Right(_)   => Right(saved)
          }
        case _ => Left(s"Corrupt saved estimation: $filename")
      }
    }
}
