package graft.engine

import graft.SparkTestSession
import graft.core.EstimationInput
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.LocalDateTime

/** Persistence round-trip + the sanitize/traversal vectors
  * (estimation.py:645-648, main.py:395-399).
  */
class RunStoreSpec extends AnyFunSuite with SparkTestSession {

  private def newStore(): RunStore =
    new RunStore(spark, Files.createTempDirectory("runstore").toString)

  private def computed(name: String) = {
    val in = EstimationInput(project_name = name,
      worker_node_type = "VM", worker_node_t_size = Some("S"))
    in -> Engine.estimateOne(in).result.get
  }

  test("sanitize vectors match the reference rules") {
    val store = newStore()
    assert(store.sanitizeProjectName("Prod Run #3") == "Prod_Run_3")
    assert(store.sanitizeProjectName("../../etc/passwd") == "etcpasswd")
    assert(store.sanitizeProjectName("name-with_ok.chars!") == "name-with_okchars")
    assert(store.sanitizeProjectName("trailing  ") == "trailing")
    assert(store.sanitizeProjectName("a b-c_d") == "a_b-c_d")
  }

  test("traversal guard vectors (main.py:395-399)") {
    val store = newStore()
    assert(!store.traversalSafe("../x.json"))
    assert(!store.traversalSafe("a/b.json"))
    assert(!store.traversalSafe("a\\b.json"))
    // blank resolves to the store dir itself: delete("") would target the
    // whole store, download("") would read a directory
    assert(!store.traversalSafe(""))
    assert(!store.traversalSafe("  "))
    assert(store.delete("").isLeft)
    assert(store.download("").isLeft)
    assert(store.traversalSafe("plain_file.json"))
    store.delete("../x.json") match {
      case Left(msg) => assert(msg == "Invalid filename")
      case Right(_)  => fail("traversal delete must be rejected")
    }
  }

  test("save produces the {sanitized}_{timestamp}_{id}.json filename") {
    val store = newStore()
    val (in, res) = computed("My Project")
    val fn = store.save(in, res,
      now = LocalDateTime.of(2026, 8, 12, 10, 30, 0), id = "deadbeef")
    assert(fn == "My_Project_20260812_103000_deadbeef.json")
  }

  test("save -> list -> reload -> delete round trip") {
    val store = newStore()
    val (in1, res1) = computed("First Run")
    val (in2, res2) = computed("Second Run")
    val f1 = store.save(in1, res1,
      now = LocalDateTime.of(2026, 8, 12, 9, 0, 0), id = "aaaa1111")
    val f2 = store.save(in2, res2,
      now = LocalDateTime.of(2026, 8, 12, 10, 0, 0), id = "bbbb2222")

    val listed = store.list().collect()
    assert(listed.length == 2)
    assert(listed.map(_.getString(0)).toSet == Set(f1, f2))
    assert(listed.forall(_.getString(1) != "Unknown"))
    // sorted newest-first by fs modification time
    val mtimes = listed.map(_.getString(4))
    assert(mtimes.sorted.reverse.toSeq == mtimes.toSeq)

    val reloaded = store.reload(f1)
      .fold(e => fail(s"reload failed: $e"), identity)
    assert(reloaded.metadata.estimation_id == "aaaa1111")
    assert(reloaded.metadata.project_name == "First Run")
    assert(reloaded.input_parameters == in1)
    assert(reloaded.estimation_results == res1)
    assert(reloaded.version == "1.0")

    val dl = store.download(f2).fold(e => fail(s"download failed: $e"), identity)
    assert(dl.contains("\"estimation_id\":\"bbbb2222\""))

    assert(store.delete(f1).isRight)
    assert(store.delete(f1) == Left("File not found"))
    assert(store.list().count() == 1)
  }

  test("list falls back to Unknown for unreadable metadata (main.py:495-497)") {
    val store = newStore()
    val (in, res) = computed("Good Run")
    store.save(in, res, now = LocalDateTime.of(2026, 8, 12, 9, 0, 0), id = "cccc3333")
    Files.writeString(java.nio.file.Paths.get(store.dir, "garbage.json"), "not json at all")
    val rows = store.list().collect()
    assert(rows.length == 2)
    val garbage = rows.find(_.getString(0) == "garbage.json").get
    assert(garbage.getString(1) == "Unknown")
    assert(garbage.getString(2) == "Unknown")
    assert(rows.find(_.getString(0) != "garbage.json").get.getString(1) == "Good Run")
  }

  test("reload rejects corrupt and missing files") {
    val store = newStore()
    Files.writeString(java.nio.file.Paths.get(store.dir, "corrupt.json"), "{\"metadata\": 42}")
    store.reload("corrupt.json") match {
      case Left(msg) => assert(msg.toLowerCase.contains("corrupt"))
      case Right(r)  => fail(s"corrupt reload must fail, got $r")
    }
    assert(store.reload("absent.json") == Left("File not found"))
    assert(store.reload("../evil.json") == Left("Invalid filename"))
  }
}
