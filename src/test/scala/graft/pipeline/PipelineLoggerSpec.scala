package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** O13: every emitted line must parse as a standalone JSON object with
  * the fixed fields + sticky context + per-call extras. */
class PipelineLoggerSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def collecting: (PipelineLogger, ArrayBuffer[String]) = {
    val lines = ArrayBuffer.empty[String]
    (new PipelineLogger("graft.test", Some(lines += _)), lines)
  }

  test("entries are valid JSON with fixed fields, context, and extras") {
    val (log, lines) = collecting
    log.setContext("source_id" -> "orders_db", "run_id" -> "r42")
    log.info("extracted batch", "rows" -> "1500", "table_name" -> "orders")
    log.warn("late data")
    assert(lines.size == 2)
    val n1 = mapper.readTree(lines(0))
    assert(n1.get("level").asText == "INFO")
    assert(n1.get("logger").asText == "graft.test")
    assert(n1.get("message").asText == "extracted batch")
    assert(n1.get("source_id").asText == "orders_db")
    assert(n1.get("run_id").asText == "r42")
    assert(n1.get("rows").asText == "1500")
    assert(n1.get("table_name").asText == "orders")
    assert(n1.get("timestamp").asText.endsWith("Z"))
    val n2 = mapper.readTree(lines(1))
    assert(n2.get("level").asText == "WARN")
    assert(n2.get("source_id").asText == "orders_db") // context sticks
    assert(n2.get("rows") == null) // extras don't
  }

  test("messages with quotes, newlines and control chars stay parseable") {
    val (log, lines) = collecting
    log.error("broke: \"x\"\nline2\ttabbed", "k" -> "v\"w\\z")
    val n = mapper.readTree(lines.head)
    assert(n.get("message").asText == "broke: \"x\"\nline2\ttabbed")
    assert(n.get("k").asText == "v\"w\\z")
  }

  test("exception entries carry class, message and top frame") {
    val (log, lines) = collecting
    log.error("ingest failed", new RuntimeException("conn reset"))
    val n = mapper.readTree(lines.head)
    assert(n.get("exception").asText.startsWith("java.lang.RuntimeException: conn reset at "))
  }

  test("context keys colliding with fixed fields are prefixed, not duplicated") {
    val (log, lines) = collecting
    log.setContext("message" -> "ctx-msg", "level" -> "ctx-level")
    log.info("real message")
    val n = mapper.readTree(lines.head)
    assert(n.get("message").asText == "real message")
    assert(n.get("level").asText == "INFO")
    assert(n.get("ctx_message").asText == "ctx-msg")
    assert(n.get("ctx_level").asText == "ctx-level")
    // no duplicate keys: raw line contains "message" exactly twice
    // (message + ctx_message), never two bare "message" keys
    assert("\"message\":".r.findAllIn(lines.head).size == 1)
  }

  test("clearContext drops sticky fields") {
    val (log, lines) = collecting
    log.setContext("source_id" -> "s1")
    log.clearContext()
    log.info("m")
    assert(mapper.readTree(lines.head).get("source_id") == null)
  }

  test("withContext children are isolated from the parent and each other") {
    val (log, lines) = collecting
    log.setContext("shared" -> "base")
    val a = log.withContext("pipeline" -> "run_a")
    val b = log.withContext("pipeline" -> "run_b")
    a.info("from a")
    b.info("from b")
    log.info("from parent")
    val Seq(na, nb, np) = lines.toSeq.map(mapper.readTree)
    assert(na.get("pipeline").asText == "run_a")
    assert(nb.get("pipeline").asText == "run_b")
    assert(np.get("pipeline") == null) // parent context untouched
    // children inherit the parent context present at creation
    assert(na.get("shared").asText == "base")
    assert(nb.get("shared").asText == "base")
  }

  test("successive runner runs don't cross-contaminate pipeline context") {
    val spark = graft.SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    val runner = new PipelineRunner(
      spark,
      sources = Map("orders_src" -> (s => s.read.parquet(s"$sf/orders.parquet"))),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val lines = ArrayBuffer.empty[String]
    runner.log = new PipelineLogger("graft.pipeline.runner", Some(lines += _))
    val yaml = (n: String) =>
      s"name: $n\nsources:\n  - source_id: orders_src\n    source_type: file\n"
    runner.run(PipelineSpec.fromYaml(yaml("first")))
    val afterFirst = lines.size
    runner.run(PipelineSpec.fromYaml(yaml("second")))
    assert(afterFirst > 0 && lines.size > afterFirst)
    lines.take(afterFirst).foreach(l =>
      assert(mapper.readTree(l).get("pipeline").asText == "first", l))
    lines.drop(afterFirst).foreach(l =>
      assert(mapper.readTree(l).get("pipeline").asText == "second", l))
  }

  test("runner task lifecycle emits parseable JSON lines with pipeline context") {
    val spark = graft.SparkSpec.session
    val sf = "/root/testdata/sf0.001"
    val runner = new PipelineRunner(
      spark,
      sources = Map("orders_src" -> (s => s.read.parquet(s"$sf/orders.parquet"))),
      models = Map.empty,
      asOf = java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val lines = ArrayBuffer.empty[String]
    runner.log = new PipelineLogger("graft.pipeline.runner", Some(lines += _))
    val yaml = "name: logged\nsources:\n  - source_id: orders_src\n    source_type: file\n"
    runner.run(PipelineSpec.fromYaml(yaml))
    assert(lines.nonEmpty)
    lines.foreach { l =>
      val n = mapper.readTree(l)
      assert(n.get("pipeline").asText == "logged", l)
      assert(n.get("task_id") != null && n.get("status") != null, l)
    }
  }
}
