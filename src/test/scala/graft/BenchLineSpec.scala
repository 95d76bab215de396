package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract for Bench's emitted JSON line: failures are named and
  * poison the total; a clean board sums. No SparkSession needed —
  * renderLine is pure.
  */
class BenchLineSpec extends AnyFunSuite {

  test("clean results sum into the total with an empty failed list") {
    val (line, failed) = Bench.renderLine(
      Seq("a" -> 1.5, "b" -> 0.5), """{"x":1.0}""", "/sf")
    assert(failed.isEmpty)
    assert(line.contains("\"value\":2.0"))
    assert(line.contains("\"failed\":[]"))
    assert(line.contains("\"a\":1.5") && line.contains("\"b\":0.5"))
  }

  test("a sentinel failure poisons the total and is named") {
    val (line, failed) = Bench.renderLine(
      Seq("a" -> 1.5, "broken" -> -1.0, "c" -> 0.25), "{}", "/sf")
    assert(failed == Seq("broken"))
    assert(line.contains("\"value\":-1.0"))
    assert(line.contains("\"failed\":[\"broken\"]"))
  }

  test("multiple failures are all named in order") {
    val (_, failed) = Bench.renderLine(
      Seq("a" -> -1.0, "b" -> 2.0, "c" -> -1.0), "{}", "/sf")
    assert(failed == Seq("a", "c"))
  }
}
