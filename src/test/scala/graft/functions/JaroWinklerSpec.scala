package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.JaroWinkler.jaro_winkler

/** Jaro-Winkler: textbook vectors pinned to the exact doubles DuckDB
  * returns, byte (not codepoint) semantics, boost/threshold edges,
  * null handling, and interpreted-vs-codegen parity.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerAlgo.jaroWinkler(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("textbook vectors match DuckDB's exact doubles") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: no cross-position match
  }

  test("either-empty yields 0 (DuckDB convention, not 1)") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "") == 0.0)
  }

  test("boost applies only above 0.7, prefix capped at 4 bytes") {
    // jaro 2/3 with common prefix 3: stays unboosted below threshold
    assert(jw("abcdef", "abczzz") == 0.6666666666666666)
    // prefix 5 caps at 4: 0.75 + 4*0.1*0.25 = 0.85
    assert(jw("abcdezzz", "abcdeyyy") == 0.85)
  }

  test("byte semantics: multi-byte codepoints count as their bytes") {
    // DuckDB returns 0.8933…, which is only reachable with byte
    // lengths (6 vs 5), not codepoint lengths (3 vs 3)
    assert(jw("äöü", "äöx") == 0.8933333333333334)
  }

  test("null propagates; codegen and interpreted agree on real names") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("green apple", "grean apple"),
      (null, "x"), ("x", null)).toDF("a", "b")
    val got = df.select(jaro_winkler(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) == 0.9611111111111111)
    assert(got(2).isNullAt(0) && got(3).isNullAt(0))
    // interpreted eval (no codegen) must match the algo directly
    val viaEval = JaroWinkler(
      Literal(UTF8String.fromString("green apple")),
      Literal(UTF8String.fromString("grean apple"))).eval(null)
    assert(viaEval == got(1).getDouble(0))
  }

  test("SQL registration under DuckDB's name") {
    JaroWinkler.register(spark)
    val got = spark.sql(
      "SELECT jaro_winkler_similarity('MARTHA', 'MARHTA') AS s")
      .collect().head.getDouble(0)
    assert(got == 0.9611111111111111)
  }
}
