package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DriftSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  test("identical slices show zero drift for every term") {
    val a = docs(1L -> "the cat sat", 2L -> "a dog ran")
    val out = Drift.tokenChi2(a, a, "text", "text", k = 100).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(3) == 0.0),
      out.map(r => (r.getString(0), r.getDouble(3))).mkString(", "))
  }

  test("a term exclusive to one slice tops the ranking") {
    val a = docs(1L -> "the the the the spam spam spam spam")
    val b = docs(2L -> "the the the the fine text here now")
    val top = Drift.tokenChi2(a, b, "text", "text", k = 1).collect().head
    assert(top.getString(0) === "spam")
    assert(top.getLong(1) === 4L && top.getLong(2) === 0L)
    // hand-computed: cA=4 cB=0, NA=NB=8, e = 4*8/16 = 2 on both sides
    // -> (4-2)^2/2 + (0-2)^2/2 = 2 + 2 = 4
    assert(top.getDouble(3) === 4.0)
  }

  test("an empty slice yields zero chi2 (absence is not drift)") {
    val a = docs(1L -> "x y z")
    val b = docs()
    val out = Drift.tokenChi2(a, b, "text", "text", k = 10).collect()
    assert(out.length === 3)
    assert(out.forall(r => r.getLong(2) == 0L && r.getDouble(3) == 0.0))
  }

  test("the tie at the k-cut breaks by term ascending") {
    // two symmetric exclusive terms with equal counts tie on chi2
    val a = docs(1L -> "common zeta")
    val b = docs(2L -> "common alpha")
    val out = Drift.tokenChi2(a, b, "text", "text", k = 2).collect()
      .map(_.getString(0))
    assert(out.toSeq === Seq("alpha", "zeta"))
  }

  test("matches the DuckDB formula on a skewed example (fixed op order)") {
    // cA=3 cB=1 for "w"; NA=5, NB=3 -> eA=(3+1)*5/8=2.5, eB=1.5
    // chi2 = (3-2.5)^2/2.5 + (1-1.5)^2/1.5 = 0.1 + 0.1666...
    val a = docs(1L -> "w w w p q")
    val b = docs(2L -> "w p q")
    val m = Drift.tokenChi2(a, b, "text", "text", k = 10).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val expected = 0.5 * 0.5 / 2.5 + 0.5 * 0.5 / 1.5
    assert(m("w") === expected)
  }
}
