package graft.dedup

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FuzzySpec extends AnyFunSuite with SparkSpec {

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, 3),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

  private def got(df: org.apache.spark.sql.DataFrame, maxDist: Int,
      bandWidth: Int = 8, prefixBlock: Int = 0): Set[(Long, Long, Long)] =
    Fuzzy.editDistancePairs(df, "id", "text", maxDist,
      bandWidth = bandWidth, prefixBlock = prefixBlock)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    def norm(s: String) = s.trim.toLowerCase.replaceAll("\\s+", " ").take(64)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, t1) <- rows; (i2, t2) <- rows if i1 < i2
      d = lev(norm(t1), norm(t2)) if d <= maxDist
    } yield (i1, i2, d.toLong)).toSet
  }

  test("blocked pairs equal brute force, including band-boundary lengths") {
    // lengths straddle band edges at bandWidth=4: 7|8 and 15|16
    val rows = Seq[(Long, String)](
      (1L, "abcdefg"), (2L, "abcdefgh"), (3L, "abcdefghx"),
      (4L, "abcdefghijklmno"), (5L, "abcdefghijklmnop"),
      (6L, "zzzzzzz"), (7L, "entirely different"))
    for (bw <- Seq(1, 4, 8, 100); md <- Seq(1, 2, 3))
      assert(got(frame(rows: _*), md, bandWidth = bw) === brute(rows, md),
        s"bandWidth=$bw maxDist=$md")
  }

  test("normalization: case and whitespace runs do not count as edits") {
    val rows = Seq[(Long, String)]((1L, "Hello   World"), (2L, "hello world"))
    assert(got(frame(rows: _*), 0) === Set((1L, 2L, 0L)))
  }

  test("maxDist 0 finds exact normalized duplicates only") {
    val rows = Seq[(Long, String)]((1L, "aaa"), (2L, "aaa"), (3L, "aab"))
    assert(got(frame(rows: _*), 0) === Set((1L, 2L, 0L)))
  }

  test("prefixBlock trades recall for volume: misses first-char edits") {
    val rows = Seq[(Long, String)]((1L, "xabcdef"), (2L, "yabcdef"))
    assert(got(frame(rows: _*), 2) === Set((1L, 2L, 1L)))
    assert(got(frame(rows: _*), 2, prefixBlock = 3) === Set.empty)
  }

  test("interval replication is bounded by 2*maxDist/bandWidth + 2 copies") {
    val df = frame((1L, "a" * 20))
    val maxDist = 3; val bw = 8
    val copies = df.select(explode(sequence(
      expr(s"greatest(length(text) - $maxDist, 0) div $bw"),
      expr(s"(length(text) + $maxDist) div $bw")))).count()
    assert(copies <= 2 * maxDist / bw + 2)
  }
}
