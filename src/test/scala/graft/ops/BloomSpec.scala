package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BloomSpec extends AnyFunSuite with SparkSpec {

  private def df(name: String, vs: Seq[Long]) = {
    import spark.implicits._
    vs.toDF(name)
  }

  test("no false negatives: every dim key passes its own filter") {
    val keys = (1L to 500L).map(_ * 7919L)
    val dim = df("k", keys)
    val words = Bloom.bits(dim, "k", m = 4096, k = 3)
    val pass = dim.filter(Bloom.mightContain(col("k"), words, 4096, 3)).count()
    assert(pass == keys.length.toLong)
  }

  test("bloom semi join equals the plain semi join exactly") {
    val fact = df("fk", (1L to 3000L))
    val dim = df("dk", (1L to 3000L).filter(_ % 7 == 0))
    val got = Bloom.semiJoin(fact, "fk", dim, "dk", m = 1024, k = 2)
      .collect().map(_.getLong(0)).sorted
    val want = (1L to 3000L).filter(_ % 7 == 0).toArray
    assert(got.sameElements(want))
  }

  test("stats: counts are consistent and false positives are bounded") {
    val fact = df("fk", (1L to 4000L))
    val dim = df("dk", (1L to 4000L).filter(_ % 10 == 0)) // 400 keys
    val r = Bloom.stats(fact, "fk", dim, "dk", m = 8192, k = 3).head()
    val (n, pass, hit, fp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n == 4000L && hit == 400L)
    assert(pass == hit + fp) // every pass is a true hit or a counted FP
    // fill = 1200/8192 -> theoretical FP ~0.3%; allow generous slack
    assert(fp < 200L, s"false positives $fp out of expected ~12")
  }

  test("duplicate dim keys do not change the filter") {
    val dim = df("dk", Seq(5L, 5L, 5L, 9L))
    val once = Bloom.bits(df("dk", Seq(5L, 9L)), "dk", 1024, 2)
    assert(Bloom.bits(dim, "dk", 1024, 2).sameElements(once))
  }
}
