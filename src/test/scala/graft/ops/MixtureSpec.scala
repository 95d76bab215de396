package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MixtureSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(r => Row(r._1, r._2, r._3)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("lang", StringType, nullable = true),
        StructField("text", StringType, nullable = false))))

  test("plan computes inventory, targets, capped rates and epoch factors") {
    // en: 6 tokens available; de: 2; xx (unweighted): 2
    val d = docs(
      (1L, "en", "a b c"), (2L, "en", "d e f"),
      (3L, "de", "g h"), (4L, "xx", "i j"))
    val out = Mixture.plan(d, "lang", "text",
      Map("en" -> 0.5, "de" -> 0.5), tokenBudget = 8L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // en: target floor(0.5*8)=4 of 6 -> rate 666666 ppm, epochs 666666
    assert(out("en") === ((2L, 6L, 4L, 666666L, 666666L)))
    // de: target 4 of 2 -> rate capped at 1e6, epochs 2e6 (repeat 2x)
    assert(out("de") === ((1L, 2L, 4L, 1000000L, 2000000L)))
    // xx: defaultWeight 0 -> target 0, rate 0, epochs 0
    assert(out("xx") === ((1L, 2L, 0L, 0L, 0L)))
  }

  test("zero-token groups plan zero rate instead of dividing by zero") {
    val d = docs((1L, "en", "  "), (2L, "de", "a"))
    val out = Mixture.plan(d, "lang", "text",
      Map("en" -> 1.0, "de" -> 0.0), tokenBudget = 10L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("en") === ((0L, 0L, 0L)))
    assert(out("de") === ((1L, 0L, 0L)))
  }

  test("applyPlan repeats rows to their epoch factor with md5-fractional extras") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      (1L, "up", "x"), (2L, "up", "x"), (3L, "up", "x"), (4L, "up", "x"),
      (10L, "down", "x"), (11L, "down", "x"), (12L, "down", "x"),
      (20L, "gone", "x"))
    val plan = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("up", 2500000L), Row("down", 400000L)), 1),
      StructType(Seq(StructField("lang", StringType),
        StructField("epochs_ppm", LongType))))
    val out = Mixture.applyPlan(d, "lang", "doc_id", plan)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("epoch")))
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    // every 'up' row appears 2 or 3 times; extras match the bucket rule
    val buckets = d.select(col("doc_id"),
      Sampling.bucket(col("doc_id"), 42L).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(counts(id) === 2 + (if (buckets(id) < 500000L) 1 else 0))
    for (id <- Seq(10L, 11L, 12L))
      assert(counts.getOrElse(id, 0) === (if (buckets(id) < 400000L) 1 else 0))
    assert(!counts.contains(20L)) // not in the plan -> dropped
    // epoch indices are dense from 0
    val epochs1 = out.filter(_._1 == 1L).map(_._2).sorted
    assert(epochs1 === (0L until counts(1L).toLong))
  }

  test("applyPlan fails fast past maxEpochs instead of exploding") {
    val d = docs((1L, "big", "x"))
    val plan = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("big", 5000000L)), 1),
      StructType(Seq(StructField("lang", StringType),
        StructField("epochs_ppm", LongType))))
    val err = intercept[Exception] {
      Mixture.applyPlan(d, "lang", "doc_id", plan, maxEpochs = 3L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("maxEpochs")),
      s"got: ${msgs(err)}")
  }

  test("guards: budget must be positive, weights finite and non-negative") {
    val d = docs((1L, "en", "a"))
    intercept[IllegalArgumentException] {
      Mixture.plan(d, "lang", "text", Map("en" -> 0.5), tokenBudget = 0L)
    }
    intercept[IllegalArgumentException] {
      Mixture.plan(d, "lang", "text", Map("en" -> -0.5), tokenBudget = 1L)
    }
  }

  test("planTemperature: T=1 is natural proportions, higher T flattens, nulls drop") {
    // en: 8 tokens, de: 2, null-lang excluded entirely
    val d = docs(
      (1L, "en", "a b c d"), (2L, "en", "e f g h"),
      (3L, "de", "i j"), (4L, null, "k l m"))
    def weights(t: Double) =
      Mixture.planTemperature(d, "lang", "text", t, tokenBudget = 100L)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val w1 = weights(1.0)
    assert(w1.keySet === Set("en", "de"), "null lang leaked into the plan")
    assert(w1("en") === 0.8 && w1("de") === 0.2) // 8/10, 2/10 — exact doubles
    // T=2 (sqrt instance): sqrt(8)/(sqrt(2)+sqrt(8)) = 2/3 exactly
    // (sqrt(8) = 2·sqrt(2) is exact in IEEE: scaling by 4 is a pure
    // exponent shift, so the ratio collapses to 2/(1+2))
    val w2 = weights(2.0)
    assert(w2("en") === 2.0 / 3.0 && w2("de") === 1.0 / 3.0)
    // the flattening direction: dominant group shrinks, minor grows
    assert(w2("en") < w1("en") && w2("de") > w1("de"))
    // weights always sum to 1 up to the fold's rounding
    assert(math.abs(w2.values.sum - 1.0) < 1e-12)
  }

  test("planSql doubles single quotes in group-key literals") {
    // the Spark side compares values natively; the oracle renders them
    // as SQL literals — a key like pt'br must escape or the generated
    // SQL is malformed and the engines silently diverge
    val sql = Mixture.planSql("documents", "lang",
      Map("pt'br" -> 0.5, "en" -> 0.5), tokenBudget = 1000L)
    assert(sql.contains("WHEN lang = 'pt''br' THEN"), sql)
    assert(sql.contains("WHEN lang = 'en' THEN"), sql)
  }

  test("waterfillCaps solves the budget cap: split, remainder, and fits-whole cases") {
    def toksDoc(lang: String, n: Int, id: Long) =
      (id, lang, Seq.fill(n)("w").mkString(" "))
    // inventories: a=2, b=5, c=10 (17 total)
    val d = docs(toksDoc("a", 2, 1L), toksDoc("b", 5, 2L),
      toksDoc("c", 4, 3L), toksDoc("c", 6, 4L))
    def run(budget: Long): Map[String, (Long, Long, Long, Boolean)] =
      Mixture.waterfillCaps(d, "lang", "text", budget)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
    // budget 12, ascending inventories (2, 5, 10): k=1: 0+3*2=6 <=
    // 12; k=2: 2+2*5=12 <= 12; k=3: 7+1*10=17 > 12 -> tau = (12-7)
    // div 1 = 5. alloc = 2+5+5 = 12 (exact fit)
    val at12 = run(12L)
    assert(at12("a") == ((2L, 5L, 2L, false)), s"$at12")
    assert(at12("b") == ((5L, 5L, 5L, false)), s"$at12")
    assert(at12("c") == ((10L, 5L, 5L, true)), s"$at12")
    // budget 11: k=2 violates (2 + 2*5 = 12 > 11) -> tau = (11-2)
    // div 2 = 4; alloc 2+4+4 = 10 < 11 — the integer remainder stays
    // unallocated by contract
    val at11 = run(11L)
    assert(at11("b") == ((5L, 4L, 4L, true)) && at11("c")._4, s"$at11")
    // budget 5: k=1 violates (0+3*2=6 > 5) -> tau = 5 div 3 = 1; all
    // capped at 1
    val at5 = run(5L)
    assert(at5.values.forall(v => v._2 == 1L && v._3 == 1L && v._4), s"$at5")
    // budget >= total: tau = max inventory, nothing capped
    val at17 = run(17L)
    assert(at17.values.forall(v => v._2 == 10L && !v._4), s"$at17")
    assert(at17("c")._3 == 10L, s"$at17")
  }
}
