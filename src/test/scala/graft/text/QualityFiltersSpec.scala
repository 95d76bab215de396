package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class QualityFiltersSpec extends AnyFunSuite with SparkSpec {

  private val cfg = QualityFilters.Config(minWords = 3, maxWords = 20)

  private def flags(text: String): Map[String, Boolean] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(text)), 1),
      StructType(Seq(StructField("text", StringType))))
    val row = QualityFilters.withRules(df, "text", cfg).collect().head
    val names = QualityFilters.rules(org.apache.spark.sql.functions.col("text"), cfg)
      .map(_._1) :+ "passes"
    names.map(n => n -> row.getBoolean(row.fieldIndex(n))).toMap
  }

  test("clean prose passes every rule") {
    val f = flags("the cat and the dog have to be with that old friend")
    assert(f.values.forall(identity), f.toString)
  }

  test("too-few words fails only r_words") {
    val f = flags("the be to")  // 3 words passes; 2 words fails
    assert(f("r_words"))
    val g = flags("the be")
    assert(!g("r_words") && !g("passes"))
  }

  test("mean word length out of bounds fails r_mean_len") {
    // all 1-char words -> mean 1 < 3
    val f = flags("a b c d e f")
    assert(!f("r_mean_len") && !f("passes"))
    // one giant word dominating -> mean > 10
    val g = flags("the be to incomprehensibilitiesincomprehensibilities")
    assert(!g("r_mean_len"))
  }

  test("symbol-heavy text fails r_symbol") {
    val f = flags("the be to and # # # # of that")
    assert(!f("r_symbol"))
  }

  test("bullet-dominated lines fail r_bullet") {
    val text = (1 to 10).map(i => s"- the item $i be of that").mkString("\n")
    assert(!flags(text)("r_bullet"))
    val mixed = ((1 to 8).map(i => s"- the item $i") :+ "the closing prose be of that and have").mkString("\n")
    assert(flags(mixed)("r_bullet")) // 8/9 <= 9/10? 80 <= 81 yes
  }

  test("ellipsis-ended lines fail r_ellipsis") {
    val text = Seq("the story goes on...", "the plot thickens...", "the end be of that").mkString("\n")
    // 2/3 lines end in ... -> 20 > 9 fails
    assert(!flags(text)("r_ellipsis"))
  }

  test("non-alphabetic words fail r_alpha") {
    val f = flags("the be to 123 456 789 000 111")
    assert(!f("r_alpha"))
  }

  test("missing stopwords fail r_stop") {
    val f = flags("cat dog bird fish horse goat")
    assert(!f("r_stop") && !f("passes"))
    val g = flags("the cat and dog") // 'the' + 'and' = 2 distinct stop hits
    assert(g("r_stop"))
  }

  test("rule names match between Column and SQL renderings") {
    assert(QualityFilters.rules(org.apache.spark.sql.functions.lit("x"), cfg).map(_._1) ===
      QualityFilters.rulesSql(cfg).map(_._1))
  }
}
