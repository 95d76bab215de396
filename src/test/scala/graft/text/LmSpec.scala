package graft.text

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LmSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))

  /** Independent sequential reference: add-one-smoothed inverse
    * n-gram probability, floor-quantized to micro-units.
    */
  private def expected(
      corpus: Seq[(Long, String)], ref: Seq[String], order: Int = 2,
  ): Map[Long, (Int, Long, Double)] = {
    def toks(s: String): Seq[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def nGrams(t: Seq[String], n: Int): Seq[String] =
      t.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val refToks = ref.map(toks)
    val pc = refToks.flatMap(nGrams(_, order - 1))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val gc = refToks.flatMap(nGrams(_, order))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = refToks.flatten.distinct.size.toLong
    corpus.map { case (id, text) =>
      val grams = nGrams(toks(text), order)
      val micros = grams.map { g =>
        val c1 = pc.getOrElse(g.split(" ").take(order - 1).mkString(" "), 0L)
        val c12 = gc.getOrElse(g, 0L)
        math.floor((c1 + v).toDouble / (c12 + 1).toDouble * 1e6).toLong
      }
      val sum = micros.sum
      val mean = if (grams.nonEmpty) sum.toDouble / grams.size.toDouble / 1e6 else 0.0
      id -> ((grams.size, sum, mean))
    }.toMap
  }

  private def run(
      corpus: DataFrame, ref: DataFrame, order: Int = 2,
  ): Map[Long, (Int, Long, Double)] =
    Lm.surpriseScore(corpus, "doc_id", "text", ref, "text", order = order)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("hand-computed surprise on a worked example") {
    // ref: uni the:2 cat:1 sat:1 on:1 mat:1 -> V=5; all bigrams count 1
    val ref = docs(100L -> "the cat sat on the mat")
    val out = run(docs(
      1L -> "THE cat sat up",   // (2+5)/2=3.5, (1+5)/2=3.0, (1+5)/1=6.0
      2L -> "zz qq",            // unseen w1: (0+5)/1=5.0
      3L -> "tiny",             // < 2 tokens
      4L -> ""), ref)
    assert(out(1L) === ((3, 12500000L, 12500000.0 / 3.0 / 1e6)))
    assert(out(2L) === ((1, 5000000L, 5.0)))
    assert(out(3L) === ((0, 0L, 0.0)))
    assert(out(4L) === ((0, 0L, 0.0)))
  }

  test("matches the sequential reference on a random corpus; partition-independent") {
    val rnd = new Random(42)
    val words = Vector("a", "b", "c", "dd", "ee", "ff", "gg")
    def sentence(): String =
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
    val refRows = (100L until 110L).map(i => i -> sentence())
    val corpusRows = (1L until 30L).map(i => i -> sentence())
    val want = expected(corpusRows, refRows.map(_._2))
    val got = run(docs(corpusRows: _*), docs(refRows: _*))
    assert(got === want)
    val gotRepart = run(docs(corpusRows: _*).repartition(7),
      docs(refRows: _*).repartition(5))
    assert(gotRepart === want)
  }

  test("trigram order matches the sequential reference; sub-order docs report zero") {
    val rnd = new Random(5)
    val words = Vector("a", "b", "c", "dd")
    def sentence(n: Int): String =
      Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val refRows = (100L until 108L).map(i => i -> sentence(2 + rnd.nextInt(9)))
    val corpusRows = (1L until 20L).map(i => i -> sentence(rnd.nextInt(8))) :+
      (50L -> "a b") // 2 tokens < order 3 -> zero grams
    val want = expected(corpusRows, refRows.map(_._2), order = 3)
    val got = run(docs(corpusRows: _*), docs(refRows: _*), order = 3)
    assert(got === want)
    assert(got(50L) === ((0, 0L, 0.0)))
    intercept[IllegalArgumentException] {
      Lm.surpriseScore(docs(1L -> "a"), "doc_id", "text",
        docs(2L -> "a"), "text", order = 1)
    }
  }

  test("contrastive score separates target-like from source-like documents") {
    val target = docs(100L -> "alpha beta gamma alpha beta",
      101L -> "beta gamma alpha beta gamma")
    val source = docs(200L -> "xx yy zz xx yy zz",
      201L -> "yy zz xx yy")
    val corpus = Seq(1L -> "alpha beta gamma", 2L -> "xx yy zz", 3L -> "q")
    val out = Lm.contrastiveScore(docs(corpus: _*), "doc_id", "text",
        target, source, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // contrast = src_micro - tgt_micro, exactly
    for ((_, (_, srcM, tgtM, c)) <- out) assert(c === srcM - tgtM)
    // target-like doc scores positive, source-like negative
    assert(out(1L)._4 > 0, s"target-like doc not positive: ${out(1L)}")
    assert(out(2L)._4 < 0, s"source-like doc not negative: ${out(2L)}")
    assert(out(3L) === ((0, 0L, 0L, 0L))) // sub-order doc: all zeros
    // and each side equals its independent single-model run
    val tgtOnly = run(docs(corpus: _*), target)
    assert(out.forall { case (id, (n, _, tgtM, _)) =>
      tgtOnly(id)._1 === n && tgtOnly(id)._2 === tgtM })
  }

  test("Kneser-Ney matches an independent sequential reference, incl. backoff") {
    // independent KN: c1 = Σ_w2 c(w1,w2) (prefix-position counts),
    // d = 0.75, continuation add-one over (N_types + V)
    def knExpected(
        corpus: Seq[(Long, String)], ref: Seq[String],
    ): Map[Long, (Int, Long)] = {
      def toks(s: String) =
        s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      def bigrams(t: Seq[String]) =
        t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val refToks = ref.map(toks)
      val gc = refToks.flatMap(bigrams)
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val v = refToks.flatten.distinct.size.toLong
      val c1 = gc.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
      val n1pw = gc.keys.groupBy(_._1).map { case (w, g) => w -> g.size.toLong }
      val n1pc = gc.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
      val nt = gc.size.toLong
      corpus.map { case (id, text) =>
        val grams = bigrams(toks(text))
        val micros = grams.map { case (w1, w2) =>
          val pcont = (n1pc.getOrElse(w2, 0L) + 1).toDouble / (nt + v).toDouble
          val c = c1.getOrElse(w1, 0L)
          val pkn =
            if (c > 0)
              (math.max(gc.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) +
                (0.75 * n1pw(w1).toDouble) * pcont) / c.toDouble
            else pcont
          math.floor(1e6 / pkn).toLong
        }
        id -> ((grams.size, micros.sum))
      }.toMap
    }
    val rnd = new Random(5)
    val vocab = Vector("a", "b", "c", "dd", "e")
    def sentence() =
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val refRows = (0 until 12).map(_ => sentence())
    val corpusRows = (0L until 15L).map(i =>
      // include unseen tokens to force the full-backoff branch
      i -> (sentence() + (if (i % 4 == 0) " zz qq" else "")))
    val got = Lm.kneserNeyScore(
      docs(corpusRows: _*), "doc_id", "text",
      docs(refRows.zipWithIndex.map { case (t, i) => (100L + i, t) }: _*),
      "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === knExpected(corpusRows, refRows))
  }

  test("reserved columns are rejected") {
    val d = docs(1L -> "a b").withColumnRenamed("text", "__gram")
    intercept[IllegalArgumentException] {
      Lm.surpriseScore(d, "doc_id", "__gram", docs(2L -> "a"), "text")
    }
  }

  test("pplBuckets: per-language terciles partition the corpus, surprise monotone head<=middle<=tail") {
    import org.apache.spark.sql.functions._
    // 7 docs per language with increasing rare-token content — the
    // reference knows only common text, so surprise rises with i and
    // the terciles must split 3/2/2 with monotone key ranges. Docs
    // with a single token have ZERO bigrams and must be excluded
    // (the CCNet drop-empties rule)
    def mk(lang: String, base: Long) =
      (0 until 7).map { i =>
        val rare = Seq.tabulate(i)(j => s"${lang}rare${i}x$j").mkString(" ")
        (base + i, s"the cat sat on the mat $rare", lang)
      } :+ ((base + 99, "solo", lang)) // one token -> 0 grams -> dropped
    val rows = mk("en", 0L) ++ mk("de", 100L)
    val corpus = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false),
        StructField("lang", StringType, nullable = false))))
    val ref = docs(1000L -> "the cat sat on the mat the cat ran")
    val got = Lm.pplBuckets(corpus, "doc_id", "text", "lang", ref, "text")
      .orderBy("lang", "bucket")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    for (lang <- Seq("de", "en")) {
      val l = got.filter(_._1 == lang)
      assert(l.map(_._2).toSeq == Seq("head", "middle", "tail"),
        s"$lang buckets: ${l.toSeq}")
      assert(l.map(_._3).toSeq == Seq(3L, 2L, 2L),
        s"$lang tercile sizes (7 docs, empty dropped): ${l.toSeq}")
      // key ranges are disjoint and ordered: head.max <= middle.min,
      // middle.max <= tail.min (<= because integer keys can tie)
      assert(l(0)._5 <= l(1)._4 && l(1)._5 <= l(2)._4,
        s"$lang tercile key ranges not monotone: ${l.toSeq}")
    }
  }

  test("doremiDomainWeights: target-like domain upweighted, reference-exact, sums to ~1e6") {
    // domain A looks like the target reference, domain B like the
    // source reference, domain C is neutral junk
    val corpus = Seq(
      1L -> "alpha beta gamma alpha beta",
      2L -> "alpha beta gamma delta",
      10L -> "xx yy zz xx yy",
      11L -> "yy zz xx yy zz",
      20L -> "q r s t u v")
    val domains = Map(1L -> "A", 2L -> "A", 10L -> "B", 11L -> "B",
      20L -> "C")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        corpus.map { case (id, t) => Row(id, t, domains(id)) }, 3),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false),
        StructField("source", StringType, nullable = false))))
    val target = docs(100L -> "alpha beta gamma alpha beta gamma")
    val source = docs(200L -> "xx yy zz xx yy zz")
    val got = Lm.doremiDomainWeights(df, "doc_id", "text", "source",
        target, source, "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .toMap
    assert(got.keySet === Set("A", "B", "C"))
    // excesses: A positive (target-like), B negative (source-like)
    assert(got("A")._2 > 0 && got("B")._2 < 0,
      s"excess signs wrong: $got")
    assert(got("A")._3 > got("C")._3 && got("C")._3 > got("B")._3,
      s"weight ordering wrong: $got")
    val wsum = got.values.map(_._3).sum
    assert(wsum >= 997000L && wsum <= 1000000L, s"weights sum $wsum")
    // exact sequential reference of the documented update
    val sc = Lm.contrastiveScore(df, "doc_id", "text", target, source,
        "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong,
        r.getLong(4)))).toMap
    // both engines TRUNCATE integer division at every sign (DuckDB's
    // // floors only for floats), so the reference uses plain /
    val want = Seq("A", "B", "C").map { d =>
      val ids = domains.collect { case (id, dd) if dd == d => id }
      val ng = ids.map(sc(_)._1).sum
      val cm = ids.map(sc(_)._2).sum
      val excess = cm / math.max(ng, 1L)
      val factor = math.max(1000000L + (500000L * excess) / 1000000L,
        100000L)
      d -> (ids.size.toLong, excess, factor)
    }
    val totF = want.map(_._2._3).sum
    for ((d, (n, excess, factor)) <- want) {
      val w = ((1000000L - 10000L) * (factor * 1000000L / totF)) / 1000000L +
        10000L / 3L
      assert(got(d) === ((n, excess, w)), s"domain $d mismatch")
    }
  }

  test("softDedupWeights matches the sequential reference and downweights common docs") {
    // three near-copies of the same sentence (common) + one rare doc
    val corpusRows = Seq(
      1L -> "the cat sat on the mat",
      2L -> "the cat sat on the mat",
      3L -> "the cat sat on the mat again",
      4L -> "zephyr quokka glyph nimbus vortex",
      5L -> "x") // sub-order: excluded
    def reference(minW: Long): Map[Long, (Long, Long)] = {
      val sc = expected(corpusRows, corpusRows.map(_._2))
      val rar = sc.collect { case (id, (n, sum, _)) if n > 0 =>
        id -> sum / n }
      val mean = rar.values.sum / rar.size
      rar.map { case (id, r) =>
        id -> ((r, math.max(r * 1000000L / mean, minW))) }
    }
    for (minW <- Seq(0L, 900000L)) {
      val got = Lm.softDedupWeights(docs(corpusRows: _*), "doc_id", "text",
          minWeightPpm = minW)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got === reference(minW), s"minWeightPpm=$minW")
    }
    val unclamped = Lm.softDedupWeights(docs(corpusRows: _*), "doc_id",
        "text", minWeightPpm = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the rare doc outweighs every common near-copy; doc 5 excluded
    assert(!unclamped.contains(5L))
    for (id <- Seq(1L, 2L, 3L))
      assert(unclamped(4L) > unclamped(id),
        s"rare doc not upweighted over $id: $unclamped")
    // identical docs get identical weights; mean ~1e6 up to flooring
    assert(unclamped(1L) === unclamped(2L))
    val mean = unclamped.values.sum / unclamped.size
    assert(mean >= 900000L && mean <= 1100000L, s"weight mean $mean")
    // partition independence
    val repart = Lm.softDedupWeights(docs(corpusRows: _*).repartition(7),
        "doc_id", "text", minWeightPpm = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(repart === unclamped)
  }
}
