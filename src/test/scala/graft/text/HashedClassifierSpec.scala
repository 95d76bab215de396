package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hashing-trick classifier: feature construction (unigrams +
  * adjacent bigrams), determinism, edge docs, and the census
  * arithmetic.
  */
class HashedClassifierSpec extends AnyFunSuite with SparkSpec {

  test("n_grams counts unigrams plus adjacent bigrams") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "solo"), (3L, "  "), (4L, "x  y"))
      .toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text")
      .orderBy("id").collect()
    // "a b c": 3 unigrams + 2 bigrams; "solo": 1 + 0; "": absent;
    // double-space "x  y" still tokenizes to 2 + 1
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (2L, 1L), (4L, 3L)))
  }

  test("score is the exact mean of per-gram weights") {
    import spark.implicits._
    val df = Seq((7L, "alpha beta")).toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text").head()
    // independent recomputation: 3 grams (alpha, beta, alpha_beta)
    def h(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def w(g: String): Long = h(s"w:${h(g) % 4096}") % 2001 - 1000
    val wsum = Seq("alpha", "beta", "alpha_beta").map(w).sum
    assert(out.getLong(1) == 3L)
    assert(out.getLong(2) == wsum)
    assert(out.getDouble(3) == wsum.toDouble / 3.0)
  }

  test("identical texts score identically; case-insensitive") {
    import spark.implicits._
    val df = Seq((1L, "The Quick Fox"), (2L, "the quick fox"))
      .toDF("doc_id", "text")
    val out = HashedClassifier.score(df, "doc_id", "text")
      .select("w_sum").distinct().count()
    assert(out == 1L)
  }

  private def labeledCorpus(ids: Range) = {
    import spark.implicits._
    // separable classes: spam docs carry spamword tokens, ham hamword
    ids.map { i =>
      val y = i % 2
      val cls = if (y == 1) "spamword offerjunk spamword" else "hamword calmtext hamword"
      (i.toLong, y.toLong, s"filler common text number $i $cls")
    }.toDF("id", "label", "text")
  }

  test("trainer separates planted classes: 100% holdout accuracy") {
    val train = labeledCorpus(0 until 60)
    val holdout = labeledCorpus(60 until 100)
    val w = HashedClassifier.train(train, "text", "label")
    val acc = HashedClassifier
      .holdoutAccuracy(holdout, "id", "text", "label", w)
      .collect().map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_correct"))).toMap
    assert(acc(0L)._1 == 20L && acc(0L) == (20L, 20L), s"got $acc")
    assert(acc(1L)._1 == 20L && acc(1L) == (20L, 20L), s"got $acc")
  }

  test("reliability census: pos rate rises with the score band") {
    val train = labeledCorpus(0 until 60)
    val holdout = labeledCorpus(60 until 100)
    val w = HashedClassifier.train(train, "text", "label")
    val bands = HashedClassifier
      .reliability(holdout, "id", "text", "label", w)
      .orderBy("band").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(bands.map(_._2).sum == 40L)                  // every doc banded
    // separable classes: strictly 0 ppm below some band, 1e6 above
    val (neg, pos) = bands.partition(_._3 == 0L)
    assert(neg.nonEmpty && pos.nonEmpty)
    assert(pos.forall(_._3 == 1000000L), s"mixed bands: ${bands.toSeq}")
    assert(neg.map(_._1).max < pos.map(_._1).min,
      s"band order broken: ${bands.toSeq}")
  }

  test("prCurve: confusion identities hold and the sweep finds the separating band") {
    val train = labeledCorpus(0 until 60)
    val holdout = labeledCorpus(60 until 100)
    val w = HashedClassifier.train(train, "text", "label")
    val rows = HashedClassifier
      .prCurve(holdout, "id", "text", "label", w)
      .orderBy(col("band").desc).collect()
    val totalPos = 20L
    rows.foreach { r =>
      val (tp, fp, fn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
        r.getAs[Long]("fn"))
      assert(tp + fn === totalPos) // confusion identity
      assert(r.getAs[Long]("recall_ppm") === tp * 1000000L / totalPos)
      assert(r.getAs[Long]("precision_ppm") === tp * 1000000L / math.max(tp + fp, 1L))
    }
    // recall grows monotonically as the threshold loosens
    val recalls = rows.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b })
    // separable classes: some band has perfect precision AND recall
    assert(rows.exists(r => r.getAs[Long]("precision_ppm") == 1000000L &&
      r.getAs[Long]("recall_ppm") == 1000000L), rows.mkString("\n"))
    // loosest band keeps everything: recall 1, precision = base rate
    assert(recalls.last === 1000000L)
  }

  test("trained weights: class-indicative buckets carry the class sign") {
    import org.apache.spark.sql.functions._
    val w = HashedClassifier.train(labeledCorpus(0 until 60), "text", "label")
    // the bucket 'spamword' hashes to must be positive-weighted, the
    // 'hamword' bucket negative (they never co-occur across classes)
    val spamB = HashedClassifier.bucket(lit("spamword"), 4096)
    val hamB = HashedClassifier.bucket(lit("hamword"), 4096)
    val rows = w.withColumn("sb", spamB).withColumn("hb", hamB)
      .select(col("bucket"), col("w"), col("sb"), col("hb")).collect()
    val spamW = rows.find(r => r.getAs[Long]("bucket") == r.getAs[Long]("sb")).get
    val hamW = rows.find(r => r.getAs[Long]("bucket") == r.getAs[Long]("hb")).get
    assert(spamW.getAs[Long]("w") > 0, s"spam bucket weight ${spamW.getAs[Long]("w")}")
    assert(hamW.getAs[Long]("w") < 0, s"ham bucket weight ${hamW.getAs[Long]("w")}")
  }

  test("unseen buckets score with the smoothing-only weight, not null") {
    import spark.implicits._
    val w = HashedClassifier.train(labeledCorpus(0 until 20), "text", "label")
    val novel = Seq((999L, "zzzunseen qqqnovel")).toDF("id", "text")
    val out = HashedClassifier.scoreTrained(novel, "id", "text", w).head()
    assert(out.getAs[Long]("n_grams") == 3L) // 2 unigrams + 1 bigram
    assert(!out.isNullAt(out.fieldIndex("w_sum")))
  }
}
