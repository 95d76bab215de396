package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE trainer pinned against the hand-computable classic corpus
  * (hug/pug/hugs — Sennrich-style worked example) plus the greedy
  * left-to-right merge rule, OOV fallback, and partitioning
  * independence.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  import Bpe._

  private def corpus() = {
    import spark.implicits._
    // "hug" ×10, "pug" ×5, "hugs" ×5 as documents
    (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(5)("hugs"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("merge sequence matches the worked example") {
    val census = wordCensus(corpus(), "text")
    val (merges, seg) = train(census, numMerges = 3)
    // pairs round 1: (u,g)=20, (h,u)=15, (p,u)=5, (g,s)=5 -> merge ug
    // round 2: (h,ug)=15, (p,ug)=5, (ug,s)=5 -> merge hug
    // round 3: (p,ug)=5, (hug,s)=5 -> tie on n, lexicographic: hug<p
    assert(merges.map(m => (m._1, m._2)) ==
      Seq(("u", "g"), ("h", "ug"), ("hug", "s")))
    assert(merges.map(_._3) == Seq(20L, 15L, 5L))
    val segs = seg.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2)).toMap
    assert(segs("hug") == Seq("hug"))
    assert(segs("hugs") == Seq("hugs"))
    assert(segs("pug") == Seq("p", "ug"))
  }

  test("greedy scan merges the leftmost pair first on runs") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
    val out = df.select(mergeStep(col("syms"), "a", "a").as("m"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("aa", "a"))
  }

  test("training stops early below minPairFreq and on exhausted pairs") {
    val census = wordCensus(corpus(), "text")
    val (merges, _) = train(census, numMerges = 100, minPairFreq = 6L)
    // only (u,g)=20 and (h,ug)=15 clear a floor of 6
    assert(merges.map(m => (m._1, m._2)) == Seq(("u", "g"), ("h", "ug")))
  }

  test("encodeStats resolves known words via the vocab and char-splits OOV") {
    import spark.implicits._
    val census = wordCensus(corpus(), "text")
    val (_, seg) = train(census, numMerges = 3)
    val docs = Seq((1L, "hug pug"), (2L, "zebra hugs")).toDF("doc_id", "text")
    val stats = encodeStats(docs, "doc_id", "text", seg)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: hug->1 subword, pug->2 -> 3 subwords, 0 OOV
    // doc 2: zebra OOV -> 5 chars, hugs->1 -> 6 subwords, 1 OOV
    assert(stats.toSeq == Seq((1L, 3L, 0L), (2L, 6L, 1L)))
  }

  test("mergeStep preserves the character stream on varied inputs") {
    import spark.implicits._
    val r = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "c")
    val rows = (1 to 60).map { i =>
      (i, (0 until (1 + r.nextInt(8))).map(_ =>
        alphabet(r.nextInt(alphabet.size))))
    }
    val df = rows.toDF("id", "syms")
    for ((a, b) <- Seq(("a", "b"), ("ab", "c"), ("b", "b"), ("c", "a"))) {
      val out = df.select(col("id"),
        concat_ws("", col("syms")).as("before"),
        concat_ws("", mergeStep(col("syms"), a, b)).as("after"))
        .collect()
      for (row <- out)
        assert(row.getString(1) == row.getString(2),
          s"merge ($a,$b) altered id=${row.getInt(0)}: " +
            s"${row.getString(1)} -> ${row.getString(2)}")
    }
  }

  test("train frees intermediate checkpoint blocks (only the final seg stays persisted)") {
    // each round localCheckpoints a new segmentation; the previous
    // round's RDD must be unpersisted eagerly (Dataset.unpersist is a
    // no-op on a LogicalRDD — the handle is the underlying RDD). At
    // 10⁴–10⁵ production merges a leak here accumulates executor
    // storage for the whole train
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (_, seg) = train(wordCensus(corpus(), "text"), numMerges = 3)
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.size <= 1,
      s"train leaked ${leaked.size} persistent RDDs (expected at most the final seg)")
    assert(seg.count() == 3) // the surviving checkpoint still serves reads
  }

  test("training is independent of census partitioning") {
    val census = wordCensus(corpus(), "text")
    val (m1, _) = train(census, 3)
    val (m2, _) = train(census.repartition(7), 3)
    assert(m1 == m2)
  }

  test("segmentWords (the saved-vocab reload path) equals the trainer's segmentation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val census = wordCensus(docs, "text")
    val (merges, seg) = train(census, numMerges = 8)
    val expected = seg.collect()
      .map(r => r.getAs[String]("word") -> r.getSeq[String](2).toList).toMap
    val replayed = segmentWords(census.select(col("word")),
      merges.map(m => (m._1, m._2)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(replayed.keySet == expected.keySet)
    for ((w, s) <- expected)
      assert(replayed(w) == s, s"word '$w': replay ${replayed(w)} != train $s")
  }

  test("segmentWords splits supplementary-plane chars like the trainer") {
    import spark.implicits._
    // U+1F600 is a surrogate pair in UTF-16; a code-unit split would
    // produce two lone halves that diverge from substr's code points
    val word = "a😀b"
    val census = Seq((word, 1L)).toDF("word", "freq")
    val (merges, seg) = train(census, numMerges = 1, minPairFreq = 1L)
    val trained = seg.collect()(0).getSeq[String](2).toList
    val replayed = segmentWords(census.select(col("word")),
      merges.map(m => (m._1, m._2)))
      .collect()(0).getSeq[String](1).toList
    assert(replayed == trained,
      s"unicode split diverged: replay $replayed != train $trained")
  }

  test("trainLocal (pair-count-delta trainer) equals train: merges AND segmentations, incl. ties, unicode, early stop") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val alphabet = "abcde😀".toCharArray // incl. a supplementary pair source
    def randWord(): String = {
      val cps = "abcde" + new String(Character.toChars(0x1F600))
      val arr = cps.codePoints().toArray
      (0 until (1 + rnd.nextInt(6)))
        .map(_ => new String(Character.toChars(arr(rnd.nextInt(arr.length)))))
        .mkString
    }
    assert(alphabet.length == 7) // sanity: the emoji is two chars
    for (trial <- 0 until 6) {
      val docs = (0 until 40).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(4))(randWord()).mkString(" ")))
        .toDF("doc_id", "text")
      val census = wordCensus(docs, "text")
      val rounds = 1 + rnd.nextInt(10)
      val (m1, s1) = train(census, numMerges = rounds)
      val (m2, s2) = trainLocal(census, numMerges = rounds)
      assert(m2 === m1, s"trial $trial: merge tables diverged")
      def segMap(df: org.apache.spark.sql.DataFrame) =
        df.select("word", "syms").collect()
          .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      assert(segMap(s2) === segMap(s1),
        s"trial $trial: segmentations diverged")
    }
  }

  test("trainLocal fails loudly past maxCensusRows — never a silent vocabulary truncation") {
    import spark.implicits._
    val census = (0 until 10).map(i => (s"w$i", 2L)).toDF("word", "freq")
    val ex = intercept[IllegalArgumentException] {
      trainLocal(census, numMerges = 2, maxCensusRows = 5)
    }
    assert(ex.getMessage.contains("maxCensusRows"))
  }

  test("round-1 pair statistic matches the SQL-gated rendering's semantics") {
    val census = wordCensus(corpus(), "text")
    val syms = expr(
      "transform(sequence(1, length(word)), i -> substr(word, i, 1))")
    val pairs = pairCounts(census, syms)
      .orderBy(col("n").desc, col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(pairs.toSeq == Seq(("u", "g", 20L), ("h", "u", 15L),
      ("g", "s", 5L), ("p", "u", 5L)))
  }
}
