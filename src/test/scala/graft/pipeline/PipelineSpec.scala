package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.text.TextFunctions

/** Specs for the corpus-pipeline operators (dedup, similarity search,
  * text analysis, multimodal plumbing). Cross-engine value agreement
  * is covered by the DuckDB oracle gate; these tests pin semantic
  * behavior on known fixtures.
  */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val rr = rows.map { case (i, t) => Row(i, t) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rr, 2),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType, nullable = false))))
  }

  test("exact dedup groups normalized duplicates") {
    val d = docs(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> "something else")
    val out = Dedup.exactDuplicates(d, "doc_id", "text").collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_dups") == 2).get
    assert(dup.getAs[Long]("keeper_id") == 1L)
  }

  test("ngram jaccard: identical docs score 1.0, disjoint docs absent") {
    val d = docs(
      1L -> "abcdefghij",
      2L -> "abcdefghij",
      3L -> "zzzzyyyyxx")
    val out = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_a") == 1L && out.head.getAs[Long]("id_b") == 2L)
    assert(out.head.getAs[Double]("jaccard") == 1.0)
  }

  test("containment catches a short doc quoted in a long one that jaccard misses") {
    val quoted = "The quick brown fox jumps over the lazy dog"
    val long = (1 to 30)
      .map(i => s"Unrelated filler sentence number $i with distinct content.")
      .mkString(" ") + " " + quoted + " " + (31 to 40)
      .map(i => s"More filler tail $i content entirely").mkString(" ")
    val d = docs(1L -> quoted, 2L -> long)
    val cont = Dedup.ngramContainmentPairs(
      d, "doc_id", "text", n = 3, threshold = 0.9, maxGramDocs = 0L)
      .collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("cont_a_in_b") == 1.0,
      s"quoted side must be fully contained: $r")
    assert(r.getAs[Double]("cont_b_in_a") < 0.3)
    // the symmetric form scores the same pair far below any usable bar
    val jac = Dedup.ngramJaccardPairs(
      d, "doc_id", "text", 3, 0.0001, maxGramDocs = 0L).collect()
    assert(jac.head.getAs[Double]("jaccard") < 0.2)
  }

  test("containment threshold applies to either direction; disjoint docs absent") {
    val d = docs(
      1L -> "abcdefghij",
      2L -> "abcdefghijklmnopqrst",
      3L -> "zzzzyyyyxxwwvvuuttss")
    val out = Dedup.ngramContainmentPairs(
        d, "doc_id", "text", 3, 0.9, maxGramDocs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L))) // 1 fully in 2; 3 shares nothing
  }

  test("minhash LSH finds identical and near-identical docs") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 38).map(i => s"word$i").mkString(" ") + " other tokens"
    val far = (100 to 140).map(i => s"term$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> near, 4L -> far)
    val out = Dedup.minhashLshPairs(d, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    val identical = out.find(p => p._1 == 1L && p._2 == 2L)
    assert(identical.exists(_._3 == 1.0), s"identical pair missing in $out")
    assert(!out.exists(p => p._2 == 4L && p._3 > 0.5), "disjoint doc matched")
  }

  test("incremental minhash banding equals the cross-side slice of a full run") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 38).map(i => s"word$i").mkString(" ") + " other tokens"
    val far = (100 to 140).map(i => s"term$i").mkString(" ")
    val corpus = docs(1L -> base, 2L -> near, 3L -> far)
    val batch = docs(101L -> base, 102L -> ("fresh " + far))
    val incr = Dedup.minhashLshPairsAgainst(
        Dedup.minhashSignatures(batch, "doc_id", "text", 16),
        Dedup.minhashSignatures(corpus, "doc_id", "text", 16),
        numHashes = 16, bands = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // ground truth: the full self-join run over corpus+batch, keeping
    // only (batch, corpus) pairs — the incremental form must find
    // exactly these without re-shingling the corpus side
    val full = Dedup.minhashLshPairs(
        corpus.unionByName(batch), "doc_id", "text", 16, 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => a <= 3L && b >= 101L }
      .map { case (a, b, n) => (b, a, n) }.toSet
    assert(incr === full)
    assert(incr.exists { case (n, c, _) => n == 101L && c == 1L },
      s"identical cross-side pair missing: $incr")
  }

  test("ngram jaccard hot-gram guard drops ubiquitous grams, keeps real dups") {
    // "zzz..." block shared by ALL docs is the hot gram source; docs 1/2
    // are otherwise identical, doc 3 disjoint
    val common = "z" * 20
    val d = docs(
      1L -> s"abcdefghij $common",
      2L -> s"abcdefghij $common",
      3L -> s"qrstuvwxyz!$common")
    val guarded = Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, 0.3,
      maxGramDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded.contains((1L, 2L)))
    assert(!guarded.contains((1L, 3L)) && !guarded.contains((2L, 3L)),
      s"hot grams still paired disjoint docs: $guarded")
  }

  test("wordShingles: documents shorter than n yield empty shingle sets, not errors") {
    import org.apache.spark.sql.functions.col
    val d = docs(1L -> "solo", 2L -> "two tokens", 3L -> "three whole tokens")
    val out = d.select(col("doc_id"),
      Dedup.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L).isEmpty && out(2L).isEmpty)
    assert(out(3L) == Seq("three whole tokens"))
  }

  test("simhash: identical equal, near docs closer than far docs") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val near = (1 to 37).map(i => s"word$i").mkString(" ") + " a b c"
    val far = (100 to 140).map(i => s"term$i").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> near, 4L -> far)
    val h = Dedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(h(a) ^ h(b))
    assert(ham(1L, 3L) < ham(1L, 4L),
      s"near ${ham(1L, 3L)} !< far ${ham(1L, 4L)}")
  }

  test("simhashNearDupPairs matches brute-force hamming exactly (pigeonhole recall = 1)") {
    // maxHamming=3 <= blocks-2=4, so a qualifying pair (<= 3 dirty
    // blocks) always leaves two clean blocks, i.e. agrees on at least
    // one block-PAIR table: candidate recall is 100% by construction,
    // and verification makes precision exact -> the banded join must
    // equal the all-pairs answer, not just approximate it
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val h = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, ha) <- h; (ib, hb) <- h
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    val banded = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute,
      s"missing=${brute.diff(banded)} extra=${banded.diff(brute)}")
  }

  /** Synthetic signature frame: n uniform-ish 48-bit fingerprints
    * (md5-derived, deterministic) — the adversarial regime for
    * candidate volume, since every near-dup structure is absent and
    * all collisions are chance.
    */
  private def syntheticSignatures(n: Int): DataFrame = {
    spark.range(n).toDF("id")
      .select(col("id"),
        conv(substring(md5(concat(lit("sig:"), col("id"))), 1, 12), 16, 10)
          .cast("long").as("simhash"))
  }

  test("simhash block-pair candidate volume stays ~linear when the corpus doubles") {
    // the round-3 single-block scheme (6 tables x 8-bit keys) passes
    // ~blocks/2^8 = 2.3% of ALL pairs as candidates regardless of
    // content — quadratic growth with a big constant. Block-pair keys
    // (15 tables x 16-bit) pass ~15/2^16 = 0.023%: on uniform random
    // fingerprints the candidate set must stay far below a tenth of a
    // percent of all pairs, at n and at 2n.
    def candidateCount(n: Int): (Long, Long) = {
      val buckets = Dedup.simhashBlockPairBuckets(
        syntheticSignatures(n), blocks = 6, maxBucketSize = 0)
      val cands = buckets.as("a")
        .join(buckets.as("b"),
          col("a.tbl") === col("b.tbl") && col("a.bkey") === col("b.bkey") &&
            col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      (cands, n.toLong * (n - 1) / 2)
    }
    val (c1, all1) = candidateCount(1000)
    val (c2, all2) = candidateCount(2000)
    assert(c1.toDouble / all1 < 0.001, s"candidates $c1 of $all1 pairs at n=1000")
    assert(c2.toDouble / all2 < 0.001, s"candidates $c2 of $all2 pairs at n=2000")
    // growth is bounded by ~4x (chance collisions quadruple); the old
    // 8-bit scheme would put both fractions at ~2.3% and fail above
    assert(c2 <= c1 * 6 + 60, s"candidate growth $c1 -> $c2 is superquadratic")
  }

  test("simhash hot-bucket census drops pathological buckets, census off keeps them") {
    // 300 identical fingerprints = every block-pair bucket holds all
    // 300 docs; with maxBucketSize=100 the census must drop them all
    val sh = spark.range(300).toDF("id")
      .select(col("id"), lit(0x0F0F0F0F0F0FL).as("simhash"))
    val dropped = Dedup.simhashNearDupPairsFromSignatures(
      sh, maxHamming = 3, blocks = 6, maxBucketSize = 100).count()
    assert(dropped == 0L, "census failed to drop the pathological bucket")
    val kept = Dedup.simhashNearDupPairsFromSignatures(
      sh, maxHamming = 3, blocks = 6, maxBucketSize = 0).count()
    assert(kept == 300L * 299 / 2, "census off must keep every pair")
  }

  test("text functions: tokens, lang id, quality, fingerprint") {
    val d = docs(
      1L -> "the cat and the dog went to the park",
      2L -> "der Hund und die Katze sind nicht mit mir",
      3L -> "xyzzy plugh")
    val out = d.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n") == 9)
    assert(out(1L).getAs[String]("lang") == "en")
    assert(out(2L).getAs[String]("lang") == "de")
    assert(out(3L).getAs[String]("lang") == "und")
    assert(out(1L).getAs[Double]("q") > out(3L).getAs[Double]("q"))

    // fingerprint is normalization-invariant
    val fp = docs(1L -> "A  B\tC", 2L -> "a b c")
      .select(TextFunctions.fingerprint(col("text"))).distinct().count()
    assert(fp == 1)
  }

  test("repetition score: multiset n-gram duplicate fraction, short-doc zero") {
    val d = docs(
      1L -> "a a a b",        // 1-grams: 4 total, 2 distinct -> 0.5
                              // 2-grams: [a a, a a, a b] -> 1 - 2/3
      2L -> "all words vary", // no repeats -> 0.0 at both orders
      3L -> "solo",           // < 2 tokens: rep2 = 0 by convention
      4L -> "")               // empty: both 0
    val out = d.select(col("doc_id"),
      TextFunctions.repetitionScore(col("text"), 1).as("r1"),
      TextFunctions.repetitionScore(col("text"), 2).as("r2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L)._1 == 0.5)
    assert(out(1L)._2 == 1.0 - 2.0 / 3.0)
    assert(out(2L) == ((0.0, 0.0)))
    assert(out(3L) == ((0.0, 0.0)))
    assert(out(4L) == ((0.0, 0.0)))
  }

  test("ANN: brute force exact ranks; LSH achieves recall on clustered vectors") {
    // clustered vectors: 3 clusters of near-identical directions
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Seq.fill(3)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = (0 until 60).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      Row(i.toLong, v.toSeq)
    }
    val emb = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType), nullable = false))))

    val queries = emb.filter(col("vec_id") < 3)
    val exact = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact top-5 of query i are same-cluster vectors
    assert(exact.forall { case (q, n) => (q % 3) == (n % 3) })

    val approx = Ann.lshTopK(queries, emb, "vec_id", "embedding", 5,
      planes = 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")

    val ivf = Ann.ivfTopK(queries, emb, "vec_id", "embedding", 5,
      nCells = 6, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = exact.intersect(ivf).size.toDouble / exact.size
    assert(ivfRecall >= 0.8, s"IVF recall $ivfRecall too low")
  }

  test("connected components: min-id clusters, chains flood across hops") {
    val pairRows = Seq((1L, 2L), (2L, 3L), (7L, 8L),
      // a 6-node chain entered high-to-low: min floods over 5 hops
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L))
      .map { case (a, b) => Row(a, b) }
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(pairRows, 2),
      StructType(Seq(StructField("id_a", LongType, nullable = false),
        StructField("id_b", LongType, nullable = false))))
    // driver union-find path (default threshold)
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L))
    assert(Seq(7L, 8L).forall(out(_) == 7L))
    assert((20L to 25L).forall(out(_) == 20L))
    // distributed pointer-jumping path must produce identical labels
    val dist = Dedup.connectedComponents(pairs, "id_a", "id_b",
      driverThresholdEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == out)
    // non-convergence is an error, not a partial answer
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 2,
        driverThresholdEdges = 0L)
    }
  }

  test("dedupApply keeps the canonical doc per cluster and all singletons") {
    val d = docs(1L -> "a", 2L -> "a dup", 3L -> "alone", 7L -> "b",
      8L -> "b dup", 9L -> "b dup2")
    // clusters as connectedComponents labels them: cluster = min id
    val clusterRows = Seq((1L, 1L), (2L, 1L), (7L, 7L), (8L, 7L), (9L, 7L))
      .map { case (i, c) => Row(i, c) }
    val clusters = spark.createDataFrame(
      spark.sparkContext.parallelize(clusterRows, 2),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("cluster", LongType, nullable = false))))
    val kept = Dedup.dedupApply(d, "doc_id", clusters)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // canonical members 1 and 7 survive, singleton 3 survives,
    // non-canonical 2/8/9 are dropped
    assert(kept == Set(1L, 3L, 7L))
    // end-to-end: pairs -> clusters -> apply over a real near-dup set
    val corpus = docs(10L -> "the quick brown fox jumps over the lazy dog",
      11L -> "the quick brown fox jumps over the lazy dog",
      12L -> "completely different text about spark shuffles")
    val pairs2 = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 3)
    val cc = Dedup.connectedComponents(pairs2, "id_a", "id_b")
    val survivors = Dedup.dedupApply(corpus, "doc_id", cc)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(survivors == Set(10L, 12L))
  }

  test("dedupApplyBest keeps the highest-quality member, ties to smallest id") {
    import org.apache.spark.sql.functions.{col, length}
    val d = docs(1L -> "short", 2L -> "the much longer duplicate copy",
      3L -> "alone", 7L -> "same len a", 8L -> "same len b")
    val clusterRows = Seq((1L, 1L), (2L, 1L), (7L, 7L), (8L, 7L))
      .map { case (i, c) => Row(i, c) }
    val clusters = spark.createDataFrame(
      spark.sparkContext.parallelize(clusterRows, 2),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("cluster", LongType, nullable = false))))
    val kept = Dedup.dedupApplyBest(d, "doc_id", clusters,
      length(col("text")).cast("long"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // cluster 1: doc 2 is longer → min-id doc 1 is DROPPED;
    // cluster 7: equal lengths → tie keeps the smaller id 7;
    // singleton 3 survives untouched
    assert(kept == Set(2L, 3L, 7L))
  }

  test("distributed connected components: 130k edges, 512-node chains, log-bounded rounds") {
    // the scale exercise the driver path can't stand in for: 256
    // disjoint chains of 512 nodes (130,816 pairs), forced onto the
    // distributed pointer-jumping path. Rounds are budgeted at
    // ceil(log2(511)) + slack + the final no-change round — far below
    // the 511 a plain one-hop flood would need; a maxIter of 16
    // therefore also ASSERTS the O(log diameter) convergence rate.
    val chain = 512L
    val n = chain * 256
    val pairs = spark.range(n)
      .filter(col("id") % chain =!= (chain - 1))
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val out = Dedup.connectedComponents(pairs, "id_a", "id_b",
      maxIter = 16, driverThresholdEdges = 0L)
    // every node labeled with its chain head
    val wrong = out
      .filter(col("cluster") =!= col("id") - (col("id") % chain)).count()
    assert(wrong == 0L, s"$wrong nodes mislabeled")
    assert(out.count() == n)
  }

  test("contamination scan finds planted benchmark overlap, skips clean docs") {
    val benchmark = docs(
      100L -> "what is the capital of france",
      101L -> "solve for x in the equation")
    val corpus = docs(
      1L -> "trivia night: what is the capital of france everyone", // contaminated
      2L -> "the capital of france is a lovely city", // shares "the capital of"+"capital of france"
      3L -> "completely unrelated cooking recipe content here")
    val out = Dedup.contaminationScan(corpus, benchmark, "doc_id", "text",
      n = 3, minSharedGrams = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L), s"got ${out.toSeq}")
    assert(out.forall(_._2 == 100L))
    // doc 1 contains the full probe: 4 shared 3-grams
    assert(out.find(_._1 == 1L).get._3 == 4L)
  }

  test("bloom prescreen: superset of contaminated docs, exact pass agrees") {
    val benchmark = docs(
      100L -> "what is the capital of france",
      101L -> "solve for x in the equation")
    val corpus = docs(
      (1L -> "trivia night: what is the capital of france everyone") +:
      (2L -> "the capital of france is a lovely city") +:
      (10L to 60L).map(i => i -> s"clean document number $i about cooking topic $i"): _*)
    val survivors = Dedup.contaminationPrescreen(
      corpus, benchmark, "text", n = 3,
      expectedGrams = 1000L, fpp = 0.01)
    val ids = survivors.select("doc_id").collect().map(_.getLong(0)).toSet
    // NO false negatives: both contaminated docs survive the screen
    assert(Set(1L, 2L).subsetOf(ids), s"prescreen dropped contaminated docs: $ids")
    // the screen actually screens (clean docs mostly eliminated)
    assert(ids.size < 20, s"prescreen kept too much: $ids")
    // exact pass on survivors == exact pass on the full corpus
    val onSurvivors = Dedup.contaminationScan(survivors, benchmark,
      "doc_id", "text", n = 3, minSharedGrams = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val onFull = Dedup.contaminationScan(corpus, benchmark,
      "doc_id", "text", n = 3, minSharedGrams = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(onSurvivors === onFull)
    // the probe is the built-in codegen'd might_contain expression,
    // not a closure UDF with a per-row serialization boundary
    val plan = survivors.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"prescreen no longer probes via the built-in bloom expression:\n$plan")
    assert(!plan.contains("UDF"),
      s"prescreen reintroduced a closure UDF:\n$plan")
  }

  test("tfidf: highest-scoring term per doc is its distinctive frequent term") {
    val d = docs(
      1L -> "apple apple banana",
      2L -> "banana cherry cherry cherry")
    val out = graft.text.TfIdf.topTerms(d, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    // N=2; idf(apple)=3/2, idf(banana)=3/3, idf(cherry)=3/2
    assert(out(1L) == ("apple", 2.0 * 1.5))
    assert(out(2L) == ("cherry", 3.0 * 1.5))

    // k=2: banana (shared, idf 1.0) ranks second in both docs
    val k2 = graft.text.TfIdf.topTerms(d, "doc_id", "text", k = 2)
      .filter(col("rnk") === 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k2(1L) == "banana" && k2(2L) == "banana")
  }

  test("resize plan: aspect-fit within box, no upscale, 1px floor") {
    val rows = Seq(
      Row(1L, 10L, 512, 96, "png"), // wide: scale 0.25 -> 128x24
      Row(2L, 10L, 50, 40, "png"), //  fits: unchanged
      Row(3L, 10L, 10, 960, "png")) // tall: scale 0.1 -> 1x96
    val meta = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.metaSchema)
    val out = Multimodal.resizePlan(meta, maxW = 128, maxH = 96)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))).toMap
    assert(out(1L) == ((128L, 24L)))
    assert(out(2L) == ((50L, 40L)))
    assert(out(3L) == ((1L, 96L)))
  }

  test("augment plan: crops in-bounds at 50-100%, deterministic, epoch-varied") {
    val rows = Seq(Row(1L, 10L, 512, 96, "png"), Row(2L, 10L, 1, 1, "png"))
    val meta = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.metaSchema)
    def plan() = Multimodal.augmentPlan(meta, epochs = 4).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("epoch"),
        r.getAs[Long]("crop_x"), r.getAs[Long]("crop_y"),
        r.getAs[Long]("crop_w"), r.getAs[Long]("crop_h"),
        r.getAs[Boolean]("flip")))
    val out = plan()
    assert(out.length == 8)
    out.foreach { case (id, _, x, y, w, h, _) =>
      val (iw, ih) = if (id == 1L) (512L, 96L) else (1L, 1L)
      assert(w >= math.max(1L, iw / 2) && w <= iw)
      assert(h >= math.max(1L, ih / 2) && h <= ih)
      assert(x >= 0 && x + w <= iw && y >= 0 && y + h <= ih)
    }
    // 1x1 degenerate image always crops to itself at (0, 0)
    assert(out.filter(_._1 == 2L).forall(t => t._3 == 0 && t._5 == 1L))
    // deterministic across runs; parameters vary across epochs
    assert(plan().toSeq == out.toSeq)
    assert(out.filter(_._1 == 1L).map(t => (t._3, t._4, t._5, t._6))
      .distinct.length > 1)
  }

  test("frame sampling: every stride-th frame, deterministic fingerprints") {
    val d = Multimodal.withFakePayload(docs(5L -> "0123456789"), "text")
    val out = Multimodal.sampleFrames(d, "doc_id", "content", stride = 4)
      .collect().sortBy(_.getLong(2))
    // 10 bytes -> n_frames = 11 -> sampled 0, 4, 8
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 4L, 8L))
    assert(out.forall(_.getLong(1) == 11L))
    val fp0 = out.head.getString(3)
    assert(fp0 == org.apache.commons.codec.digest.DigestUtils.md5Hex("5:0"))
  }

  test("audio windowing: hop-spaced windows cover the clip, last truncates") {
    val d = Multimodal.withFakePayload(docs(3L -> "0123456789"), "text")
    // 10 bytes -> n_samples = 100 + (10*31) % 3000 = 410 with sr=100
    val out = Multimodal.audioWindows(d, "doc_id", "content",
      sampleRate = 100, winSamples = 150, hopSamples = 100)
      .collect().sortBy(_.getLong(2))
    assert(out.forall(_.getLong(1) == 410L))
    assert(out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((0L, 0L, 150L), (1L, 100L, 250L), (2L, 200L, 350L),
        (3L, 300L, 410L), (4L, 400L, 410L)))
    // energy flags are deterministic md5 coins in [0, 1e6)
    assert(out.forall(r => r.getLong(5) >= 0L && r.getLong(5) < 1000000L))
    assert(out.forall(r => r.getBoolean(6) == (r.getLong(5) >= 300000L)))
  }

  test("multimodal: HeaderProbeDecoder reads real PNG and JPEG headers") {
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(
      Row(1L, imageBytes(7, 5, "png")),
      Row(2L, imageBytes(3, 9, "jpg")),
      Row(3L, "not an image".getBytes("UTF-8")))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("content", BinaryType, nullable = false))))
    val out = Multimodal.decodeMeta(d, "id", "content",
      Multimodal.HeaderProbeDecoder)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("format") == "png")
    assert(out(1L).getAs[Int]("width") == 7 && out(1L).getAs[Int]("height") == 5)
    assert(out(2L).getAs[String]("format") == "jpeg")
    assert(out(2L).getAs[Int]("width") == 3 && out(2L).getAs[Int]("height") == 9)
    assert(out(3L).getAs[String]("format") == "unknown")
    assert(out(3L).getAs[Long]("n_bytes") == 12L)

    // the documented schema equals the encoder-derived actual schema
    assert(Multimodal.decodeMeta(d, "id", "content").schema ==
      Multimodal.metaSchema)

    // JPEG spec allows extra 0xFF fill bytes before any marker; the
    // walker must skip them, not bail to "unknown"
    val jpeg = imageBytes(3, 9, "jpg")
    val filled = (jpeg.take(2) :+ 0xff.toByte) ++ jpeg.drop(2)
    val m = Multimodal.HeaderProbeDecoder.decode(9L, filled)
    assert(m.format == "jpeg" && m.width == 3 && m.height == 9)
  }

  test("multimodal: probe degrades cleanly on truncated and exotic real-media payloads") {
    def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def seg(marker: Int, body: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++ be16(body.length + 2) ++ body
    def imageBytes(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val probe = Multimodal.HeaderProbeDecoder

    // 1. truncated PNG: valid signature, IHDR cut off mid-dimensions —
    // must degrade to unknown + byte length, never read past the end
    val truncatedPng = imageBytes(7, 5, "png").take(18)
    val t = probe.decode(1L, truncatedPng)
    assert(t.format == "unknown" && t.n_bytes == 18L && t.width == 0)

    // 2. JPEG with an EXIF APP1 segment between SOI and the JFIF
    // tail — cameras emit this; the walker must skip APP1 by its
    // self-inclusive length and still find the SOF dimensions
    val jpeg = imageBytes(3, 9, "jpg")
    val app1 = seg(0xe1, "Exif  ".getBytes("US-ASCII") ++
      Array.fill(40)(0x2a.toByte))
    val exifJpeg = jpeg.take(2) ++ app1 ++ jpeg.drop(2)
    val e = probe.decode(2L, exifJpeg)
    assert(e.format == "jpeg" && e.width == 3 && e.height == 9)

    // 3. progressive JPEG: SOF2 frame header (0xC2), plus a decoy
    // second SOF0 later in the stream — the first frame header wins
    // (per spec the first SOF defines the image)
    val sof2 = seg(0xc2, Array(8.toByte) ++ be16(30) ++ be16(20) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val sof0Decoy = seg(0xc0, Array(8.toByte) ++ be16(99) ++ be16(77) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    val dqt = seg(0xdb, Array.fill(65)(1.toByte))
    val progressive = Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof2 ++ sof0Decoy
    val p = probe.decode(3L, progressive)
    assert(p.format == "jpeg" && p.width == 20 && p.height == 30)

    // 4. truncated JPEG: a segment length pointing past the end must
    // halt the walk (unknown), not throw
    val truncatedJpeg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xdb, Array.fill(65)(1.toByte)).take(6)
    val tj = probe.decode(4L, truncatedJpeg)
    assert(tj.format == "unknown" && tj.n_bytes == truncatedJpeg.length.toLong)
  }

  test("frame sampling: bound FrameProbe reads the count from the container header") {
    // payload models a container whose first 4 bytes carry the frame
    // count big-endian; the probe parses it per partition
    def payload(frames: Int, filler: Int): Array[Byte] =
      Array(((frames >> 24) & 0xff).toByte, ((frames >> 16) & 0xff).toByte,
        ((frames >> 8) & 0xff).toByte, (frames & 0xff).toByte) ++
        Array.fill(filler)(0x55.toByte)
    // vid 3: header claims 0 frames (unparseable/corrupt container) —
    // the clamp must yield one frame row, not a negative sequence bound
    val rows = Seq(Row(1L, payload(9, 100)), Row(2L, payload(2, 7)),
      Row(3L, payload(0, 5)))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("vid", LongType, nullable = false),
        StructField("content", BinaryType, nullable = false))))
    val out = Multimodal.sampleFrames(d, "vid", "content", stride = 4,
      probe = Some(Be32FrameProbe))
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    // 9 frames -> 0,4,8; 2 frames -> 0; clamped 0 -> 0
    assert(out.toSeq ==
      Seq((1L, 0L), (1L, 4L), (1L, 8L), (2L, 0L), (3L, 0L)))
    // stub default ignores the header: 104 bytes -> 1 + 104 % 240 = 105 frames
    val stub = Multimodal.sampleFrames(d.filter(col("vid") === 1), "vid",
      "content", stride = 60).collect()
    assert(stub.forall(_.getLong(1) == 105L) && stub.length == 2)
  }

  test("cluster-keyed split never straddles a near-dup family; an id split would") {
    import graft.ops.Sampling
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(10L, 11L), Row(20L, 21L)), 2),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val clusters = Dedup.connectedComponents(pairs, "id_a", "id_b")
    val ids = spark.range(1, 41).select(col("id").as("doc_id"))
    val keyed = ids.join(clusters, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("split_key"))
    val byDoc = Sampling.withSplit(keyed, "split_key", 0.5, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val families = Seq(Seq(1L, 2L, 3L), Seq(10L, 11L), Seq(20L, 21L))
    for (f <- families)
      assert(f.map(byDoc).distinct.size === 1,
        s"family $f straddles the split: ${f.map(byDoc)}")
    // premise check: the naive id-keyed split DOES separate at least
    // one of those families (otherwise this test proves nothing)
    val naive = Sampling.withSplit(
      ids.withColumn("split_key", col("doc_id")), "split_key", 0.5, seed = 42L)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(families.exists(f => f.map(naive).distinct.size > 1),
      "test premise broken: id split kept every family together")
  }

  test("multimodal: payload plumbing round trip with stub decoder") {
    val d = docs(1L -> "abcd", 2L -> "efghijkl")
    val out = Multimodal.decodeMeta(
      Multimodal.withFakePayload(d, "text"), "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_bytes") == 4L)
    assert(out(1L).getAs[Int]("width") == 5)
    assert(out(2L).getAs[Long]("n_bytes") == 8L)
    assert(out(2L).getAs[String]("format") == "webp")
  }
}

/** Test probe: frame count = big-endian int in the first 4 bytes.
  * Top-level so the closure serializes without dragging the spec
  * class along.
  */
private object Be32FrameProbe extends Multimodal.FrameProbe {
  override def frameCount(id: Long, payload: Array[Byte]): Long =
    (((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
      ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)).toLong
}
