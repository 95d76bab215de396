package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.text.TextFunctions

/** Document deduplication for large-scale corpus pipelines: exact
  * (hash groupBy), n-gram Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Scale design (100 TB, 1000 executors):
  *   - exact dedup is one hash-shuffle on a 128-bit fingerprint with
  *     map-side partial aggregation — the minimum possible;
  *   - MinHash signatures are computed in a single explode→groupBy
  *     pass (map-side combine on doc_id, no skew: keys are doc ids);
  *     the LSH band join shuffles on (band, bandKey) — hot buckets
  *     (boilerplate documents) are the skew risk, bounded by
  *     `maxBucketSize` which drops pathological buckets instead of
  *     letting one reducer own a quadratic blow-up (AQE skew-join
  *     handles the moderate cases);
  *   - pair verification joins signatures by doc id — broadcastable
  *     when the candidate set is small, shuffle-join otherwise;
  *   - SimHash is map-only per document; near-dup search over simhash
  *     is a band join on 16-bit block-pair keys (same LSH shape,
  *     pigeonhole-exact), with the same hot-bucket census.
  *
  * All hash functions are md5-based so the DuckDB oracle can evaluate
  * the identical function; a production deployment would swap in
  * xxhash64 (also a codegen'd Spark builtin) for ~4× hash throughput
  * without changing the shape of any plan.
  */
object Dedup {

  /** Exact duplicate groups: normalize→fingerprint→groupBy.
    * Returns (fp, n_dups, keeper_id) per distinct text.
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))

  // ---- n-gram Jaccard ------------------------------------------------

  /** Distinct character n-grams per document. */
  def charNgrams(text: Column, n: Int): Column =
    array_distinct(
      filter(
        transform(
          // floor at 1: sequence(1, 0) would generate a DESCENDING
          // sequence; the length filter below drops the short gram
          sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
          i => text.substr(i, lit(n))),
        g => length(g) === n))

  /** All-pairs n-gram Jaccard similarity ≥ threshold, computed by
    * exploding grams and joining on shared grams (docs sharing no
    * gram never meet — the join IS the candidate filter).
    *
    * @param maxGramDocs skew guard for corpus scale, ON by default:
    *   grams occurring in more than this many documents are dropped
    *   from the join (a gram in d docs contributes d² join rows;
    *   ubiquitous "stop-grams" dominate cost while carrying no
    *   discriminative signal). Pass 0 to disable — exact Jaccard,
    *   used by the oracle-checked demo. Document sizes are still
    *   computed over ALL grams, so the guard only *under*-counts
    *   intersections (similarity estimates are conservative).
    */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxGramDocs: Long = 1000L,
  ): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"),
        explode(charNgrams(col(textCol), n)).as("gram"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val joinGrams =
      if (maxGramDocs <= 0) grams
      else {
        val hot = grams.groupBy(col("gram"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxGramDocs)
          .select(col("gram"))
        grams.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    // the gram frame feeds the self-join straight from scan + explode
    // (no shuffle in between), so the planner's size estimate is the
    // PRE-explode scan bytes — ~length(text)x under — and an
    // auto-broadcast of a corpus-scale gram side can slip beneath the
    // threshold (the Substr anchor lesson, found by the factor-30
    // ScaleTrend point). Both sides are the same corpus-scale frame;
    // pin sort-merge
    val inter = joinGrams.as("a")
      .join(joinGrams.as("b").hint("merge"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("n_common")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** All-pairs n-gram CONTAINMENT ≥ threshold — the asymmetric
    * Jaccard variant that catches what symmetric similarity cannot: a
    * short document quoted wholesale inside a much longer one (news
    * snippet in an aggregator page, README embedded in a bundle).
    * Jaccard divides by the UNION and so vanishes when sizes differ
    * (a 100-gram doc fully inside a 10,000-gram doc scores ≈0.01);
    * containment divides by each side's OWN size, so the quoted side
    * still scores 1.0. Output: `(id_a, id_b, n_common, cont_a_in_b,
    * cont_b_in_a)` for `id_a < id_b` where EITHER direction meets the
    * threshold — the caller drops the contained (usually smaller)
    * side. Each containment is ONE IEEE division of exact ints —
    * engine-exact.
    *
    * Scale shape: identical to [[ngramJaccardPairs]] — the shared-gram
    * equi-join IS the candidate filter (docs sharing no gram never
    * meet), with the same `maxGramDocs` stop-gram guard; since sizes
    * stay exact while the guard only thins the JOIN, containments are
    * conservative underestimates, never inflated.
    */
  def ngramContainmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxGramDocs: Long = 1000L,
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold must be in (0, 1]")
    val grams = df
      .select(col(idCol).as("id"),
        explode(charNgrams(col(textCol), n)).as("gram"))
    val sizes = grams.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val joinGrams =
      if (maxGramDocs <= 0) grams
      else {
        val hot = grams.groupBy(col("gram"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxGramDocs)
          .select(col("gram"))
        grams.join(broadcast(hot), Seq("gram"), "left_anti")
      }
    // the gram frame feeds the self-join straight from scan + explode
    // (no shuffle in between), so the planner's size estimate is the
    // PRE-explode scan bytes — ~length(text)x under — and an
    // auto-broadcast of a corpus-scale gram side can slip beneath the
    // threshold (the Substr anchor lesson, found by the factor-30
    // ScaleTrend point). Both sides are the same corpus-scale frame;
    // pin sort-merge
    val inter = joinGrams.as("a")
      .join(joinGrams.as("b").hint("merge"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("n_common").cast("double") / col("sa.sz").cast("double"))
          .as("cont_a_in_b"),
        (col("n_common").cast("double") / col("sb.sz").cast("double"))
          .as("cont_b_in_a"))
      .filter(col("cont_a_in_b") >= threshold ||
        col("cont_b_in_a") >= threshold)
  }

  /** Benchmark decontamination scan: corpus documents sharing at least
    * `minSharedGrams` distinct word `n`-grams with any probe
    * (benchmark/eval) document — the standard n-gram-overlap
    * contamination test run before training. Output:
    * (doc_id, probe_id, n_shared_grams).
    *
    * Scale shape: the probe side is SMALL by construction (eval
    * suites), so its exploded gram set is broadcast; the corpus is
    * touched in one map pass — explode shingles, broadcast-hash-join,
    * partial-aggregate on (doc, probe). No corpus-side shuffle of
    * text, no pairwise blow-up: cost is O(corpus grams) + matches.
    */
  def contaminationScan(
      corpus: DataFrame, probes: DataFrame,
      idCol: String, textCol: String,
      n: Int = 5, minSharedGrams: Long = 1L,
  ): DataFrame = {
    // tokens projected BEFORE windowing: the shingle lambda then reads
    // a materialized array per row instead of re-tokenizing per window
    val cg = corpus
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(wordShinglesOf(col("toks"), n)).as("gram"))
    val pg = probes
      .select(col(idCol).as("probe_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("probe_id"), explode(wordShinglesOf(col("toks"), n)).as("gram"))
    cg.join(broadcast(pg), Seq("gram"))
      .groupBy(col("doc_id"), col("probe_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minSharedGrams)
  }

  /** Bloom-filter pre-screen for [[contaminationScan]]: when the
    * benchmark probe set is too large to broadcast as raw grams (a
    * joined contamination sweep over EVERY eval suite at once), build
    * one Bloom filter over the probes' n-grams and keep only the
    * corpus documents with at least one might-contain gram. The
    * filter is a fixed-size bit array (`expectedGrams` at `fpp` —
    * ~1.2 GB for 10⁹ grams at 1%, vs tens of GB of raw gram strings),
    * and the scan is map-only: no join, no shuffle of the corpus.
    *
    * Semantics: a SUPERSET of truly contaminated documents — Bloom
    * filters have NO false negatives, so nothing contaminated
    * escapes; false positives (≤ `fpp` per gram probe) are resolved
    * by running the exact [[contaminationScan]] on the (small)
    * surviving subset. Returns the corpus rows that need the exact
    * pass.
    */
  def contaminationPrescreen(
      corpus: DataFrame, probes: DataFrame, textCol: String,
      n: Int = 5, expectedGrams: Long = 1000000L, fpp: Double = 0.01,
  ): DataFrame = {
    require(expectedGrams > 0, s"expectedGrams $expectedGrams must be positive")
    require(fpp > 0.0 && fpp < 1.0, s"fpp $fpp not in (0,1)")
    val probeGrams = probes
      .select(TextFunctions.tokens(col(textCol)).as("toks"))
      .select(explode(wordShinglesOf(col("toks"), n)).as("gram"))
    // built-in BloomFilterAggregate/BloomFilterMightContain (the
    // expression pair behind Spark's own runtime row-group filters —
    // internal registry, so constructed via the catalyst Bridge), not
    // a driver-built sketch + closure UDF: the aggregation runs
    // distributed, the resulting bit-array binary embeds as a
    // foldable literal (might_contain requires a constant or scalar
    // subquery), and the probe below stays inside whole-stage codegen
    // — no per-row serialization boundary. The binary rides the
    // stage's TorrentBroadcast task binary exactly like the old
    // closure-captured broadcast did, so shipping cost is unchanged;
    // grams hash through xxhash64 on BOTH sides (same
    // no-false-negative guarantee as hashing the raw strings). NOTE:
    // BloomFilterAggregate clamps its size to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits
    // (defaults 4M items / 67M bits) — raise those confs for
    // billion-gram sweeps or the realized fpp degrades silently.
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedGrams, fpp)
    val bloomBits = probeGrams
      .agg(Bridge.column(aggregate.BloomFilterAggregate(
        Bridge.eagerExpression(xxhash64(col("gram"))),
        Bridge.eagerExpression(lit(expectedGrams)),
        Bridge.eagerExpression(lit(numBits)), 0, 0)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    corpus.filter(exists(
      wordShinglesOf(TextFunctions.tokens(col(textCol)), n),
      g => Bridge.column(BloomFilterMightContain(
        Bridge.eagerExpression(lit(bloomBits)),
        Bridge.eagerExpression(xxhash64(g))))))
  }

  /** DuckDB rendering of [[contaminationScan]] over
    * `documents(doc_id, text)`: corpus = `corpusWhere`, probes =
    * `probeWhere`. The word-shingle construction mirrors
    * [[wordShingles]] exactly (1-based windows, space-joined,
    * distinct).
    */
  def contaminationSql(
      n: Int, minSharedGrams: Long,
      corpusWhere: String, probeWhere: String,
  ): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    // tokens projected in their own CTE (mirrors the Spark side: the
    // windowing lambda must read a column, not re-tokenize per element)
    val sh =
      s"""list_distinct(list_filter(list_transform(
         |  range(1, greatest(len(t) - ${n - 1}, 1) + 1),
         |  i -> CASE WHEN i + ${n - 1} <= len(t)
         |    THEN array_to_string(t[i:i+${n - 1}], ' ') END),
         |  s -> s IS NOT NULL))""".stripMargin
    s"""WITH ct AS (SELECT doc_id, $toks AS t FROM documents $corpusWhere),
       |pt AS (SELECT doc_id, $toks AS t FROM documents $probeWhere),
       |cg AS (SELECT doc_id, unnest($sh) AS gram FROM ct),
       |pg AS (SELECT doc_id AS probe_id, unnest($sh) AS gram FROM pt)
       |SELECT doc_id, probe_id, count(*) AS n_shared_grams
       |FROM cg JOIN pg USING (gram)
       |GROUP BY 1, 2 HAVING count(*) >= $minSharedGrams
       |ORDER BY doc_id, probe_id""".stripMargin
  }

  // ---- MinHash + LSH -------------------------------------------------

  /** Distinct whitespace-token shingles (word `n`-shingles). */
  def wordShingles(text: Column, n: Int): Column =
    if (n == 1) array_distinct(TextFunctions.tokens(text))
    else wordShinglesOf(TextFunctions.tokens(text), n)

  /** [[wordShingles]] over an already-tokenized array column: the
    * distinct SET of the n-gram multiset built by
    * [[graft.text.TextFunctions.allGramsOf]] (one shared fold — see
    * its scaladoc for the zip_with/slice construction and the
    * O(tokens²) HOF trap it avoids; measured 6 s vs 0.84 s for the
    * contamination scan at sf0.1).
    */
  def wordShinglesOf(toks: Column, n: Int): Column =
    array_distinct(TextFunctions.allGramsOf(toks, n))

  /** Modulus for the affine minhash rehash: the Mersenne prime
    * 2^31 − 1. Base hashes are 28-bit, multipliers < p, so
    * `a·h + b < 2^59` — overflow-free in 64-bit on every engine.
    */
  val MinhashP = 2147483647L

  /** Affine coefficients derived driver-side from
    * [[graft.functions.HashSeeds.md5TopLong]] (same rule as the LSH
    * plane weights: constants are computed ONCE at plan build, never
    * per row).
    */
  private[dedup] def minhashA(j: Int): Long =
    graft.functions.HashSeeds.md5TopLong(s"a:$j") % (MinhashP - 1) + 1
  private[dedup] def minhashB(j: Int): Long =
    graft.functions.HashSeeds.md5TopLong(s"b:$j") % MinhashP

  /** MinHash signature columns mh0..mh{k-1}: per hash j, the minimum
    * of the affine rehash `(a_j · h + b_j) mod p` over the document's
    * shingles, where `h` is the 28-bit base hash (top 7 hex chars of
    * md5(shingle)). ONE md5 per shingle — the per-hash family costs a
    * multiply-add each, not another digest (16 hashes ≈ 16× less
    * hashing than md5-per-(hash × shingle) at identical LSH
    * semantics). md5-keyed so the oracle computes identical values;
    * the 28-bit base domain makes token collisions possible
    * (~|vocab|²/2^29) but minhash is a Jaccard *estimator* either way
    * and the estimate is unbiased under universal hashing.
    */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String, numHashes: Int,
  ): DataFrame = {
    val shingled = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), 1)).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 7), 16, 10).cast("long"))
    val aggs = signatureAggs(numHashes)
    shingled.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** The `numHashes` per-signature min aggregations over the shingle
    * hash column `h` — shared by the batch [[minhashSignatures]] and
    * the windowed streaming variant
    * ([[graft.streaming.Streams.minhashIncrStream]]), so the two can
    * never drift.
    */
  private[graft] def signatureAggs(numHashes: Int): Seq[Column] =
    (0 until numHashes).map { j =>
      min((lit(minhashA(j)) * col("h") + lit(minhashB(j))) % MinhashP).as(s"mh$j")
    }

  /** One row per (signature row, band) with the band's bucket key
    * `bkey = md5(mh_{b·r} | … | mh_{b·r+r−1})`, mh columns carried —
    * the shared banding of [[minhashLshPairsAgainst]] and the
    * streaming ingest twin.
    */
  private[graft] def bandedSignatures(
      sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (0 until r).map(i => col(s"mh${b * r + i}").cast("string")): _*))
          .as("bkey"))
    }
    sig.select(sig.columns.map(col).toSeq :+
        explode(array(bandCols: _*)).as("bb"): _*)
      .withColumn("band", col("bb.band"))
      .withColumn("bkey", col("bb.bkey"))
      .drop("bb")
  }

  /** LSH candidate pairs + exact signature agreement. Bands the
    * signature into `bands` groups of `numHashes/bands` rows, buckets
    * by the md5 of each band, pairs documents sharing any bucket, then
    * scores candidates by the fraction of agreeing minhashes
    * (unbiased Jaccard estimate).
    *
    * @param maxBucketSize skew guard: buckets larger than this are
    *   dropped entirely via a broadcast anti-join on the (small) hot
    *   bucket list — the hot key never concentrates on one reducer
    *   (pathological boilerplate at corpus scale would otherwise
    *   create a quadratic blow-up).
    * @param persistSignatures cache the signature frame
    *   (MEMORY_AND_DISK, default on): the shingle+minhash aggregation
    *   — the most expensive map stage at corpus scale — feeds the
    *   hot-bucket census AND both sides of the pair self-join; one
    *   materialized pass serves all three instead of re-running the
    *   aggregation per use. The cache entry lives until the session
    *   drops it; pass false when the caller persists
    *   [[minhashSignatures]] upstream and owns its lifecycle.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4,
      maxBucketSize: Int = 1000, persistSignatures: Boolean = true,
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig0 = minhashSignatures(df, idCol, textCol, numHashes)
    val sig =
      if (persistSignatures)
        sig0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sig0

    // band keys WITH the full signature carried along: the later
    // verification needs sa.mh*/sb.mh*, and carrying them through the
    // bucket join replaces two doc-keyed shuffle joins with wider rows
    // on the one join we already pay for.
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (0 until r).map(i => col(s"mh${b * r + i}").cast("string")): _*))
          .as("bkey"))
    }
    val buckets = sig
      .select(col("id") +: explode(array(bandCols: _*)).as("bb") +:
        (0 until numHashes).map(j => col(s"mh$j")): _*)
      .select(col("id") +: col("bb.band").as("band") +: col("bb.bkey").as("bkey") +:
        (0 until numHashes).map(j => col(s"mh$j")): _*)

    // hot-bucket census: tiny (only buckets over the cap), broadcast
    // anti-joined so no reducer ever owns a pathological bucket.
    // Int.MaxValue = guard disabled by contract (no bucket can exceed
    // it): skip the census pass entirely — the stance gates whose
    // oracles render no guard pin, so Spark and the oracle run the
    // same contract (the bandJoinAgainstStore rule)
    val bounded =
      if (maxBucketSize == Int.MaxValue) buckets
      else {
        val hot = buckets.groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucketSize)
          .select(col("band"), col("bkey"))
        buckets.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
      }

    val agree = (0 until numHashes)
      .map(j => when(col(s"sa.mh$j") === col(s"sb.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    bounded.as("sa")
      .join(bounded.as("sb"),
        col("sa.band") === col("sb.band") && col("sa.bkey") === col("sb.bkey") &&
          col("sa.id") < col("sb.id"))
      .select(col("sa.id").as("id_a"), col("sb.id").as("id_b"),
        agree.as("n_common_minhash"),
        (agree.cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Incremental LSH candidate pairs: a NEW batch banded against a
    * PERSISTED corpus signature table — the shape that makes MinHash
    * dedup viable as a continuous ingest process. At 100 TB the
    * shingle+minhash aggregation over the existing corpus is the
    * dominant cost and its result never changes; compute it once
    * ([[minhashSignatures]]), write it as a parquet table
    * (numHashes+1 longs per document — ~0.1% of the text), and each
    * new drop only shingles ITSELF, then bands against the stored
    * signatures. Complements [[graft.dedup.Incremental.dedupIncrement]]
    * (the exact-duplicate version of the same contract).
    *
    * Output: `(new_id, corpus_id, n_common_minhash, est_jaccard)` —
    * cross-side candidates only; within-batch pairs come from the
    * regular [[minhashLshPairs]] over the (small) batch. Ids must be
    * disjoint across the two frames (same id space, new ids unseen) —
    * a document present on both sides pairs with itself at estimate
    * 1.0, which the caller would misread as a fresh duplicate.
    *
    * The hot-bucket guard censuses the COMBINED bucket population: a
    * bucket pathological on either side (or only jointly) explodes
    * the cross join the same way, and the census input is band keys
    * only — signatures stay out of the shuffle until the one join
    * that needs them.
    */
  def minhashLshPairsAgainst(
      newSigs: DataFrame, corpusSigs: DataFrame,
      numHashes: Int = 16, bands: Int = 4, maxBucketSize: Int = 1000,
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val nb = bandedSignatures(newSigs, numHashes, bands)
    val cb = bandedSignatures(corpusSigs, numHashes, bands)
    // Int.MaxValue = guard disabled by contract: skip the census pass
    // (the bandJoinAgainstStore rule — gates whose oracles render no
    // guard pin it, so the two engines run the same contract)
    val (nbb, cbb) =
      if (maxBucketSize == Int.MaxValue) (nb, cb)
      else {
        val hot = nb.select(col("band"), col("bkey"))
          .unionByName(cb.select(col("band"), col("bkey")))
          .groupBy(col("band"), col("bkey"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxBucketSize)
          .select(col("band"), col("bkey"))
        (nb.join(broadcast(hot), Seq("band", "bkey"), "left_anti"),
          cb.join(broadcast(hot), Seq("band", "bkey"), "left_anti"))
      }
    val agree = (0 until numHashes)
      .map(j => when(col(s"sa.mh$j") === col(s"sb.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    nbb.as("sa")
      .join(cbb.as("sb"),
        col("sa.band") === col("sb.band") && col("sa.bkey") === col("sb.bkey"))
      .select(col("sa.id").as("new_id"), col("sb.id").as("corpus_id"),
        agree.as("n_common_minhash"),
        (agree.cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .dropDuplicates("new_id", "corpus_id")
  }

  /** Band join of an ALREADY-BANDED new side against the persisted
    * banded corpus store, with the hot-bucket guard censused on the
    * STORE side — the tail of
    * [[graft.streaming.Streams.minhashIncrStream]], factored out so
    * the stream door and the batch-equivalent ScaleTrend audit time
    * ONE body that can't drift. Differences vs
    * [[minhashLshPairsAgainst]]: the inputs arrive banded (the store's
    * persisted layout; a stream's map-side derivation), the census
    * reads only the store (the new side is bounded by its
    * batch/micro-batch), and cross-band duplicate pairs are NOT
    * deduped here (a streaming sink dedupes on read — consumers
    * project the pair key).
    *
    * Only the tiny blocklist broadcasts; the store side carries no
    * join-strategy hint (it is O(corpus × bands) rows) unless
    * `broadcastStore` — the dial for stores known to be small.
    */
  def bandJoinAgainstStore(
      newBanded: DataFrame, corpusBanded: DataFrame, numHashes: Int,
      maxBucketSize: Int = 1000, broadcastStore: Boolean = false,
  ): DataFrame = {
    // Int.MaxValue = guard disabled by contract (no bucket can exceed
    // it): skip the census entirely — a streaming caller would
    // otherwise pay a store-wide aggregation per micro-batch for an
    // always-empty blocklist
    val unguarded = maxBucketSize == Int.MaxValue
    // the census is a store-wide aggregation: materialize the tiny
    // blocklist ONCE, as a driver-local literal
    // ([[graft.ops.Skew.localBlocklist]] — it broadcasts downstream,
    // so the driver hop is already in its dataflow), so a streaming
    // caller's micro-batches re-broadcast a literal handful of rows
    // instead of re-aggregating the corpus-scale store per batch, and
    // a repeated BATCH caller leaks no storage (the r17 eager
    // localCheckpoint left one checkpointed RDD behind per call); the
    // anti-joins themselves are map-side broadcast filters and stay
    // lazy
    lazy val hot = graft.ops.Skew.localBlocklist(corpusBanded
      .groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucketSize)
      .select(col("band"), col("bkey")))
    def withGuard(side: DataFrame): DataFrame =
      if (unguarded) side
      else side.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
    val store0 = withGuard(corpusBanded)
    val store = if (broadcastStore) broadcast(store0) else store0
    val nbb = withGuard(newBanded)
    val agree = (0 until numHashes)
      .map(j => when(col(s"sa.mh$j") === col(s"sb.mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    nbb.as("sa")
      .join(store.as("sb"),
        col("sa.band") === col("sb.band") && col("sa.bkey") === col("sb.bkey"))
      .select(col("sa.id").as("new_id"), col("sb.id").as("corpus_id"),
        agree.as("n_common_minhash"),
        (agree.cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
  }

  // ---- SimHash -------------------------------------------------------

  /** Number of simhash bits (small enough that 2^b stays in a signed
    * 64-bit integer on every engine without overflow semantics).
    */
  val SimhashBits = 48

  /** Per-document SimHash over distinct whitespace tokens: bit b of
    * md5(token) votes ±1; the sign of the vote sum sets bit b of the
    * fingerprint. Pure two-stage aggregation (map-side combinable).
    *
    * The md5's top 48 bits are parsed ONCE per token into a long; each
    * vote is then a shift-and-mask (bit b of the old hex-nibble scheme
    * is bit 47−b of the parsed value — identical fingerprints, 48
    * integer ops instead of 48 substr+instr string ops per token).
    * Expressed identically in [[simhashSql]] for the oracle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), 1)).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 12), 16, 10).cast("long"))
    val contrib = (0 until SimhashBits).map { b =>
      ((shiftright(col("h"), 47 - b) % 2) * 2 - 1).as(s"c$b")
    }
    val voted = toks.select(col("id") +: contrib: _*)
      .groupBy(col("id"))
      .agg(sum(col("c0")).as("s0"),
        (1 until SimhashBits).map(b => sum(col(s"c$b")).as(s"s$b")): _*)
    val hash = (0 until SimhashBits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    voted.select(col("id"), hash.as("simhash"))
  }

  /** DuckDB rendering of [[simhash]] for table `documents(doc_id, text)`
    * restricted by `whereClause`.
    */
  def simhashSql(whereClause: String): String = {
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    val contrib = (0 until SimhashBits).map { b =>
      s"((((h >> ${47 - b}) % 2) * 2) - 1) AS c$b"
    }.mkString(",\n")
    val sums = (0 until SimhashBits).map(b => s"SUM(c$b) AS s$b").mkString(", ")
    val hash = (0 until SimhashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id AS id, CAST(('0x' || substr(md5(tok), 1, 12)) AS BIGINT) AS h FROM (
       |    SELECT doc_id, unnest(list_distinct($toks)) AS tok
       |    FROM documents $whereClause) t),
       |contrib AS (SELECT id,
       |$contrib
       |FROM toks),
       |voted AS (SELECT id, $sums FROM contrib GROUP BY id)
       |SELECT id, $hash AS simhash FROM voted""".stripMargin
  }

  /** Hamming distance between two simhash fingerprints. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pair search over a corpus: compute
    * [[simhash]] fingerprints, then delegate to
    * [[simhashNearDupPairsFromSignatures]].
    *
    * The default is EXACT (`maxBucketSize = 0`): by pigeonhole, every
    * pair within `maxHamming` is found. Opt into the hot-bucket
    * census (`maxBucketSize > 0`) at corpus scale, where
    * boilerplate-heavy data can hand one reducer a quadratic bucket —
    * the census trades those buckets' recall for bounded reducers,
    * so results become approximate.
    *
    * The fingerprint frame is persisted internally by default (the
    * tokenize+vote aggregation feeds the census and both self-join
    * sides; one materialized pass serves all of them) — pass
    * `persistSignatures = false` when reusing signatures across
    * calls: compute [[simhash]] once, persist it yourself, and call
    * the from-signatures variant directly.
    */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blocks: Int = 6, maxBucketSize: Int = 0,
      persistSignatures: Boolean = true,
  ): DataFrame =
    simhashNearDupPairsFromSignatures(
      simhash(df, idCol, textCol), maxHamming, blocks, maxBucketSize,
      persistSignatures)

  /** Near-dup pairs from precomputed simhash signatures `(id,
    * simhash)`: split the [[SimhashBits]]-bit fingerprint into
    * `blocks` equal bit-blocks and bucket each document under every
    * PAIR of blocks — C(blocks, 2) tables, each keyed on the 2·w-bit
    * concatenation of two block values (w = SimhashBits/blocks) —
    * then filter candidates by exact [[hammingDistance]] ≤
    * `maxHamming` (Manku et al.'s block-permutation construction,
    * specialized to block pairs).
    *
    * By pigeonhole the candidate step is *exact* whenever
    * `maxHamming ≤ blocks − 2` AND `maxBucketSize = 0` (the
    * default): each differing bit dirties at most one block, so ≤
    * maxHamming dirty blocks leave ≥ 2 clean blocks — and that clean
    * pair is a table where both fingerprints agree. The default
    * (3 ≤ 4) finds every qualifying pair. Setting `maxBucketSize > 0`
    * forfeits the guarantee for pairs whose every clean bucket is
    * hot. For larger Hamming radii raise `blocks` (e.g. maxHamming=4
    * → blocks=6 is rejected; use blocks=8 with 12-bit keys).
    *
    * Why pairs instead of single blocks: single-block keys are only
    * w bits wide (2^8 = 256 buckets at the defaults), so candidate
    * volume scales as ~n²·blocks/2^w regardless of corpus content — a
    * constant *fraction* of all pairs, catastrophic at corpus scale.
    * Block-pair keys are 2·w bits (65536 buckets): ~256× fewer chance
    * collisions for 2.5× more tables, turning the candidate set from
    * n²/43 to n²/4369 on uniform fingerprints — and real corpora are
    * additionally protected by the hot-bucket census.
    *
    * @param maxBucketSize skew guard (same broadcast-anti-join census
    *   as [[minhashLshPairs]]): (table, key) buckets larger than this
    *   are dropped entirely, so boilerplate-heavy corpora can't hand
    *   one reducer a quadratic bucket. 0 (the default) disables it —
    *   exact candidates; opt in at corpus scale where bounded
    *   reducers matter more than hot-bucket recall.
    */
  def simhashNearDupPairsFromSignatures(
      sh: DataFrame, maxHamming: Int = 3, blocks: Int = 6,
      maxBucketSize: Int = 0, persistSignatures: Boolean = false,
  ): DataFrame = {
    require(SimhashBits % blocks == 0, "blocks must divide SimhashBits")
    require(maxHamming <= blocks - 2,
      s"block-pair pigeonhole needs maxHamming <= blocks - 2 " +
        s"(got maxHamming=$maxHamming, blocks=$blocks); raise blocks")
    // default OFF here (unlike the corpus-level entry point): callers
    // of the from-signatures variant typically own the signature
    // frame's lifecycle already
    val shIn =
      if (persistSignatures)
        sh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sh
    val bounded = simhashBlockPairBuckets(shIn, blocks, maxBucketSize)
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.simhash"), col("b.simhash")).cast("int").as("hamming"))
      // filter BEFORE the dedup shuffle: the hamming verify is a
      // single XOR+popcount (unlike the cosine paths, where the
      // expensive verify runs after dedup), and a qualifying pair can
      // appear in up to C(blocks,2) buckets — filtering first shrinks
      // the distinct shuffle by the candidate rejection rate
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  /** The banded bucket rows behind
    * [[simhashNearDupPairsFromSignatures]] — `(id, simhash, tbl,
    * bkey)` with hot buckets dropped when `maxBucketSize > 0`.
    * Package-visible so specs can measure candidate volume directly.
    */
  private[graft] def simhashBlockPairBuckets(
      sh: DataFrame, blocks: Int, maxBucketSize: Int,
  ): DataFrame = {
    val w = SimhashBits / blocks
    def blk(b: Int): Column =
      shiftright(col("simhash"), b * w).bitwiseAND(lit((1L << w) - 1))
    val tableCols = (for { i <- 0 until blocks; j <- i + 1 until blocks }
      yield (i, j)).zipWithIndex.map { case ((i, j), t) =>
      struct(lit(t).as("tbl"), (blk(i) * lit(1L << w) + blk(j)).as("bkey"))
    }
    val buckets = sh
      .select(col("id"), col("simhash"), explode(array(tableCols: _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.tbl").as("tbl"), col("bb.bkey").as("bkey"))
    if (maxBucketSize <= 0) buckets
    else {
      val hot = buckets.groupBy(col("tbl"), col("bkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > maxBucketSize)
        .select(col("tbl"), col("bkey"))
      buckets.join(broadcast(hot), Seq("tbl", "bkey"), "left_anti")
    }
  }

  /** DuckDB rendering of [[simhashNearDupPairs]] over
    * `documents(doc_id, text)` restricted by `whereClause` (census
    * off — the oracle models the exact candidate construction). Block
    * PAIRS mirror the Spark side: C(blocks,2) tables keyed on the
    * 2·w-bit concatenation of the two block values; the table id
    * (i·blocks+j here vs a sequential index on the Spark side) never
    * reaches the output — any injective (i,j) labeling joins the
    * same rows.
    */
  def simhashPairsSql(
      maxHamming: Int, blocks: Int, whereClause: String,
  ): String = {
    val w = SimhashBits / blocks
    val pairsList = (for { i <- 0 until blocks; j <- i + 1 until blocks }
      yield s"($i, $j)").mkString(", ")
    s"""WITH sh AS (${simhashSql(whereClause)}),
       |buckets AS (SELECT id, simhash, t.i * $blocks + t.j AS tbl,
       |    ((simhash >> (t.i * $w)) % ${1L << w}) * ${1L << w}
       |      + ((simhash >> (t.j * $w)) % ${1L << w}) AS bkey
       |  FROM sh CROSS JOIN (VALUES $pairsList) t(i, j)),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |  FROM buckets a JOIN buckets b
       |  ON a.tbl = b.tbl AND a.bkey = b.bkey AND a.id < b.id)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB rendering of [[minhashLshPairs]] over
    * `documents(doc_id, text)` restricted by `whereClause`.
    */
  def minhashLshSql(numHashes: Int, bands: Int, whereClause: String): String = {
    val r = numHashes / bands
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    val mins = (0 until numHashes)
      .map(j => s"min((${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP) AS mh$j")
      .mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(mh${b * r + i} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")
    val agree = (0 until numHashes)
      .map(j => s"(CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, text FROM documents $whereClause),
       |toks0 AS (SELECT doc_id AS id, unnest(list_distinct($toks)) AS tok FROM docs),
       |toks AS (SELECT id,
       |    CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) AS h FROM toks0),
       |sig AS (SELECT id, $mins FROM toks GROUP BY id),
       |bands AS (
       |$bandSelects),
       |pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id)
       |SELECT id_a, id_b, ($agree) AS n_common_minhash,
       |  CAST(($agree) AS DOUBLE) / $numHashes.0 AS est_jaccard
       |FROM pairs JOIN sig sa ON id_a = sa.id JOIN sig sb ON id_b = sb.id
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** LSH RECALL AUDIT — the dedup twin of the ANN recall gates: on a
    * bounded slice, compute the exact word-set Jaccard ground truth
    * (pairs ≥ threshold, integer-micro comparison — no float
    * boundary ambiguity), run the banded MinHash candidate search on
    * the same slice (a pair qualifies when its signature agreement
    * reaches `ceil(threshold · numHashes)` — the integer form of the
    * unbiased Jaccard estimate), and report how much truth the
    * approximation finds. This is how `numHashes`/`bands` get TUNED:
    * run the audit on a sampled slice, read recall, then deploy the
    * config corpus-wide — the exact arm never runs at corpus scale
    * (its all-pairs shared-token join is the thing LSH exists to
    * avoid; the slice bound is the caller's contract, same stance as
    * the ANN recall gates' brute-force arm).
    *
    * Output one row: `(n_true, n_cand, n_found, recall_ppm)`.
    */
  def lshRecallAudit(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, threshold: Double,
      maxBucketSize: Int = 1000): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold out of (0, 1]")
    val thrMicro = math.floor(threshold * 1e6).toLong
    val minAgree = math.ceil(threshold * numHashes).toLong
    val toks = df.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), 1)).as("tok")).distinct()
    val sizes = toks.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val truth = toks.as("a")
      .join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("nc"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sa")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sb")), Seq("id_b"))
      .filter(expr(s"nc * 1000000L div (sa + sb - nc) >= ${thrMicro}L"))
      .select(col("id_a"), col("id_b"))
    val cand = minhashLshPairs(df, idCol, textCol, numHashes, bands,
      maxBucketSize)
      .filter(col("n_common_minhash") >= minAgree)
      .select(col("id_a"), col("id_b"))
    val found = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_true"), col("n_cand"), col("n_found"),
        expr("n_found * 1000000L div greatest(n_true, 1L)")
          .as("recall_ppm"))
  }

  /** DuckDB rendering of [[lshRecallAudit]] over
    * `documents(doc_id, text)` restricted by `whereClause`.
    */
  def lshRecallAuditSql(
      numHashes: Int, bands: Int, threshold: Double,
      whereClause: String): String = {
    val thrMicro = math.floor(threshold * 1e6).toLong
    val minAgree = math.ceil(threshold * numHashes).toLong
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    val r = numHashes / bands
    val mins = (0 until numHashes)
      .map(j => s"min((${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP) AS mh$j")
      .mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(mh${b * r + i} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")
    val agree = (0 until numHashes)
      .map(j => s"(CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs AS (SELECT doc_id, text FROM documents $whereClause),
       |toks0 AS (SELECT doc_id AS id,
       |    unnest(list_distinct($toks)) AS tok FROM docs),
       |sizes AS (SELECT id, count(*) AS sz FROM toks0 GROUP BY id),
       |truth AS MATERIALIZED (SELECT a.id AS id_a, b.id AS id_b
       |  FROM toks0 a JOIN toks0 b ON a.tok = b.tok AND a.id < b.id
       |  GROUP BY a.id, b.id
       |  HAVING count(*) * 1000000 //
       |    ((SELECT sz FROM sizes WHERE id = a.id) +
       |     (SELECT sz FROM sizes WHERE id = b.id) - count(*))
       |    >= $thrMicro),
       |toks AS (SELECT id,
       |    CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) AS h FROM toks0),
       |sig AS (SELECT id, $mins FROM toks GROUP BY id),
       |bands AS (
       |$bandSelects),
       |cpairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.bkey = b.bkey AND a.id < b.id),
       |cand AS MATERIALIZED (SELECT id_a, id_b FROM cpairs
       |  JOIN sig sa ON id_a = sa.id JOIN sig sb ON id_b = sb.id
       |  WHERE ($agree) >= $minAgree),
       |f AS (SELECT count(*) AS n_found FROM truth
       |  WHERE EXISTS (SELECT 1 FROM cand
       |    WHERE cand.id_a = truth.id_a AND cand.id_b = truth.id_b))
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
       |  CAST(n_found AS BIGINT) AS n_found,
       |  CAST(n_found * 1000000 //
       |    greatest((SELECT count(*) FROM truth), 1) AS BIGINT)
       |    AS recall_ppm
       |FROM f""".stripMargin
  }

  /** LSH CAPACITY PLANNING — the bucket-size histogram computed
    * BEFORE any pair join runs: per band, how many buckets hold 1, 2,
    * 3… documents, and how many candidate pairs (`n_buckets · C(sz,
    * 2)`) each size class would emit. The histogram prices the LSH
    * join from a census-sized pass — at 100 TB you read this, not the
    * pair explosion, to pick `bands`/`numHashes`/`maxBucketSize`: a
    * heavy tail here is the hot-bucket warning the skew guard exists
    * for, and Σ cand_pairs is the exact shuffle volume the pair join
    * would pay (before the cap and cross-band dedup).
    *
    * Scale shape: signatures (one shingle census) → band keys
    * (map-only explode) → bucket sizes (keyed count) → size census
    * (keyed count) — strictly smaller at every step; output is
    * bands × distinct-sizes, metadata scale.
    *
    * Output: `(band, sz, n_buckets, cand_pairs)`.
    */
  def lshBucketHistogram(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, numHashes)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|",
          (0 until r).map(i => col(s"mh${b * r + i}").cast("string")): _*))
          .as("bkey"))
    }
    val buckets = sig
      .select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    buckets.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band"), col("sz"))
      .agg(count(lit(1)).as("n_buckets"))
      .withColumn("cand_pairs",
        expr("n_buckets * ((sz * (sz - 1)) div 2)"))
  }

  /** DuckDB rendering of [[lshBucketHistogram]] over
    * `documents(doc_id, text)` restricted by `whereClause`.
    */
  def lshBucketHistogramSql(
      numHashes: Int, bands: Int, whereClause: String): String = {
    val r = numHashes / bands
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    val mins = (0 until numHashes)
      .map(j => s"min((${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP) AS mh$j")
      .mkString(", ")
    val bandSelects = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(mh${b * r + i} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bkey FROM sig"
    }.mkString("\nUNION ALL\n")
    s"""WITH docs AS (SELECT doc_id, text FROM documents $whereClause),
       |toks0 AS (SELECT doc_id AS id, unnest(list_distinct($toks)) AS tok FROM docs),
       |toks AS (SELECT id,
       |    CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) AS h FROM toks0),
       |sig AS (SELECT id, $mins FROM toks GROUP BY id),
       |bands AS (
       |$bandSelects),
       |bs AS (SELECT band, bkey, CAST(count(*) AS BIGINT) AS sz
       |  FROM bands GROUP BY band, bkey)
       |SELECT band, sz, CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(count(*) * ((sz * (sz - 1)) // 2) AS BIGINT) AS cand_pairs
       |FROM bs GROUP BY band, sz
       |ORDER BY band, sz""".stripMargin
  }

  /** DuckDB rendering of [[minhashLshPairsAgainst]] over
    * `documents(doc_id, text)`: new batch = rows matching `whereNew`,
    * corpus = rows matching `whereCorpus` (full `WHERE ...` clauses).
    * Unlike [[minhashLshSql]] (whose gate slice keeps every bucket
    * under the cap), this oracle DOES model the hot-bucket drop —
    * the 50% corpus slice crosses the cap at sf0.1, so the guard
    * itself sits under the gate exactly where it fires: the census
    * counts the COMBINED (new ∪ corpus) bucket population and both
    * sides anti-join it, mirroring [[minhashLshPairsAgainst]].
    */
  def minhashLshIncrementalSql(
      numHashes: Int, bands: Int,
      whereNew: String, whereCorpus: String,
      maxBucketSize: Int = 1000): String = {
    val r = numHashes / bands
    val toks = TextFunctions.tokensSql.replace("TXT", "text")
    val mins = (0 until numHashes)
      .map(j => s"min((${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP) AS mh$j")
      .mkString(", ")
    def bandSelects(sig: String) = (0 until bands).map { b =>
      val key = (0 until r).map(i => s"CAST(mh${b * r + i} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT id, $b AS band, md5($key) AS bkey FROM $sig"
    }.mkString("\nUNION ALL\n")
    val agree = (0 until numHashes)
      .map(j => s"(CASE WHEN sa.mh$j = sb.mh$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH newd AS (SELECT doc_id, text FROM documents $whereNew),
       |corpd AS (SELECT doc_id, text FROM documents $whereCorpus),
       |ntoks AS (SELECT id, CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) AS h
       |  FROM (SELECT doc_id AS id, unnest(list_distinct($toks)) AS tok FROM newd)),
       |ctoks AS (SELECT id, CAST(('0x' || substr(md5(tok), 1, 7)) AS BIGINT) AS h
       |  FROM (SELECT doc_id AS id, unnest(list_distinct($toks)) AS tok FROM corpd)),
       |nsig AS (SELECT id, $mins FROM ntoks GROUP BY id),
       |csig AS (SELECT id, $mins FROM ctoks GROUP BY id),
       |nbands AS (
       |${bandSelects("nsig")}),
       |cbands AS (
       |${bandSelects("csig")}),
       |hot AS (SELECT band, bkey FROM (
       |  SELECT band, bkey, COUNT(*) AS n FROM (
       |    SELECT band, bkey FROM nbands
       |    UNION ALL SELECT band, bkey FROM cbands)
       |  GROUP BY band, bkey) WHERE n > $maxBucketSize),
       |nb2 AS (SELECT * FROM nbands WHERE NOT EXISTS (
       |  SELECT 1 FROM hot WHERE hot.band = nbands.band AND hot.bkey = nbands.bkey)),
       |cb2 AS (SELECT * FROM cbands WHERE NOT EXISTS (
       |  SELECT 1 FROM hot WHERE hot.band = cbands.band AND hot.bkey = cbands.bkey)),
       |pairs AS (SELECT DISTINCT a.id AS new_id, b.id AS corpus_id
       |  FROM nb2 a JOIN cb2 b ON a.band = b.band AND a.bkey = b.bkey)
       |SELECT new_id, corpus_id, ($agree) AS n_common_minhash,
       |  CAST(($agree) AS DOUBLE) / $numHashes.0 AS est_jaccard
       |FROM pairs JOIN nsig sa ON new_id = sa.id JOIN csig sb ON corpus_id = sb.id
       |ORDER BY new_id, corpus_id""".stripMargin
  }

  /** Connected components over an undirected near-dup pair list:
    * every document gets the MINIMUM doc id reachable through the
    * pair graph as its `cluster` label — the step that turns any of
    * the pair finders ([[minhashLshPairs]], [[simhashNearDupPairs]],
    * [[Dedup.ngramJaccardPairs]], cosine pairs) into an actual
    * deduped corpus: keep one doc per cluster, drop the rest.
    *
    * Algorithm: min-label propagation with POINTER JUMPING — each
    * round a node takes the min of its own and its neighbors' labels
    * (one-hop flood), then jumps to its label's label
    * (label ← label(label), doubling the effective propagation
    * distance), so convergence takes O(log diameter) rounds instead
    * of O(diameter) — long near-dup chains (transitive hamming links)
    * would otherwise need a round per hop. The invariant holds
    * throughout: a node's label is always an id inside its own
    * component, so the fixpoint labels every node with the component
    * minimum. Each round is three shuffles (neighbor join,
    * groupBy-min, jump join); the round's starting label is carried
    * through to the checkpointed output so convergence detection is a
    * filter-count over blocks already in memory, not a fourth join.
    * Each round's labels are `localCheckpoint`ed — without truncation
    * the logical plan nests every prior round's joins and Catalyst
    * analysis time grows superlinearly with iterations (the classic
    * iterative-DataFrame trap; on a cluster use `checkpoint` with a
    * checkpoint dir for fault tolerance instead).
    *
    * Below `driverThresholdEdges` the labeling is computed by
    * union-find on the driver instead (identical min-id results, one
    * action + one parallelize): the pair list is the OUTPUT of a
    * near-dup finder — tiny relative to the corpus — and iterative
    * scheduler round-trips dwarf the actual work at that size. The
    * distributed path exists for the genuinely huge graphs and is
    * forced in specs via `driverThresholdEdges = 0`.
    *
    * Deterministic (min over ids) and oracle-expressible as a
    * recursive CTE ([[connectedComponentsSql]]). Throws if `maxIter`
    * rounds don't converge — a partial labeling is NOT a valid
    * clustering.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String, maxIter: Int = 25,
      driverThresholdEdges: Long = 1000000L,
  ): DataFrame = {
    // symmetric closure via explode — ONE pass over the (potentially
    // expensive) pair lineage, not a self-union's two. Ids are cast to
    // long up front so both paths accept any integral id column.
    val edges = pairs.select(explode(array(
      struct(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst")),
      struct(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst"))))
      .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct().persist()

    // Size-gated hybrid: near-dup pair lists are usually tiny relative
    // to the corpus (the expensive part was FINDING them), and each
    // distributed round costs several scheduler round-trips. Below the
    // threshold — counted in DIRECTED edges, i.e. 2× the pair count —
    // union-find on the driver computes the identical min-id labeling
    // in one action + one parallelize: 1M edges ≈ tens of MB on the
    // driver, far below the all-pairs the finder itself already
    // avoided. Above it, the distributed path below takes over.
    // (Why not graphx.lib.ConnectedComponents: this library is
    // DataFrame-only by design — no RDD boundary in operator
    // lineage — and the labeling must stay oracle-reproducible.)
    val edgeCount = edges.count()
    if (edgeCount <= driverThresholdEdges) {
      import pairs.sparkSession.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist()
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return parent.keys.toSeq.sorted.map(id => (id, find(id)))
        .toDF("id", "cluster")
    }

    // the flood join streams edges against the round's labels keyed
    // dst = id every round: pre-partitioning the persisted edge list
    // by dst makes that side exchange-free for the whole loop (one
    // shuffle paid once instead of per round — it only matters in the
    // sort-merge regime at genuine graph scale; locally the label
    // side broadcasts and the edge side never shuffles either way)
    val edgesByDst = edges.repartition(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the init IS the first flood, fused: every node starts at
    // least(own id, min neighbor id) — one aggregate over the edge
    // list, exactly what a first loop round's flood would compute
    // from identity labels, minus that round's jump/persist/checkpoint
    // machinery (the label trajectory differs from identity-init by
    // one round's head start; the fixpoint — and the emitted
    // labeling — is the identical component minimum)
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("src").as("id"),
        least(col("src"), col("nbr")).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edgesByDst.join(labels.select(col("id"), col("label")),
        col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_label"))
      // materialized so the pointer-jump self-joins read it instead of
      // re-evaluating the flood join per reference. The round's
      // STARTING label rides along as old_label, so convergence
      // detection needs no extra join (and — below — no extra JOB).
      val flooded = labels.as("l")
        .join(nbrMin, col("l.id") === col("src"), "left")
        .select(col("l.id").as("id"), col("l.label").as("old_label"),
          least(col("l.label"), coalesce(col("nbr_label"), col("l.label")))
            .as("label"))
        .persist()
      // pointer jump: label <- label(label); labels are always node
      // ids of the same component, so the join hits and stays inside
      // it. ONE jump per round — a second jump over the same round
      // mapping was measured a no-op here (identical changed-counts
      // every round): jumping shortcuts label CHAINS, but round count
      // is bounded by flood propagation through the graph, which a
      // deeper jump cannot accelerate.
      val jumped = flooded.as("f")
        .join(flooded.select(col("id").as("jid"), col("label").as("jlabel")),
          col("f.label") === col("jid"), "left")
        .select(col("f.id").as("id"),
          coalesce(col("jlabel"), col("f.label")).as("label"),
          col("f.old_label").as("old_label"))
      // convergence is OBSERVED on the checkpoint action itself
      // (CollectMetrics): the old filter-count was a whole extra job —
      // cheap in task time, but one more scheduler/planning round-trip
      // per iteration of a loop whose cost is round-trips
      val conv = org.apache.spark.sql.Observation()
      val next = jumped
        .observe(conv, sum(when(col("label") =!= col("old_label"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint() // truncate lineage: constant-size plans per round
      val changed = conv.get.get("changed").flatMap(Option(_)) match {
        case Some(n: Number) => n.longValue()
        case _ => 0L // no rows observed => nothing changed
      }
      flooded.unpersist()
      labels.unpersist() // drop the previous round's checkpoint blocks
      labels = next
      converged = changed == 0
      i += 1
    }
    edgesByDst.unpersist()
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (budget ~ log2 of the longest chain, PLUS one " +
        "final no-change round to observe convergence)")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** The shared recursive-CTE prelude behind [[connectedComponentsSql]]
    * and [[dedupApplySql]]: defines `cc(id, cluster)` over `pairsSql`.
    */
  private[graft] def ccCtes(pairsSql: String): String =
    s"""WITH RECURSIVE p AS ($pairsSql),
       |nodes AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM p
       |  UNION SELECT id_b, id_a FROM p),
       |reach(id, root) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id),
       |cc AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id)""".stripMargin

  /** DuckDB rendering of [[connectedComponents]] over a pair query
    * `pairsSql` producing columns (id_a, id_b, ...): recursive
    * reachability, then min reachable id per node.
    */
  def connectedComponentsSql(pairsSql: String): String =
    s"""${ccCtes(pairsSql)}
       |SELECT id, cluster FROM cc ORDER BY id""".stripMargin

  /** The last step of the dedup pipeline: drop every document that is
    * a NON-CANONICAL member of a near-dup cluster, keeping the
    * canonical one (and every document that appears in no pair).
    * `clusters` is the output of [[connectedComponents]] —
    * `(id, cluster)` with `cluster` = min member id — so a document
    * is canonical exactly when `id === cluster`, and the drop set is
    * one projection of the label frame.
    *
    * 100 TB shape: a single anti-join of the corpus against the drop
    * set on document id. Near-dup clusters are a small fraction of a
    * real corpus, so the drop list is orders of magnitude smaller
    * than the corpus and AQE turns this into a broadcast anti-join —
    * the corpus itself is never shuffled. (If dups somehow approach
    * corpus scale, the join degrades gracefully to a shuffle on id.)
    */
  def dedupApply(
      df: DataFrame, idCol: String, clusters: DataFrame,
  ): DataFrame = {
    require(!df.columns.contains("__drop_id"),
      "dedupApply reserves the column name __drop_id; rename it on the input")
    val dups = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as("__drop_id"))
    df.join(dups, df(idCol) === col("__drop_id"), "left_anti")
  }

  /** Quality-aware [[dedupApply]]: per cluster keep the member with
    * the HIGHEST `qualityCol` (ties to the smallest id), not the
    * smallest id — the selection real pipelines run (near-dup
    * families keep their longest/cleanest member; min-id keeps
    * whichever copy was crawled first). `clusters` is the
    * `(id, cluster)` frame from [[connectedComponents]].
    *
    * Scale shape: quality joins onto the CLUSTER frame (pair-derived,
    * ≪ corpus); the per-cluster argmax is one `max(struct)` aggregate
    * with map-side partials; the corpus sees only the final
    * broadcast-able anti-join of dropped ids — same topology as
    * [[dedupApply]] plus one cluster-keyed aggregate.
    */
  def dedupApplyBest(
      df: DataFrame, idCol: String, clusters: DataFrame,
      qualityCol: Column,
  ): DataFrame = {
    Seq("__drop_id", "__q", "__best").foreach(c =>
      require(!df.columns.contains(c),
        s"dedupApplyBest reserves the column name $c; rename it on the input"))
    val quality = df.select(col(idCol).as("id"), qualityCol.as("__q"))
    val members = clusters.join(quality, Seq("id"))
    val best = members.groupBy(col("cluster"))
      .agg(max(struct(col("__q").as("q"), (-col("id")).as("nid"))).as("__best"))
      .select(col("cluster"), (-col("__best").getField("nid")).as("__best"))
    val dups = members.join(best, Seq("cluster"))
      .filter(col("id") =!= col("__best"))
      .select(col("id").as("__drop_id"))
    df.join(dups, df(idCol) === col("__drop_id"), "left_anti")
  }

  /** DuckDB rendering of the [[dedupApplyBest]] survivors over
    * `documents(doc_id, text)` with `length(text)` as the quality —
    * same CTE core as [[dedupApplySql]].
    */
  def dedupApplyBestSql(pairsSql: String, whereClause: String): String = {
    val keep = "doc_id NOT IN (SELECT id FROM dups)"
    val where =
      if (whereClause.trim.isEmpty) s"WHERE $keep"
      else s"$whereClause\n  AND $keep"
    s"""${ccCtes(pairsSql)},
       |memq AS (SELECT cc.id, cc.cluster, length(d.text) AS q
       |  FROM cc JOIN documents d ON cc.id = d.doc_id),
       |rk AS (SELECT id, row_number() OVER (PARTITION BY cluster
       |    ORDER BY q DESC, id) AS rn FROM memq),
       |dups AS (SELECT id FROM rk WHERE rn > 1)
       |SELECT doc_id, CAST(length(text) AS INT) AS n_chars
       |FROM documents $where
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB rendering of the [[dedupApply]] survivors over
    * `documents(doc_id, text)` restricted by `whereClause` (a full
    * `WHERE ...` clause, or "" for the whole corpus), with clusters
    * from `pairsSql` (same recursive-CTE core as
    * [[connectedComponentsSql]]). Output `(doc_id, n_chars)`.
    */
  def dedupApplySql(pairsSql: String, whereClause: String): String = {
    val keep = "doc_id NOT IN (SELECT id FROM dups)"
    val where =
      if (whereClause.trim.isEmpty) s"WHERE $keep"
      else s"$whereClause\n  AND $keep"
    s"""${ccCtes(pairsSql)},
       |dups AS (SELECT id FROM cc WHERE id <> cluster)
       |SELECT doc_id, CAST(length(text) AS INT) AS n_chars
       |FROM documents $where
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB rendering of [[ngramJaccardPairs]] over
    * `documents(doc_id, text)` restricted by `whereClause`.
    */
  def ngramJaccardSql(n: Int, threshold: Double, whereClause: String): String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents $whereClause),
       |grams AS (SELECT DISTINCT id, gram FROM (
       |  SELECT doc_id AS id, unnest(list_transform(
       |    range(1, greatest(length(text) - ${n - 1}, 1) + 1),
       |    i -> substr(text, CAST(i AS INT), $n))) AS gram
       |  FROM docs) g WHERE length(gram) = $n),
       |sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
       |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |  CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) AS jaccard
       |FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
       |WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz + sb.sz - n_common AS DOUBLE) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** DuckDB rendering of [[ngramContainmentPairs]] over
    * `documents(doc_id, text)` restricted by `whereClause` (stop-gram
    * guard disabled, matching `maxGramDocs = 0`).
    */
  def ngramContainmentSql(
      n: Int, threshold: Double, whereClause: String): String =
    s"""WITH docs AS (SELECT doc_id, text FROM documents $whereClause),
       |grams AS (SELECT DISTINCT id, gram FROM (
       |  SELECT doc_id AS id, unnest(list_transform(
       |    range(1, greatest(length(text) - ${n - 1}, 1) + 1),
       |    i -> substr(text, CAST(i AS INT), $n))) AS gram
       |  FROM docs) g WHERE length(gram) = $n),
       |sizes AS (SELECT id, count(*) AS sz FROM grams GROUP BY id),
       |inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
       |  FROM grams a JOIN grams b ON a.gram = b.gram AND a.id < b.id GROUP BY 1, 2)
       |SELECT id_a, id_b, n_common,
       |  CAST(n_common AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS cont_a_in_b,
       |  CAST(n_common AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS cont_b_in_a
       |FROM inter JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
       |WHERE CAST(n_common AS DOUBLE) / CAST(sa.sz AS DOUBLE) >= $threshold
       |OR CAST(n_common AS DOUBLE) / CAST(sb.sz AS DOUBLE) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
}
