package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.Streams.EventRow

/** Structured Streaming specs driven through MemoryStream: windowed
  * aggregation with watermark/late-data semantics and stateful
  * gap-sessionization.
  */
class StreamsSpec extends AnyFunSuite with SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private def ev(id: Long, user: Long, minutes: Long, value: Double = 1.0) =
    EventRow(id, ts(minutes), user, "click", value, "{}")

  test("hourly windowed aggregation over a stream") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.hourlyEventCounts(input.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      input.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 70))
      query.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[Timestamp]("hour"), r.getAs[Long]("n_events"))).toSeq
      // window starts are clock-hour aligned, not event aligned
      val hourBase = new Timestamp(1699999200000L) // ts(0) truncated to hour
      val nextHour = new Timestamp(1699999200000L + 3600000L)
      assert(rows.toSet == Set((hourBase, 2L), (nextHour, 1L)))
    } finally query.stop()
  }

  test("sliding windowed counts: each event lands in exactly two overlapping windows") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.slidingEventCounts(input.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      input.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 70))
      query.processAllAvailable()
      val rows = spark.table("sliding").collect()
        .map(r => (r.getAs[Timestamp]("win_start"), r.getAs[Long]("n_events")))
      val h = 1699999200000L // ts(0) truncated to hour
      def t0(ms: Long) = new Timestamp(ms)
      // events at minutes 0/10 -> windows [h-1h, h+1h) and [h, h+2h);
      // minute 70 -> [h, h+2h) and [h+1h, h+3h)
      assert(rows.toSet == Set(
        (t0(h - 3600000L), 2L), (t0(h), 3L), (t0(h + 3600000L), 1L)))
    } finally query.stop()
  }

  test("sessionizeNative equals the state-machine sessionizer's summaries") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.sessionizeNative(input.toDF(), gapMinutes = 60,
      watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_native")
      .outputMode("append").start()
    try {
      // user 1: two sessions (gap 100 min > 60); user 2: one event
      input.addData(ev(1, 1, 0), ev(2, 1, 30), ev(3, 1, 130), ev(4, 2, 10))
      // far-future row advances the watermark so all sessions finalize
      input.addData(ev(99, 9, 10000))
      query.processAllAvailable()
      val rows = spark.table("sess_native").collect()
        .filter(_.getAs[Long]("user_id") < 9)
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start"), r.getAs[Timestamp]("session_end"),
          r.getAs[Long]("n_events"))).toSet
      assert(rows == Set(
        (1L, ts(0), ts(30), 2L), (1L, ts(130), ts(130), 1L),
        (2L, ts(10), ts(10), 1L)))
    } finally query.stop()
  }

  test("encodeStatsStream equals batch encodeStats per document (stream-static vocab join)") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // train a segmentation on a tiny offline corpus (the static side)
    val corpus = Seq.tabulate(20)(i => (i.toLong, "hug pug hugs hug"))
      .toDF("doc_id", "text")
    val (_, seg) = graft.text.Bpe.train(
      graft.text.Bpe.wordCensus(corpus, "text"), numMerges = 3)
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streams.encodeStatsStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", seg)
      .writeStream.format("memory").queryName("enc_stream")
      .outputMode("complete").start()
    try {
      val docs = Seq((1L, ts(0), "hug pug zebra"), (2L, ts(5), "hugs hugs"),
        (3L, ts(70), "pug unknownword hug"))
      input.addData(docs.take(2): _*)
      input.addData(docs.drop(2): _*)
      query.processAllAvailable()
      val got = spark.table("enc_stream").collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("n_subwords"), r.getAs[Long]("n_oov"))).toMap
      val want = graft.text.Bpe.encodeStats(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text", seg)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("n_subwords"), r.getAs[Long]("n_oov"))).toMap
      assert(got == want, s"stream $got != batch $want")
      assert(want.values.map(_._2).sum > 0, "no OOV exercised — weak fixture")
    } finally query.stop()
  }

  test("minhashIncrStream candidate pairs equal the batch minhashLshPairsAgainst") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    // a persisted corpus store with a planted near-dup of doc 1
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "entirely different words about spark streaming"),
      (12L, "the quick brown fox jumps over a lazy dog"))
      .toDF("doc_id", "text")
    val corpusBanded = Dedup.bandedSignatures(
      Dedup.minhashSignatures(corpus, "doc_id", "text", 16), 16, 4)
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streams.minhashIncrStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      corpusBanded, numHashes = 16, bands = 4, watermark = "0 seconds")
      .writeStream.format("memory").queryName("mh_stream")
      .outputMode("append").start()
    try {
      val arrivals = Seq(
        (1L, ts(0), "the quick brown fox jumps over the lazy dog"),
        (2L, ts(5), "no shingles shared with anything here at all"))
      input.addData(arrivals: _*)
      // two far-future sentinels: the first advances the watermark
      // past the data windows, the second runs the batch in which
      // they finalize (the Replay two-sentinel device); sentinel
      // shingles are unique tokens and collide with nothing
      input.addData((-1L, ts(100000), "sentinelonly uniquetok"))
      input.addData((-2L, ts(200000), "sentineltwo othertok"))
      query.processAllAvailable()
      val got = spark.table("mh_stream")
        .filter(col("new_id") >= 0)
        .select("new_id", "corpus_id", "n_common_minhash", "est_jaccard")
        .distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
      val want = Dedup.minhashLshPairsAgainst(
        Dedup.minhashSignatures(
          arrivals.toDF("doc_id", "ts", "text"), "doc_id", "text", 16),
        Dedup.minhashSignatures(corpus, "doc_id", "text", 16),
        numHashes = 16, bands = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
      assert(got == want, s"stream $got != batch $want")
      assert(want.exists(p => p._1 == 1L && p._2 == 10L),
        "planted exact dup not found — weak fixture")
    } finally query.stop()
  }

  test("minhashIncrStream hot-bucket guard blocks pathological store buckets") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import graft.dedup.Dedup
    // three IDENTICAL store docs share every band bucket (width 3);
    // with maxBucketSize = 2 those buckets are hot and must be
    // blocklisted on BOTH sides, so the arriving identical doc pairs
    // with nothing — while the distinct pair (20/21) still pairs
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "alpha beta gamma delta epsilon zeta"),
      (20L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpusBanded = Dedup.bandedSignatures(
      Dedup.minhashSignatures(corpus, "doc_id", "text", 16), 16, 4)
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streams.minhashIncrStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text",
      corpusBanded, numHashes = 16, bands = 4, watermark = "0 seconds",
      maxBucketSize = 2)
      .writeStream.format("memory").queryName("mh_hot_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), "alpha beta gamma delta epsilon zeta"),
        (2L, ts(5), "the quick brown fox jumps over a lazy dog"))
      input.addData((-1L, ts(100000), "sentinelonly uniquetok"))
      input.addData((-2L, ts(200000), "sentineltwo othertok"))
      query.processAllAvailable()
      val got = spark.table("mh_hot_stream")
        .filter(col("new_id") >= 0)
        .select("new_id", "corpus_id").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.exists(_._1 == 1L),
        s"hot-bucket doc 1 still paired: $got — store-side guard inert")
      assert(got.exists(p => p._1 == 2L && p._2 == 20L),
        s"cold-bucket near-dup (2,20) lost: $got — guard over-blocks")
      // and the guard result equals the batch twin censused the same way
      val want = Dedup.minhashLshPairsAgainst(
        Dedup.minhashSignatures(
          Seq((1L, "alpha beta gamma delta epsilon zeta"),
            (2L, "the quick brown fox jumps over a lazy dog"))
            .toDF("doc_id", "text"), "doc_id", "text", 16),
        Dedup.minhashSignatures(corpus, "doc_id", "text", 16),
        numHashes = 16, bands = 4, maxBucketSize = 2)
        .select("new_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch censuses the COMBINED population, stream censuses the
      // store; on this fixture the hot set is store-driven, so the
      // two guards must agree exactly
      assert(got == want, s"stream $got != batch $want")
    } finally query.stop()
  }

  test("semDedupIncrStream: arriving twins surface their same-cell store partners") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import graft.ann.Ann
    // four well-separated axis vectors: every twin's ONLY >= 0.9
    // partner is its own source
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
    val corpus = (0 until 4).map(i => (i.toLong * 10, axis(i * 3)))
      .toDF("vec_id", "embedding")
    val cents = Ann.lloydCentroids(corpus, "vec_id", "embedding",
      nCells = 4).localCheckpoint(true)
    val store = Ann.lloydAssigned(corpus, "vec_id", "embedding", cents)
      .localCheckpoint(true)
    val input = MemoryStream[(Long, Seq[Double])]
    val query = Streams.semDedupIncrStream(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, store, threshold = 0.9)
      .writeStream.format("memory").queryName("sd_stream")
      .outputMode("append").start()
    try {
      input.addData((0 until 4).map(i =>
        (i.toLong * 10 + 1000000L, axis(i * 3).updated(1, 0.01))): _*)
      query.processAllAvailable()
      val got = spark.table("sd_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (0 until 4).map(i => (i.toLong * 10 + 1000000L, i.toLong * 10)).toSet
      assert(got == want, s"stream $got != planted $want")
      // and the stream body equals the batch composition exactly
      // (same shared tail — the pin is that STREAM execution through
      // the engine changes nothing)
      val batch = Ann.semDedupPairsAgainstStore(
        Ann.lloydAssigned(
          (0 until 4).map(i => (i.toLong * 10 + 1000000L,
            axis(i * 3).updated(1, 0.01))).toDF("vec_id", "embedding"),
          "vec_id", "embedding", cents),
        store, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally query.stop()
  }

  test("semDedupIncrStream hot-cell guard blocks the degenerate store cell — stream equals batch at the same dial") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import graft.ann.Ann
    // identical vectors always share an argmax cell, so the trio's
    // cell is deterministically hot at maxCellSize = 2 and the pair's
    // cell deterministically cold (the AnnSpec planting)
    def axis(i: Int): Seq[Double] =
      Seq.tabulate(64)(d => if (d == i) 1.0 else 0.0)
    val corpus = Seq(
      (10L, axis(0)), (11L, axis(0)), (12L, axis(0)),
      (20L, axis(9)), (21L, axis(9)))
      .toDF("vec_id", "embedding")
    val cents = Ann.lloydCentroids(corpus, "vec_id", "embedding",
      nCells = 4).localCheckpoint(true)
    val store = Ann.lloydAssigned(corpus, "vec_id", "embedding", cents)
      .localCheckpoint(true)
    val arrivals = Seq(
      (1000010L, axis(0).updated(1, 0.01)),  // twin of the hot trio
      (1000020L, axis(9).updated(1, 0.01)))  // twin of the cold pair
    val input = MemoryStream[(Long, Seq[Double])]
    val query = Streams.semDedupIncrStream(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, store, threshold = 0.9, maxCellSize = 2)
      .writeStream.format("memory").queryName("sd_hot_stream")
      .outputMode("append").start()
    try {
      input.addData(arrivals: _*)
      query.processAllAvailable()
      val got = spark.table("sd_hot_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.exists(_._1 == 1000010L),
        s"hot-cell arrival still paired: $got — store-side guard inert")
      assert(got == Set((1000020L, 20L), (1000020L, 21L)),
        s"cold-cell pairs wrong: $got — guard over-blocks")
      // guard parity with the batch twin at the SAME dial: the shared
      // tail means stream execution through the engine changes nothing
      val batch = Ann.semDedupPairsAgainstStore(
        Ann.lloydAssigned(arrivals.toDF("vec_id", "embedding"),
          "vec_id", "embedding", cents),
        store, threshold = 0.9, maxCellSize = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      // and the fixture is non-vacuous: unguarded, the hot trio pairs
      val unguarded = Ann.semDedupPairsAgainstStore(
        Ann.lloydAssigned(arrivals.toDF("vec_id", "embedding"),
          "vec_id", "embedding", cents),
        store, threshold = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(unguarded.exists(_._1 == 1000010L),
        "unguarded baseline never pairs the trio — planting broke")
    } finally query.stop()
  }

  test("surpriseStream equals batch surpriseScore per document (stream-static census join)") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // train the bigram censuses on a tiny offline reference (static side)
    val reference = Seq((100L, "the cat sat on the mat"), (101L, "the cat ran"))
      .toDF("doc_id", "text")
    val (uni, bi, v) = graft.text.Lm.referenceCensus(reference, "text")
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streams.surpriseStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text", uni, bi, v)
      .writeStream.format("memory").queryName("lm_stream")
      .outputMode("complete").start()
    try {
      val docs = Seq((1L, ts(0), "the cat sat up"), (2L, ts(5), "zz qq"),
        (3L, ts(70), "tiny"), (4L, ts(75), "the cat ran on the mat"))
      input.addData(docs.take(2): _*)
      input.addData(docs.drop(2): _*)
      query.processAllAvailable()
      val got = spark.table("lm_stream").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Int]("n_grams"), r.getAs[Long]("surprise_micro")))).toMap
      val want = graft.text.Lm.surpriseScoreAgainst(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text", uni, bi, v)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("n_grams"), r.getAs[Long]("surprise_micro")))).toMap
      assert(got == want, s"stream $got != batch $want")
      assert(want(2L)._2 > 0, "unseen-token path not exercised — weak fixture")
      assert(want(3L) === ((0, 0L)), "sub-bigram doc must report zero")
    } finally query.stop()
  }

  test("classifierStream equals batch HashedClassifier.score per document") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, String)]
    val query = Streams.classifierStream(
      input.toDF().toDF("doc_id", "ts", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("clf_stream")
      .outputMode("complete").start()
    try {
      val docs = Seq((1L, ts(0), "the quick brown fox"), (2L, ts(5), "solo"),
        (3L, ts(70), "hash join stream window agg"))
      input.addData(docs.take(2): _*)
      input.addData(docs.drop(2): _*)
      query.processAllAvailable()
      val got = spark.table("clf_stream").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("w_sum"),
            r.getAs[Double]("score")))).toMap
      val want = graft.text.HashedClassifier.score(
        docs.toDF("doc_id", "ts", "text"), "doc_id", "text")
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("w_sum"),
            r.getAs[Double]("score")))).toMap
      assert(got == want, s"stream $got != batch $want")
    } finally query.stop()
  }

  test("streaming HLL registers equal the batch registers after every micro-batch") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    // complete mode with no watermark is SAFE: ≤256 register cells by
    // construction, and per-bucket max is duplicate-blind + monotone
    val query = Streams.hllRegistersStream(input.toDF(), "user_id")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    def streamRegs() = spark.table("hll_stream").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def batchRegs(rows: Seq[EventRow]) =
      graft.ops.Hll.registerFrame(rows.toDF(), "user_id")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    try {
      val batch1 = (1 to 30).map(i => ev(i, i % 13, i))
      input.addData(batch1: _*)
      query.processAllAvailable()
      assert(streamRegs() === batchRegs(batch1))
      // duplicates + new keys: registers must only ever grow
      val batch2 = (31 to 50).map(i => ev(i, i % 23, i))
      input.addData(batch2: _*)
      query.processAllAvailable()
      assert(streamRegs() === batchRegs(batch1 ++ batch2))
    } finally query.stop()
  }

  test("dqStream counts windowed rule violations with batch-identical semantics") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val rules = Seq(
      "value_negative" -> (col("value") < 0),
      "type_unknown" -> !col("event_type").isin("click", "view"))
    val query = Streams.dqStream(input.toDF(), rules)
      .writeStream.format("memory").queryName("dq_stream")
      .outputMode("complete").start()
    try {
      input.addData(
        EventRow(1, ts(0), 1, "click", -1.0, "{}"),
        EventRow(2, ts(10), 1, "view", 2.0, "{}"),
        EventRow(3, ts(20), 2, "weird", 3.0, "{}"))
      query.processAllAvailable()
      val got = spark.table("dq_stream").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got === Set(
        ("value_negative", 1L, 3L), ("type_unknown", 1L, 3L)))
    } finally query.stop()
  }

  test("scd2Stream emits exactly the batch SCD2's closed intervals, across batches") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    def emitted() = spark.table("scd2_stream").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, r.getTimestamp(3).getTime)).toSet
    def batchClosed(rows: Seq[EventRow]) = {
      val df = rows.toDF().select(col("user_id"),
        expr("unix_millis(ts)").as("tsl"), col("event_id"), col("event_type"))
      graft.ops.Scd.scd2(df, "user_id", "tsl", "event_id", "event_type")
        .filter(col("valid_to").isNotNull).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    def evt(id: Long, user: Long, minutes: Long, t: String) =
      EventRow(id, ts(minutes), user, t, 1.0, "{}")
    try {
      val b1 = Seq(evt(1, 1, 0, "view"), evt(2, 1, 5, "view"),
        evt(3, 1, 9, "click"), evt(4, 2, 1, "view"))
      input.addData(b1: _*)
      query.processAllAvailable()
      // ts casts to long MILLIS in the batch frame; stream emits
      // Timestamp — compare in millis on both sides
      assert(emitted() === batchClosed(b1))
      // the value change arriving in a LATER batch closes the run
      // opened in the earlier one
      val b2 = Seq(evt(5, 1, 15, "purchase"), evt(6, 2, 20, "error"))
      input.addData(b2: _*)
      query.processAllAvailable()
      assert(emitted() === batchClosed(b1 ++ b2))
    } finally query.stop()
  }

  test("ewmaStream equals the batch EWMA fold after every in-order micro-batch") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.ewmaStream(input.toDS(), alpha = 0.25)
      .writeStream.format("memory").queryName("ewma_stream")
      .outputMode("update").start()
    def latest() = spark.table("ewma_stream").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2._1)._2 }
    def batch(rows: Seq[EventRow]) =
      graft.ops.Ewma.ewma(rows.toDF(), "user_id", "ts", "event_id", "value", 0.25)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
        .toMap
    try {
      val batch1 = Seq(ev(1, 1, 0, 2.0), ev(2, 1, 5, 10.0), ev(3, 2, 1, 7.0))
      input.addData(batch1: _*)
      query.processAllAvailable()
      assert(latest() === batch(batch1))
      // a second in-order batch folds on top of carried state
      val batch2 = Seq(ev(4, 1, 9, 4.0), ev(5, 2, 10, 1.0))
      input.addData(batch2: _*)
      query.processAllAvailable()
      assert(latest() === batch(batch1 ++ batch2))
    } finally query.stop()
  }

  test("streaming CMS cells equal the batch sketch after every micro-batch") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    // complete mode with no watermark is SAFE here: the state key
    // space is depth·width cells by construction
    val query = Streams.cmsCellsStream(input.toDF(), "user_id", 4, 32)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    def streamCells() = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def batchCells(rows: Seq[EventRow]) =
      graft.ops.Sketches.cmsCells(rows.toDF(), "user_id", 4, 32)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    try {
      val batch1 = (1 to 20).map(i => ev(i, i % 7, i))
      input.addData(batch1: _*)
      query.processAllAvailable()
      assert(streamCells() === batchCells(batch1))
      val batch2 = (21 to 35).map(i => ev(i, i % 11, i))
      input.addData(batch2: _*)
      query.processAllAvailable()
      assert(streamCells() === batchCells(batch1 ++ batch2))
    } finally query.stop()
  }

  test("gap sessionization emits sessions after watermark passes (flatMapGroupsWithState)") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.sessionize(input.toDS(), gapMinutes = 30, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart -> one session
      input.addData(ev(1, 1, 0, 2.0), ev(2, 1, 10, 3.0))
      query.processAllAvailable()
      // far-future event advances the watermark past the session timeout
      input.addData(ev(3, 2, 600))
      query.processAllAvailable()
      input.addData(ev(4, 3, 1200))
      query.processAllAvailable()

      val sessions = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events"),
          r.getAs[Double]("total_value")))
      assert(sessions.contains((1L, 2, 5.0)), s"got ${sessions.toSeq}")
    } finally query.stop()
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.streamingDedup(input.toDF(), "event_id", "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 0), ev(1, 1, 1), ev(2, 2, 2))
      query.processAllAvailable()
      input.addData(ev(1, 1, 3), ev(3, 3, 4))
      query.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("sessionize: late in-gap event extends the session start backward") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.sessionize(input.toDS(), gapMinutes = 30, watermark = "3 hours")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      input.addData(ev(1, 1, 60), ev(2, 1, 70))
      query.processAllAvailable()
      // late event 20 min before the session start (inside the gap)
      input.addData(ev(3, 1, 40))
      query.processAllAvailable()
      // advance watermark far past everything to close the session
      input.addData(ev(4, 9, 600))
      query.processAllAvailable()
      input.addData(ev(5, 8, 1200))
      query.processAllAvailable()
      val s = spark.table("sessions_late").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
      assert(s.length == 1)
      assert(s.head.getAs[java.sql.Timestamp]("session_start") == ts(40))
      assert(s.head.getAs[Int]("n_events") == 3)
    } finally query.stop()
  }

  test("intervalJoin attributes effects to causes within the delay window") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[EventRow]
    val clicks = MemoryStream[EventRow]
    val joined = Streams.intervalJoin(
      views.toDF().select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_id")),
      clicks.toDF().select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id")),
      key = "user_id", causeTs = "view_ts", effectTs = "click_ts",
      maxDelayMinutes = 15)
    val query = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      views.addData(ev(100, 1, 0), ev(101, 2, 0))
      clicks.addData(
        ev(200, 1, 10), // within 15 min of view 100 -> attributed
        ev(201, 1, 40), // too late -> dropped
        ev(202, 3, 5)) //  no view for user 3 -> dropped
      query.processAllAvailable()
      val rows = spark.table("attrib").collect()
        .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id")))
      assert(rows.toSet == Set((100L, 200L)), s"got ${rows.toSeq}")
    } finally query.stop()
  }

  test("sessionize splits events farther apart than the gap") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    val query = Streams.sessionize(input.toDS(), gapMinutes = 30, watermark = "0 minutes")
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").start()
    try {
      // same user, 100 min apart -> second batch closes first session inline
      input.addData(ev(1, 1, 0))
      query.processAllAvailable()
      input.addData(ev(2, 1, 100))
      query.processAllAvailable()
      input.addData(ev(3, 9, 500))
      query.processAllAvailable()
      val sessions = spark.table("sessions2").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("n_events")))
      assert(sessions.count(_._1 == 1L) == 2, s"got ${sessions.toSeq}")
    } finally query.stop()
  }

  test("funnelStream advances steps across micro-batches, strictly ordered") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def tev(id: Long, user: Long, minutes: Long, typ: String) =
      EventRow(id, ts(minutes), user, typ, 1.0, "{}")
    val input = MemoryStream[EventRow]
    val query = Streams.funnelStream(input.toDS(),
      steps = Seq("signup", "click", "purchase"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    try {
      // user 1 advances all three steps across two batches;
      // user 2's click arrives a batch BEFORE its signup (cross-batch
      // straggler) — buffering until the watermark converges it to
      // the batch result: signup@3 then click@5 both fire;
      // user 3's click shares the signup timestamp -> strict ordering
      // refuses step 2
      input.addData(tev(1, 1, 0, "signup"), tev(10, 2, 5, "click"))
      query.processAllAvailable()
      input.addData(tev(2, 1, 10, "click"), tev(3, 1, 20, "purchase"),
        tev(11, 2, 3, "signup"),
        tev(20, 3, 0, "signup"), tev(21, 3, 0, "click"))
      query.processAllAvailable()
      // advance the watermark past every event (flush user 9), so all
      // buffered steps finalize in the trailing no-data batch
      input.addData(tev(90, 9, 200, "other"))
      query.processAllAvailable()
      val rows = spark.table("funnel").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("step_idx"),
          r.getAs[String]("step"))).toSet
      assert(rows === Set(
        (1L, 1, "signup"), (1L, 2, "click"), (1L, 3, "purchase"),
        (2L, 1, "signup"), (2L, 2, "click"), (3L, 1, "signup")), s"got $rows")
    } finally query.stop()
  }

  test("funnelStream: step 2 delivered a micro-batch before step 1 still converts") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def tev(id: Long, user: Long, minutes: Long, typ: String) =
      EventRow(id, ts(minutes), user, typ, 1.0, "{}")
    val input = MemoryStream[EventRow]
    val query = Streams.funnelStream(input.toDS(),
      steps = Seq("signup", "click"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel3")
      .outputMode("append").start()
    try {
      input.addData(tev(2, 1, 10, "click")) // step 2 first...
      query.processAllAvailable()
      input.addData(tev(1, 1, 3, "signup")) // ...step 1 a batch later
      query.processAllAvailable()
      input.addData(tev(90, 9, 200, "other")) // watermark flush
      query.processAllAvailable()
      val rows = spark.table("funnel3").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("step_idx"),
          r.getAs[String]("step"))).toSet
      assert(rows === Set((1L, 1, "signup"), (1L, 2, "click")), s"got $rows")
    } finally query.stop()
  }

  test("funnelStream finalizes out-of-order events within one micro-batch in event-time order") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    def tev(id: Long, user: Long, minutes: Long, typ: String) =
      EventRow(id, ts(minutes), user, typ, 1.0, "{}")
    val input = MemoryStream[EventRow]
    val query = Streams.funnelStream(input.toDS(),
      steps = Seq("signup", "click"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel2")
      .outputMode("append").start()
    try {
      // click listed first but signup is EARLIER in event time
      input.addData(tev(2, 1, 10, "click"), tev(1, 1, 0, "signup"))
      query.processAllAvailable()
      input.addData(tev(90, 9, 200, "other")) // watermark flush
      query.processAllAvailable()
      val rows = spark.table("funnel2").collect()
        .map(r => (r.getAs[Int]("step_idx"), r.getAs[String]("step"))).toSet
      assert(rows === Set((1, "signup"), (2, "click")), s"got $rows")
    } finally query.stop()
  }

  test("md5 samplers are streaming-safe: stream membership equals batch membership") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    // stateless map-only membership -> usable in a streaming query
    // as-is, and the SAME rows pass in streaming and batch execution
    val query = graft.ops.Sampling.withSplit(input.toDF(), "event_id", 0.3)
      .writeStream.format("memory").queryName("sampled")
      .outputMode("append").start()
    try {
      val rows = (1L to 400L).map(i => ev(i, i % 7, i))
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("sampled").collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("split")).toMap
      val batch = graft.ops.Sampling.withSplit(
        spark.createDataset(rows).toDF(), "event_id", 0.3)
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[String]("split")).toMap
      assert(streamed === batch)
      assert(streamed.values.count(_ == "test") > 0 &&
        streamed.values.count(_ == "train") > 0)
    } finally query.stop()
  }

  test("chunking is streaming-safe: stream windows equal batch windows") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    // stateless map-only (tokenize -> sequence -> explode -> slice):
    // valid in a streaming query with no watermark or state, and the
    // SAME windows come out of streaming and batch execution
    val query = graft.text.Chunking.slidingWindows(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", chunkTokens = 4, stride = 3)
      .writeStream.format("memory").queryName("chunked")
      .outputMode("append").start()
    try {
      val rows = Seq(
        1L -> (1 to 11).map(i => s"w$i").mkString(" "),
        2L -> "short text",
        3L -> "")
      input.addData(rows: _*)
      query.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))
      val streamed = spark.table("chunked").collect().map(key).sorted
      val batch = graft.text.Chunking.slidingWindows(
        rows.toDF("doc_id", "text"), "doc_id", "text", 4, 3)
        .collect().map(key).sorted
      assert(streamed.toSeq === batch.toSeq)
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("decontaminateStream drops blocklisted text by normalized fingerprint") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[EventRow]
    // blocklist the fingerprint of "benchmark question" — normalization
    // means case/whitespace variants of it must also be dropped
    val blocklist = Seq("benchmark question").toDF("text")
      .select(graft.text.TextFunctions.fingerprint(
        org.apache.spark.sql.functions.col("text")).as("fp"))
    val query = Streams.decontaminateStream(input.toDF(), "props", blocklist)
      .writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      input.addData(
        EventRow(1, ts(0), 1, "doc", 1.0, "benchmark question"),
        EventRow(2, ts(1), 1, "doc", 1.0, "  Benchmark   QUESTION "),
        EventRow(3, ts(2), 1, "doc", 1.0, "ordinary web text"))
      query.processAllAvailable()
      val kept = spark.table("decontam").collect().map(_.getAs[Long]("event_id"))
      assert(kept.toSet == Set(3L), s"got ${kept.toSeq}")
    } finally query.stop()
  }

  test("latestByKeyStream: max-seq state wins across micro-batches, deletes visible") {
    import spark.implicits._
    // static-frame semantics first (the same plan runs streamed)
    val log = Seq(
      (1L, 1L, "U", 10L), (1L, 3L, "D", 0L), (1L, 2L, "U", 11L),
      (2L, 5L, "I", 20L)).toDF("k", "seq", "op", "v")
    val got = Streams.latestByKeyStream(log, "k", "seq")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 3L, "D", 0L), (2L, 5L, "I", 20L)))
    // streamed across batches via the replay harness: same winners
    val winners = graft.streaming.Replay.replayBatchesComplete(spark,
      Seq(log.filter($"seq" <= 1), log.filter($"seq" > 1)),
      df => Streams.latestByKeyStream(df, "k", "seq"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(winners.toSeq == got.toSeq)
  }

  test("sketchCensus stream: bounded per-source state, estimate contract, stream equals batch") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import graft.ops.CorpusCard
    val k = 8
    // source "big": 40 distinct fingerprints (>> k, estimator branch)
    // + 10 exact duplicates; source "small": 5 distinct (< k, EXACT
    // branch). Duplicates must not occupy sketch slots.
    val big = (0 until 40).map(i => (s"unique text number $i", "big", "en")) ++
      (0 until 10).map(_ => ("unique text number 0", "big", "en"))
    val small = (0 until 5).map(i => (s"short doc $i", "small", "de"))
    val docs = (big ++ small).toDF("text", "source", "lang")
    val input = MemoryStream[(String, String, String)]
    val query = CorpusCard.sketchCensus(
      input.toDF().toDF("text", "source", "lang"), "text", "source", "lang", k)
      .writeStream.format("memory").queryName("sk_census")
      .outputMode("complete").start()
    try {
      val rows = (big ++ small)
      input.addData(rows.take(20): _*) // fingerprint state crosses
      query.processAllAvailable()      // a real batch boundary
      input.addData(rows.drop(20): _*)
      query.processAllAvailable()
      val streamed = spark.table("sk_census")
      // THE STATE BOUND: one row per source, sketch <= k entries —
      // where the exact census would hold 45 fingerprint rows
      val sizes = streamed.select($"source", expr("size(__sk)")).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(sizes == Map("big" -> k, "small" -> 5),
        s"sketch sizes $sizes — state not bounded at k=$k")
      // stream == batch (duplicate-blind, order-blind, mergeable)
      val batch = CorpusCard.sketchCensus(docs, "text", "source", "lang", k)
      val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getSeq[Long](5))).toSet
      assert(key(streamed) == key(batch), "stream != batch census")
      // the pinned estimate contract on the folded card
      val card = CorpusCard.cardFromSketchCensus(streamed, k)
        .collect().map(r => r.getString(0) ->
          (r.getInt(5), r.getDouble(6), r.getLong(7))).toMap
      val (smallKept, smallEst, smallPpm) = card("small")
      assert(smallKept == 5 && smallEst == 5.0 && smallPpm == 0L,
        s"underfull sketch must be EXACT, got ${card("small")}")
      val (bigKept, bigEst, _) = card("big")
      assert(bigKept == k, "full sketch must report k kept")
      assert(bigEst > 40 * 0.4 && bigEst < 40 * 2.5,
        s"estimator wildly off: $bigEst for 40 distinct")
    } finally query.stop()
  }
}
