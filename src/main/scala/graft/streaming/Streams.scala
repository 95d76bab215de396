package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Scale notes: windowed aggregation state is partitioned by
  * (window, event_type) — bounded keyspace, no skew concern; the
  * watermark bounds state size. Sessionization state is per user_id —
  * at 100 TB/day scale the state store shards across executors by
  * user hash; the event-time timeout both closes sessions and evicts
  * state, so memory is O(active users), not O(history).
  */
object Streams {

  final case class EventRow(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Int, total_value: Double)

  /** Internal accumulator for [[sessionize]] (public: Catalyst encoder
    * codegen must be able to construct it).
    */
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /** Tumbling hourly counts per event type with a watermark for late
    * data — the streaming twin of the batch `ev_hourly_agg` query.
    */
  def hourlyEventCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding (overlapping) windowed counts per event type — the
    * trailing-window monitor beside [[hourlyEventCounts]]'s tumbling
    * census: each event lands in `length/slide` concurrent windows,
    * and the engine maintains state for all of them (the overlap IS
    * the feature — a 2h/1h dial reports every hour on the trailing
    * two). Append-mode emission and watermark eviction work exactly
    * as for tumbling windows, per window end.
    */
  def slidingEventCounts(
      events: DataFrame, length: String = "2 hours", slide: String = "1 hour",
      watermark: String = "2 hours",
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), length, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** Streaming tokenizer budget stats — the twin of the batch
    * [[graft.text.Bpe.encodeStats]] for documents arriving on a
    * stream: per document, the subword count under a TRAINED
    * segmentation and the OOV token count (the numbers an ingest-time
    * packing/curation monitor consumes).
    *
    * Shape: explode tokens map-side, stream-static broadcast join
    * against the `(word, syms)` vocabulary (train once offline, the
    * vocab is bounded), then a watermarked per-document aggregation —
    * the doc id alone would be unbounded state over the stream's
    * lifetime, so the group key includes the event-time window and
    * state evicts with the watermark (documents arrive whole, so a
    * doc never straddles windows). Same static-side caveat as
    * [[decontaminateStream]]: a file-backed vocabulary caches its
    * file listing — retrain means recreate the frame and restart.
    */
  def encodeStatsStream(
      docs: DataFrame, idCol: String, textCol: String,
      segmentation: DataFrame, watermark: String = "1 hour",
  ): DataFrame = {
    val toks = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col(idCol).as("id"),
        explode(graft.text.TextFunctions.tokens(lower(col(textCol)))).as("word"))
    toks.join(broadcast(segmentation.select(col("word"), col("syms"))),
        Seq("word"), "left")
      .select(col("ts"), col("id"),
        coalesce(size(col("syms")), length(col("word"))).as("n_sub"),
        col("syms").isNull.cast("int").as("oov"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("id"))
      .agg(sum(col("n_sub")).cast("long").as("n_subwords"),
        sum(col("oov")).cast("long").as("n_oov"))
      .select(col("w.start").as("hour"), col("id"),
        col("n_subwords"), col("n_oov"))
  }

  /** Streaming LM-surprise scoring — the twin of the batch
    * [[graft.text.Lm.surpriseScoreAgainst]] for documents arriving
    * on a stream: per document, the bigram count and quantized
    * surprise sum against a TRAINED census (an ingest-time quality
    * monitor — the perplexity-filter signal before documents reach
    * the corpus).
    *
    * Shape: the per-gram explode + census joins + quantization are
    * the BATCH operator's own body ([[graft.text.Lm.scoredGrams]] —
    * one code path, so stream ≡ batch can never drift), followed by
    * a watermarked per-(window, doc) aggregation like
    * [[encodeStatsStream]] (documents arrive whole, so a doc never
    * straddles windows; state evicts with the watermark). The
    * censuses join stream-static WITHOUT a forced broadcast — they
    * are corpus-sized, unlike `encodeStatsStream`'s bounded vocab;
    * persist them (or reload from parquet) so micro-batches don't
    * re-aggregate the reference.
    */
  def surpriseStream(
      docs: DataFrame, idCol: String, textCol: String,
      prefix: DataFrame, grams: DataFrame, vocabSize: DataFrame,
      watermark: String = "1 hour", order: Int = 2,
  ): DataFrame =
    graft.text.Lm.scoredGrams(
        docs.withWatermark("ts", watermark)
          .select(col("ts"), col(idCol).as("id"), col(textCol)),
        textCol, prefix, grams, vocabSize, order)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("id"))
      .agg(count(col("__gram")).cast("int").as("n_grams"),
        coalesce(sum(col("__micro")), lit(0L)).as("surprise_micro"))
      .select(col("w.start").as("hour"), col("id"),
        col("n_grams"), col("surprise_micro"))

  /** Incremental MinHash-LSH at the stream door — the streaming twin
    * of [[graft.dedup.Dedup.minhashLshPairsAgainst]]: documents
    * arriving on the stream are shingled and signed (ONE watermarked
    * per-(window, doc) aggregation of the shared
    * [[graft.dedup.Dedup.signatureAggs]] mins), band keys derive
    * map-side from the emitted signature
    * ([[graft.dedup.Dedup.bandedSignatures]] — the identical
    * derivation as the batch path), and candidates join the PERSISTED
    * corpus signature store. `corpusBanded` is the store in its
    * persisted layout — ALREADY banded
    * (`Dedup.bandedSignatures(minhashSignatures(...))`, mh columns
    * carried): that is what a production store writes (the band key
    * IS its partition key), and it keeps the per-micro-batch static
    * side a checkpointed scan instead of a re-derivation. Output: one
    * `(new_id, corpus_id, n_common_minhash, est_jaccard)` row per
    * matching band — cross-band duplicates carry identical values by
    * construction and dedupe wherever the sink is consumed (which
    * duplicate survives a micro-batch is engine-private; consumers
    * project the pair key — the [[semanticContamStream]] stance).
    *
    * Scale/state: the only stateful operator is the signature
    * aggregation — per-key state is `numHashes` longs, evicted by the
    * watermark; the join is stateless stream-static. The hot-bucket
    * guard mirrors the batch twin's shape with the census on the
    * STORE side (the side that persists and accumulates boilerplate
    * buckets; the ingest side is already bounded by the micro-batch):
    * buckets wider than `maxBucketSize` become a blocklist that is
    * the ONLY broadcast side — both the store and the arriving band
    * rows anti-join it. The store itself joins with NO strategy hint:
    * it is O(corpus × bands) rows, and forcing a broadcast on it is a
    * driver/executor OOM at exactly the scale this operator exists
    * for — shuffle (or let AQE broadcast a genuinely small store) is
    * the 100 TB plan. `broadcastStore = true` restores the hint for
    * stores KNOWN to be small (e.g. a per-tenant blocklist);
    * defaults off.
    *
    * DEFAULT-BEHAVIOR CHANGE (r17): this door previously forced a
    * broadcast of the store and ran UNGUARDED; it now defaults to
    * `maxBucketSize = 1000`, so callers relying on the old default
    * silently stop emitting pairs inside over-1000 store buckets —
    * which is the intended production contract (a hot bucket is
    * boilerplate, and its pairs are noise at quadratic cost), but a
    * caller that wants the exhaustive pre-r17 behavior must now pass
    * `maxBucketSize = Int.MaxValue` explicitly (what the
    * `st_minhash_incr` gate pins, matching its guard-free oracle).
    */
  def minhashIncrStream(
      docs: DataFrame, idCol: String, textCol: String,
      corpusBanded: DataFrame, numHashes: Int = 16, bands: Int = 4,
      watermark: String = "1 hour", maxBucketSize: Int = 1000,
      broadcastStore: Boolean = false): DataFrame = {
    import graft.dedup.Dedup
    val shingled = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col(idCol).as("id"),
        explode(Dedup.wordShingles(col(textCol), 1)).as("tok"))
      .withColumn("h",
        conv(substring(md5(col("tok")), 1, 7), 16, 10).cast("long"))
    val aggs = Dedup.signatureAggs(numHashes)
    val sig = shingled
      .groupBy(window(col("ts"), "1 hour").as("w"), col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("w")
    val nb = Dedup.bandedSignatures(sig, numHashes, bands)
    // the shared store-join tail (census the store's band keys,
    // broadcast only the tiny blocklist, anti-join both sides — the
    // stream-side anti-join is a stateless map pass per micro-batch):
    // one body with the batch-equivalent ScaleTrend audit
    Dedup.bandJoinAgainstStore(nb, corpusBanded, numHashes,
      maxBucketSize, broadcastStore)
  }

  /** Incremental SemDeDup at the stream door — the SEMANTIC twin of
    * [[minhashIncrStream]] (paraphrase-level duplicates MinHash can't
    * see): arriving embeddings assign map-side to the TRAINED Lloyd
    * centroids (`cents`, ≤ nCells rows — the one side that is
    * broadcast-right by construction), then join the persisted
    * cell-keyed corpus store on the cell and emit every store partner
    * at `threshold` cosine. Stateless stream-static — no aggregation,
    * no watermark, no sentinels: a verdict per arriving vector inside
    * its own micro-batch.
    *
    * `corpusStore` is the store in its persisted layout — ALREADY
    * assigned `(id, v, cell)` ([[graft.ann.Ann.lloydAssigned]]; the
    * cell IS its partition key), so the per-micro-batch static side
    * is a scan, not a re-derivation. The store side carries NO join
    * strategy hint — it is O(corpus) rows and the cell equi-join
    * shuffles fine (the [[minhashIncrStream]] lesson; the trained
    * centroid array is the only forced broadcast). `broadcastStore`
    * restores the hint for stores known to be small.
    *
    * `maxCellSize` is the hot-cell guard, censused on the STORE side
    * once at stream construction (the blocklist rides every
    * micro-batch as a driver-local literal — never a per-batch store
    * aggregation) and anti-joined on BOTH sides, mirroring
    * [[minhashIncrStream]]'s hot-bucket stance. Default OFF
    * (Int.MaxValue skips the census by contract): cells are
    * corpus/nCells-sized by construction, so the dial must be sized
    * relative to the store (see
    * [[graft.ann.Ann.semDedupPairsAgainstStore]] and
    * [[graft.ann.Ann.lloydCellSkew]]); an arrival assigned to a
    * blocklisted cell emits no verdict (passes as novel).
    */
  def semDedupIncrStream(
      vecs: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, corpusStore: DataFrame, threshold: Double,
      maxCellSize: Int = Int.MaxValue,
      broadcastStore: Boolean = false): DataFrame = {
    import graft.ann.Ann
    // assignment + the shared store pair tail
    // (Ann.semDedupPairsAgainstStore — one body with the
    // persisted-store gate and the spec's batch twin, so the stream
    // door can't drift from what the oracle models)
    Ann.semDedupPairsAgainstStore(
      Ann.lloydAssigned(vecs, idCol, vecCol, cents), corpusStore,
      threshold, maxCellSize, broadcastStore)
  }

  /** Streaming exact-dedup on an id column: duplicates arriving within
    * the watermark horizon are dropped; state for ids older than the
    * watermark is evicted (bounded memory). The streaming twin of the
    * corpus exact-dedup operator.
    */
  def streamingDedup(
      events: DataFrame, idCol: String, watermark: String = "1 hour",
  ): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Streaming count-min cells over a value column: the same salted
    * explode + count as the batch [[graft.ops.Sketches.cmsCells]],
    * maintained incrementally. The sketch is the rare streaming
    * aggregation that needs NO watermark to stay bounded: its state
    * key space is `depth·width` cells BY CONSTRUCTION regardless of
    * the stream's key cardinality, so it runs forever in
    * update/complete mode — frequency monitoring at ingest without a
    * census shuffle. Batch-equivalent: after any prefix of the
    * stream, the cells equal `cmsCells` of the rows so far
    * (StreamsSpec pins it), so an ingest-time sketch can be
    * [[graft.ops.Sketches.cmsMerge]]d with batch shards exactly.
    */
  def cmsCellsStream(
      events: DataFrame, valueCol: String, depth: Int, width: Int,
  ): DataFrame =
    // delegate to the batch operator: its plan (select/explode/groupBy)
    // is streaming-safe as-is, and one body means a bucket/salt change
    // can never leave stream cells silently un-mergeable with batch
    // shards
    graft.ops.Sketches.cmsCells(events, valueCol, depth, width)

  /** Streaming quality-classifier scoring — the twin of the batch
    * [[graft.text.HashedClassifier.score]] for documents arriving on
    * a stream: the ingest-time quality filter (score at the door,
    * route below-threshold documents to quarantine before they reach
    * the corpus). The feature explode + bucket weights are the batch
    * operator's own body ([[graft.text.HashedClassifier.gramWeights]]
    * — one code path, stream ≡ batch pinned in StreamsSpec), and the
    * weight table is pure hash arithmetic — NO static side at all,
    * so this is the rare stream twin with zero retrain-restart
    * caveat. Watermarked per-(window, doc) aggregation like
    * [[encodeStatsStream]].
    */
  def classifierStream(
      docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 4096, watermark: String = "1 hour",
  ): DataFrame =
    graft.text.HashedClassifier.gramWeights(
        docs.withWatermark("ts", watermark)
          .select(col("ts"), col(idCol).as("id"), col(textCol)),
        textCol, buckets)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("__w")).as("w_sum"))
      .select(col("w.start").as("hour"), col("id"),
        col("n_grams"), col("w_sum"),
        (col("w_sum").cast("double") / col("n_grams").cast("double"))
          .as("score"))

  /** Streaming HyperLogLog registers over a value column — the
    * distinct-count twin of [[cmsCellsStream]], with the same
    * no-watermark safety argument one better: state is AT MOST 256
    * `(bucket, max_rho)` cells by construction, and the per-bucket
    * `max` is duplicate-blind AND monotone, so update mode only ever
    * emits a bucket when its register grows. After any stream prefix
    * the registers equal the batch [[graft.ops.Hll.registerFrame]]
    * of the rows so far (StreamsSpec pins it), so ingest-time
    * registers merge exactly with batch shards via
    * [[graft.ops.Hll.mergeRegisters]] — continuous cardinality
    * monitoring with 2 KB of state.
    */
  def hllRegistersStream(events: DataFrame, valueCol: String): DataFrame =
    // delegate: select/groupBy(bucket).max is streaming-safe as-is,
    // and one body keeps stream and batch registers mergeable forever
    graft.ops.Hll.registerFrame(events, valueCol)

  /** Watermarked stream-stream interval join (event attribution):
    * each `effects` row joins the `causes` rows with the same `key`
    * whose timestamp precedes the effect's by at most
    * `maxDelayMinutes` — the classic view→click attribution shape.
    * Inputs must expose distinct column names apart from `key`
    * (pre-project/rename before calling); `causeTs`/`effectTs` name
    * each side's event-time column.
    *
    * Scale: the watermark plus the interval predicate bound BOTH
    * state stores — Spark evicts cause rows once the effect-side
    * watermark passes `causeTs + maxDelay` and effect rows once their
    * own watermark passes, so state is O(events inside the horizon),
    * the requirement for an unbounded-stream join. Inner joins emit
    * in append mode as soon as a match arrives; no watermark wait.
    */
  def intervalJoin(
      causes: DataFrame, effects: DataFrame, key: String,
      causeTs: String, effectTs: String,
      maxDelayMinutes: Int, watermark: String = "1 hour",
  ): DataFrame = {
    require(maxDelayMinutes >= 1,
      s"maxDelayMinutes $maxDelayMinutes must be >= 1 (a non-positive " +
        "window makes the join condition unsatisfiable)")
    val c = causes.withWatermark(causeTs, watermark).alias("c")
    val e = effects.withWatermark(effectTs, watermark).alias("e")
    c.join(e,
      col(s"c.$key") === col(s"e.$key") &&
        col(s"e.$effectTs") >= col(s"c.$causeTs") &&
        col(s"e.$effectTs") <=
          col(s"c.$causeTs") + expr(s"INTERVAL $maxDelayMinutes MINUTES"))
      .drop(col(s"e.$key"))
  }

  /** Stream-static decontamination: drop stream rows whose normalized
    * fingerprint ([[graft.text.TextFunctions.fingerprint]] of
    * `textCol`) appears in the static `blocklist` frame (one
    * fingerprint column named `fp`) — the streaming twin of the batch
    * contamination scan, for ingest-time filtering of benchmark text
    * arriving in a document/event stream.
    *
    * Scale: a stream-static LEFT ANTI join. The static side's SCAN
    * re-executes per micro-batch and broadcasts when small (benchmark
    * fingerprint sets are a few MB); no streaming state at all, so
    * nothing to watermark or evict. Caveat on "re-executes": a
    * file-backed frame caches its FILE LISTING (and per-file sizes)
    * at DataFrame creation — rewriting or adding files behind an
    * existing frame yields stale or failing reads. To update the
    * blocklist without restarting the query, point the frame at a
    * table format that versions its listing (Delta/Iceberg) or
    * recreate the static DataFrame and restart; in-place file swaps
    * are NOT picked up.
    */
  def decontaminateStream(
      stream: DataFrame, textCol: String, blocklist: DataFrame,
  ): DataFrame = {
    require(!stream.columns.contains("__fp"),
      "decontaminateStream reserves the column name __fp; rename it on the input")
    val fp = graft.text.TextFunctions.fingerprint(col(textCol))
    stream.withColumn("__fp", fp)
      .join(blocklist.select(col("fp").as("__fp")), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** Streaming embedding-space decontamination — the semantic twin of
    * [[decontaminateStream]] the way [[graft.ann.Ann.semanticContamination]]
    * twins the batch fingerprint scan: corpus rows arriving on the
    * stream are flagged when their cosine to ANY eval-set embedding
    * reaches `threshold`. Stateless stream-static inner join: the
    * stream side computes its banded LSH keys map-only, the static
    * eval side's exploded band keys broadcast (eval suites are tiny),
    * candidates meet on the (band, key) equi-join and the exact
    * cosine filters them — no state store, no watermark required.
    *
    * Emits `(id, eval_id, cos)` AT-LEAST-ONCE: a pair colliding in
    * several bands is emitted once per colliding band (global
    * per-pair dedup would need a state store keyed by an unbounded
    * pair space — the wrong trade for a flagging scan). Downstream
    * either treats the flag as idempotent (quarantine by id) or
    * exact-dedups per micro-batch in `foreachBatch`.
    */
  def semanticContamStream(
      stream: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      planes: Int = 192, bands: Int = 16, dim: Int = 64,
  ): DataFrame = {
    require(planes % bands == 0, "bands must divide planes")
    val r = planes / bands
    import graft.ann.Ann
    def sides(df: DataFrame, idA: String, vA: String, nA: String) =
      df.select(col(idCol).as(idA), col(vecCol).as(vA),
        Ann.norm(col(vecCol)).as(nA),
        posexplode(Ann.lshBandKeys(col(vecCol), bands, r, dim))
          .as(Seq("band", "bkey")))
        .filter(col(nA) > 0)
    val e = broadcast(sides(evalSet, "eval_id", "ev", "en"))
    sides(stream, "id", "cv", "cn")
      .join(e, Seq("band", "bkey"))
      .select(col("id"), col("eval_id"),
        (Ann.dot(col("cv"), col("ev")) / (col("cn") * col("en"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  final case class FunnelOut(
      user_id: Long, step_idx: Int, step: String, ts: Timestamp)

  /** One buffered step-typed event awaiting watermark finalization
    * (public: Catalyst encoder codegen must construct it).
    */
  final case class FunnelBufEvent(tsMs: Long, eventId: Long, step: String)

  /** Internal accumulator for [[funnelStream]]. `times` holds the
    * epoch-ms completion time of each COMMITTED step in step order;
    * `buf` the step-typed events newer than the watermark (not yet
    * final — an earlier straggler may still arrive); `lastSeenMs` the
    * newest event time seen, driving idle eviction.
    */
  final case class FunnelStepsState(
      times: List[Long], buf: List[FunnelBufEvent], lastSeenMs: Long)

  /** Streaming ordered funnel: emits `(user, step_idx, step, ts)` when
    * the watermark FINALIZES a user's advance to the next step — same
    * greedy earliest-first, STRICTLY-later semantics as the batch
    * [[graft.ops.Funnel]]. Step-typed events buffer until the
    * watermark passes them (only then can no earlier straggler
    * arrive), so ANY reordering within the watermark — including
    * step 2 delivered a micro-batch before step 1 — converges to the
    * batch operator's result. Events later than the watermark are
    * dropped by the watermark itself, exactly the events the batch
    * operator would see but this one cannot wait for.
    *
    * Emission therefore trails the event by at most the watermark
    * delay; a per-key ripening timer (event-time timeout at the
    * earliest buffered event) emits on watermark advance alone, with
    * no need for further data on that key.
    *
    * Scale: state is k longs plus the step-typed events inside the
    * watermark horizon per user — O(active users · in-horizon step
    * events), the price of out-of-order exactness (non-step event
    * types are never buffered). The idle timeout evicts users idle
    * past `idleHorizonMinutes` (funnels are campaign-scoped; an
    * evicted user who returns restarts from step 1), so state is
    * O(active users), not O(all users ever seen).
    */
  def funnelStream(
      events: Dataset[EventRow], steps: Seq[String],
      watermark: String = "2 hours", idleHorizonMinutes: Int = 1440,
  ): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct: $steps")
    require(idleHorizonMinutes >= 1,
      s"idleHorizonMinutes $idleHorizonMinutes must be >= 1")
    import events.sparkSession.implicits._
    val idleMs = idleHorizonMinutes * 60000L
    val stepSet = steps.toSet
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelStepsState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelStepsState]) =>
          // greedy earliest-first advance over FINAL events only
          def advance(times0: List[Long], ripe: Seq[FunnelBufEvent])
              : (List[Long], List[FunnelOut]) = {
            var times = times0
            var out = List.empty[FunnelOut]
            ripe.sortBy(e => (e.tsMs, e.eventId)).foreach { e =>
              val next = times.length
              if (next < steps.length && e.step == steps(next) &&
                  (times.isEmpty || e.tsMs > times.last)) {
                times = times :+ e.tsMs
                out ::= FunnelOut(userId, next + 1, steps(next),
                  new Timestamp(e.tsMs))
              }
            }
            (times, out.reverse)
          }
          // next invocation: when the earliest buffered event ripens
          // (wm > its ts) or the idle horizon passes, whichever first;
          // always strictly beyond the current watermark
          def armTimeout(pending: List[FunnelBufEvent], lastSeen: Long,
              wm: Long): Unit = {
            val idleAt = lastSeen + idleMs
            val fireAt = pending.map(_.tsMs + 1).minOption
              .fold(idleAt)(math.min(_, idleAt))
            state.setTimeoutTimestamp(math.max(fireAt, wm + 1))
          }
          val st = state.getOption.getOrElse(FunnelStepsState(Nil, Nil, 0L))
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val (ripe, pending) = st.buf.partition(_.tsMs <= wm)
            val (times2, out) = advance(st.times, ripe)
            if (wm >= st.lastSeenMs + idleMs) {
              // idle horizon passed: everything buffered is older than
              // lastSeen < wm, so pending is empty — evict
              state.remove()
            } else {
              state.update(FunnelStepsState(times2, pending, st.lastSeenMs))
              armTimeout(pending, st.lastSeenMs, wm)
            }
            out.iterator
          } else {
            val rowList = rows.toList
            val incoming = rowList.collect {
              case e if stepSet(e.event_type) =>
                FunnelBufEvent(e.ts.getTime, e.event_id, e.event_type)
            }
            val lastSeen = (st.lastSeenMs +: rowList.map(_.ts.getTime)).max
            val (ripe, pending) = (st.buf ++ incoming).partition(_.tsMs <= wm)
            val (times2, out) = advance(st.times, ripe)
            state.update(FunnelStepsState(times2, pending, lastSeen))
            armTimeout(pending, lastSeen, wm)
            out.iterator
          }
      }
  }

  /** Gap-based sessionization with `flatMapGroupsWithState`: events
    * within `gapMinutes` of each other belong to one session; a
    * session is emitted (and its state evicted) when the event-time
    * watermark passes its gap timeout.
    */
  def sessionize(
      events: Dataset[EventRow],
      gapMinutes: Int = 30,
      watermark: String = "2 hours",
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(
              userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within the gap after the end — extend forward
                case Some(s) if t >= s.last && t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                // late event inside or gap-adjacent to the session —
                // merge, extending the start backward if needed
                case Some(s) if t < s.last && t >= s.start - gapMs =>
                  cur = Some(SessionState(math.min(s.start, t), s.last,
                    s.n + 1, s.total + e.value))
                // too late to belong to the open session: emit it as
                // its own completed session (it cannot be extended —
                // anything near it is older than what we already saw)
                case Some(s) if t < s.start - gapMs =>
                  closed ::= SessionOut(userId, e.ts, e.ts, 1, e.value)
                // beyond the gap after the end — close and start anew
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // a timeout at-or-before the current watermark is
              // rejected by Spark — clamp just past it (fires on the
              // next batch, which is also semantically correct: the
              // session's gap has already fully elapsed in event time)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.last + gapMs, wm + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming twin of the batch [[graft.ops.Dq]] expectations: the
    * same named violation predicates evaluated per event-time window
    * — the live data-quality MONITOR beside the batch publish gate
    * (alert when a window's violation count jumps at ingest, instead
    * of discovering it at the next batch audit). One row per
    * (window, rule); watermarked, so state is bounded.
    *
    * Same null semantics as the batch operator (a null predicate is
    * not a violation), and the per-rule aggregation is the identical
    * sum-of-when fold — a rule constant can never mean two things in
    * batch and stream.
    */
  def dqStream(
      events: DataFrame,
      rules: Seq[(String, org.apache.spark.sql.Column)],
      watermark: String = "1 hour",
  ): DataFrame = {
    require(rules.nonEmpty, "dqStream needs at least one rule")
    // index-keyed internal columns (the batch Dq.report convention):
    // a rule NAME may contain dots/backticks that break col() lookups
    val flags = events.withWatermark("ts", watermark)
      .select(col("ts") +: rules.zipWithIndex.map { case ((_, p), i) =>
        when(p, lit(1L)).otherwise(lit(0L)).as(s"__v_$i")
      }: _*)
    val sums = rules.zipWithIndex.map { case (_, i) =>
      coalesce(sum(col(s"__v_$i")), lit(0L)).as(s"__s_$i")
    }
    val agged = flags.groupBy(window(col("ts"), "1 hour"))
      .agg(sums.head, sums.tail :+ count(lit(1)).as("__n"): _*)
    agged.select(col("window.start").as("win_start"),
        explode(array(rules.zipWithIndex.map { case ((n, _), i) =>
          struct(lit(n).as("rule"), col(s"__s_$i").as("n_violations"),
            col("__n").as("n_rows"))
        }: _*)).as("r"))
      .select(col("win_start"), col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("r.n_rows").as("n_rows"))
  }

  /** Streaming CDC materialization — the latest row per key from an
    * ordered changelog stream (the live twin of
    * [[graft.ops.Changelog.apply]]'s winner stage): an unwatermarked
    * `max(struct(seq, payload…))` keyed aggregation whose state is
    * ONE struct per key, updated in place as I/U/D mutations arrive.
    * `seqCol` leads the struct, so the comparison is the
    * last-writer-wins rule as long as `seqCol` is unique per key (the
    * batch operator's contract). Run in complete/update mode against
    * an upsert sink; downstream applies the same `op != 'D'` filter
    * and base anti-join as the batch path.
    *
    * State is O(keys) — the table's key cardinality, not its mutation
    * history — the same bound a Delta/Iceberg streaming MERGE sink
    * carries.
    */
  def latestByKeyStream(
      log: DataFrame, keyCol: String, seqCol: String): DataFrame = {
    val payload = log.columns.filterNot(_ == keyCol)
    require(payload.contains(seqCol), s"seqCol $seqCol missing")
    val ordered = seqCol +: payload.filterNot(_ == seqCol)
    log.groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col).toIndexedSeq: _*)).as("__w"))
      .select(col(keyCol) +: ordered.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Gap sessionization through Spark's NATIVE merging session
    * windows (`session_window`) — the engine's own implementation of
    * what [[sessionize]] builds as an explicit state machine. Both
    * exist deliberately: the native window is the right default (the
    * state store merges overlapping sessions for free, no custom
    * state class), while the flatMapGroupsWithState twin is the
    * template users extend when they need policies the window can't
    * express (per-key dynamic gaps, side outputs, custom eviction).
    * Stream ≡ state-machine-twin for in-horizon data; the gate pins
    * both against ONE oracle.
    *
    * A session window's `end` is `last event + gap` (the window is
    * the event span EXTENDED by the gap), so the last-event time is
    * `w.end - gap` — callers recover the [[SessionOut]] shape from
    * that. Emits in Append mode when the watermark passes the
    * session end; state is O(open sessions), merged and evicted by
    * the engine.
    */
  def sessionizeNative(
      events: DataFrame, gapMinutes: Int, watermark: String = "1 hour",
  ): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        (col("w.end") - expr(s"INTERVAL $gapMinutes MINUTES"))
          .as("session_end"),
        col("n_events"))

  final case class Scd2State(value: String, since: Long)

  final case class Scd2Out(
      user_id: Long, value: String,
      valid_from: Timestamp, valid_to: Timestamp)

  /** Streaming twin of the batch [[graft.ops.Scd.scd2]]: dimension
    * updates arrive on the event stream, and each key's CLOSED
    * validity intervals emit the moment the value changes (append
    * mode — an interval is immutable once closed; the open run lives
    * only in state). State is O(1) per key: the current value and
    * its start.
    *
    * Within a micro-batch rows fold in `(ts, event_id)` order;
    * stream ≡ batch-minus-open-rows whenever arrival respects event
    * time at micro-batch granularity (StreamsSpec pins it) — the
    * same in-order contract as [[ewmaStream]]. And the same state
    * caveat: each key's open run lives in state forever (NoTimeout —
    * a dimension's current value has no natural expiry), so pair
    * with a timeout-based evictor if the KEY space itself is
    * unbounded.
    */
  def scd2Stream(
      events: Dataset[EventRow],
  ): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[Scd2State]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          var closed = List.empty[Scd2Out]
          sorted.foreach { e =>
            cur match {
              case Some(s) if s.value == e.event_type => ()
              case Some(s) =>
                closed ::= Scd2Out(userId, s.value,
                  new Timestamp(s.since), new Timestamp(e.ts.getTime))
                cur = Some(Scd2State(e.event_type, e.ts.getTime))
              case None =>
                cur = Some(Scd2State(e.event_type, e.ts.getTime))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  final case class EwmaState(
      n: Long, lastTs: Long, lastOrd: Long, lastVal: Double, ewma: Double)

  final case class EwmaOut(
      user_id: Long, n_events: Long, last_val: Double, ewma: Double)

  /** Streaming twin of the batch [[graft.ops.Ewma.ewma]]: O(1) state
    * per key (the running smoothed value — EWMA is the canonical
    * streamable statistic), emitting each key's current
    * `(n_events, last_val, ewma)` every micro-batch in update mode.
    *
    * Within a micro-batch rows fold in `(ts, event_id)` order, so
    * stream ≡ batch whenever arrival respects event time at
    * micro-batch granularity (StreamsSpec pins it). A row arriving
    * LATE — after a later-timestamped row already folded — is folded
    * at arrival position instead of its event-time slot: the standard
    * streaming-EWMA compromise (an exact repair would need the full
    * history the batch operator has). State never needs a watermark
    * to stay bounded per key; pair with a timeout-based evictor if
    * the KEY space itself is unbounded.
    */
  def ewmaStream(
      events: Dataset[EventRow], alpha: Double,
  ): Dataset[EwmaOut] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha must be in (0, 1]")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[EwmaState, EwmaOut](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[EwmaState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = sorted.foldLeft(state.getOption) {
            case (None, e) =>
              Some(EwmaState(1L, e.ts.getTime, e.event_id, e.value, e.value))
            case (Some(s), e) =>
              Some(EwmaState(s.n + 1, e.ts.getTime, e.event_id, e.value,
                alpha * e.value + (1.0 - alpha) * s.ewma))
          }
          next.foreach(state.update)
          val s = next.get
          EwmaOut(userId, s.n, s.lastVal, s.ewma)
      }
  }
}
