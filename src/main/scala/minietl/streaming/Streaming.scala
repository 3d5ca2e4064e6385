package minietl.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface.
  *
  * The reference's "streaming" is bounded chunked iteration (SURVEY §1.1);
  * its only unbounded-looking pieces are `StatefulAggTransformer` (cross-
  * chunk partial aggregation, mini_etl/components/transformers.py:381-519)
  * and the cron/interval `Scheduler` re-running a bounded pipeline
  * (core/scheduler.py:152-349). Their honest Spark analogs:
  *
  *  - StatefulAggTransformer → streaming `groupBy().agg()` (partial→final
  *    merge handled by the engine) or [[runningGroupAgg]] when the
  *    incremental per-group state itself is the product;
  *  - Scheduler intervals → `Trigger.ProcessingTime`; a "run every N then
  *    exit" batch-refresh job → `Trigger.AvailableNow`;
  *  - per-chunk callbacks → `foreachBatch`.
  *
  * Everything here is a thin, typed veneer over those primitives so a
  * pipeline built from `minietl.ops` stages can be re-bound to an unbounded
  * source unchanged (`DataFrame => DataFrame` stages apply verbatim).
  */
object Streaming {

  private def aggColumns(aggs: Map[String, Seq[String]]) = {
    val aggCols = for { (c, fns) <- aggs.toSeq.sortBy(_._1); fn <- fns }
      yield minietl.ops.Ops.aggFn(fn, c).as(s"${c}_${fn.toLowerCase}")
    require(aggCols.nonEmpty, "empty aggregation spec")
    aggCols
  }

  /** Event-time tumbling-window aggregation with a watermark — the standard
    * unbounded replacement for the reference's whole-input GroupAgg. Late
    * rows beyond `watermarkDelay` are dropped and their windows finalized.
    */
  def tumblingAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      keys: Seq[String],
      aggs: Map[String, Seq[String]]): DataFrame =
    tumblingAggWatermarked(df.withWatermark(tsCol, watermarkDelay),
      tsCol, windowDuration, keys, aggs)

  /** [[tumblingAgg]] for a frame whose watermark the CALLER already set —
    * required when composing multiple stateful stages on one stream
    * (Spark rejects redefining the watermark mid-plan): apply
    * `withWatermark` once at the source, then chain watermarked variants.
    */
  def tumblingAggWatermarked(
      df: DataFrame, tsCol: String, windowDuration: String,
      keys: Seq[String], aggs: Map[String, Seq[String]]): DataFrame = {
    val aggCols = aggColumns(aggs)
    df.groupBy(window(col(tsCol), windowDuration) +: keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Incrementally-maintained per-group aggregate state. */
  final case class GroupAggState(
      key: String, count: Long, sum: Double, min: Double, max: Double) {
    def mean: Double = if (count == 0) 0.0 else sum / count
  }

  /** The direct streaming analog of the reference's StatefulAggTransformer:
    * per-key running count/sum/min/max (mean derived), updated per
    * micro-batch via mapGroupsWithState. State lives in the state store
    * (checkpointed, partitioned by key) — the distributed version of the
    * reference's driver-held `_state` dict (transformers.py:420-435).
    */
  def runningGroupAgg(
      df: DataFrame, keyCol: String, valueCol: String): Dataset[GroupAggState] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[GroupAggState]) =>
          val prev = state.getOption.getOrElse(
            GroupAggState(key, 0L, 0.0, Double.PositiveInfinity, Double.NegativeInfinity))
          val next = rows.foldLeft(prev) { (s, r) =>
            GroupAggState(key, s.count + 1, s.sum + r._2, math.min(s.min, r._2), math.max(s.max, r._2))
          }
          state.update(next)
          next
      }
  }

  /** Event-time SLIDING-window aggregation: like [[tumblingAgg]] but each
    * row lands in windowDuration/slideDuration overlapping windows (e.g.
    * 10-minute windows every 5 minutes). Same watermark/lateness contract.
    */
  def slidingAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      windowDuration: String,
      slideDuration: String,
      keys: Seq[String],
      aggs: Map[String, Seq[String]]): DataFrame =
    slidingAggWatermarked(df.withWatermark(tsCol, watermarkDelay),
      tsCol, windowDuration, slideDuration, keys, aggs)

  /** [[slidingAgg]] on an already-watermarked frame (see
    * [[tumblingAggWatermarked]] for why the split exists).
    */
  def slidingAggWatermarked(
      df: DataFrame, tsCol: String, windowDuration: String, slideDuration: String,
      keys: Seq[String], aggs: Map[String, Seq[String]]): DataFrame = {
    val aggCols = aggColumns(aggs)
    df.groupBy(window(col(tsCol), windowDuration, slideDuration) +: keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** One CLOSED session emitted by [[customSessionize]]: timestamps carried
    * as epoch micros (exact long arithmetic; render with timestamp_micros).
    */
  final case class ClosedSession(
      k: Long, start_us: Long, end_us: Long, n_events: Long, total: Double)

  /** Open-session state for [[customSessionize]] (public: Spark's codegen'd
    * state encoder must construct it from generated code).
    */
  final case class OpenSess(start: Long, last: Long, n: Long, sum: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * fully-programmable sibling of [[sessionAgg]] for session logic
    * `session_window` cannot express (custom close rules, per-session
    * payloads, emit-on-close side effects). A row starts a NEW session when
    * `ts - previous_ts >= gapSeconds`, else extends the open one; a closed
    * session carries (start, end, count, sum).
    *
    * Determinism contract — scoped to WITHIN a micro-batch: rows are
    * buffered and sorted by (ts) per key per batch before folding, so
    * output is independent of arrival order inside a batch (the buffer is
    * bounded by per-key-per-batch volume, not stream history). ACROSS
    * batches the guarantees are the watermark's: `flatMapGroupsWithState`
    * does not auto-drop late input, so rows strictly below the current
    * watermark are dropped HERE (rows AT the watermark are kept — Spark's
    * own late-data boundary for its stateful
    * operators), and an above-watermark row that still arrives out of
    * order relative to the open session extends it with
    * `start = min(start, ts)` / `last = max(last, ts)` — it can therefore
    * widen a session that a single-batch replay would have split, which is
    * the inherent cost of out-of-order arrival under any bounded-state
    * sessionizer. Exact batch parity holds when each key's rows arrive
    * batch-monotonically (e.g. the battery's staged single-batch replay).
    *
    * Flush paths, in preference order:
    *  - rows with `flushCol = true` act as pure time passage: they close a
    *    session whose gap has elapsed but never open one — a deterministic
    *    end-of-stream flush for bounded replays (the battery stages one
    *    sentinel per key past the global max ts);
    *  - otherwise `EventTimeTimeout` fires once the watermark passes
    *    `last + gap` and the open session closes from the timeout callback
    *    (the production path for genuinely unbounded streams).
    */
  def customSessionize(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String, gapSeconds: Long,
                       watermarkDelay: String,
                       flushCol: Option[String] = None): Dataset[ClosedSession] = {
    val spark = df.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val flush = flushCol.map(c => col(c).cast("boolean")).getOrElse(lit(false))
    def us(t: java.sql.Timestamp): Long = t.getTime / 1000 * 1000000L + t.getNanos / 1000
    df.withWatermark(tsCol, watermarkDelay)
      .select(col(keyCol).cast("long").as("k"), col(tsCol).as("ts"),
        col(valueCol).cast("double").as("v"), flush.as("fl"))
      .as[(Long, java.sql.Timestamp, Double, Boolean)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[(Long, java.sql.Timestamp, Double, Boolean)],
         state: GroupState[OpenSess]) =>
          def closed(o: OpenSess) = ClosedSession(key, o.start, o.last, o.n, o.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(closed).iterator
            state.remove()
            out
          } else {
            // flatMapGroupsWithState does NOT auto-drop late input — enforce
            // the watermark contract ourselves so a straggler from a past
            // batch cannot rewind an open session (see docstring)
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val rows = it.filter(r => us(r._2) >= wmUs).toArray.sortBy(r => us(r._2))
            val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
            var open = state.getOption
            rows.foreach { r =>
              val t = us(r._2)
              open match {
                case Some(o) if t - o.last >= gapUs =>
                  out += closed(o)
                  open = if (r._4) None else Some(OpenSess(t, t, 1L, r._3))
                case Some(o) =>
                  // min/max (not o.start/t): an above-watermark row arriving
                  // in a LATER batch can be out of order relative to the
                  // open session; widening is the deterministic merge
                  if (!r._4) open = Some(OpenSess(
                    math.min(o.start, t), math.max(o.last, t), o.n + 1, o.sum + r._3))
                case None =>
                  if (!r._4) open = Some(OpenSess(t, t, 1L, r._3))
              }
            }
            open match {
              case Some(o) =>
                val timeoutMs = (o.last + gapUs) / 1000 + 1
                if (timeoutMs <= state.getCurrentWatermarkMs()) {
                  // gap already elapsed relative to the watermark: close now
                  // (setTimeoutTimestamp would reject a past timestamp)
                  out += closed(o)
                  state.remove()
                } else {
                  state.update(o)
                  state.setTimeoutTimestamp(timeoutMs)
                }
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  /** Event-time SESSION windows: rows gapped less than `gap` merge into one
    * variable-length session per key (the unbounded analog of the batch
    * `Ops.sessionize`). State is per open session in the state store;
    * sessions finalize when the watermark passes their gap.
    */
  def sessionAgg(
      df: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      gap: String,
      keys: Seq[String],
      aggs: Map[String, Seq[String]]): DataFrame =
    sessionAggWatermarked(df.withWatermark(tsCol, watermarkDelay),
      tsCol, gap, keys, aggs)

  /** [[sessionAgg]] on an already-watermarked frame (see
    * [[tumblingAggWatermarked]]).
    */
  def sessionAggWatermarked(
      df: DataFrame, tsCol: String, gap: String,
      keys: Seq[String], aggs: Map[String, Seq[String]]): DataFrame = {
    val aggCols = aggColumns(aggs)
    df.groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Streaming exact dedup on `keys`, bounded by the watermark: duplicates
    * arriving within the watermark delay of each other collapse to the
    * first row; state for a key is dropped once the watermark passes it, so
    * state size tracks the delay window, not the stream's history. The
    * unbounded analog of `Dedup.exact` / `Ops.dedupe(Keep.Any)` for
    * streaming ingest (dedup-at-the-door before the corpus lands).
    */
  def dedupWithinWatermark(
      df: DataFrame, tsCol: String, watermarkDelay: String,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dedup needs at least one key column")
    dedupWatermarked(df.withWatermark(tsCol, watermarkDelay), keys)
  }

  /** [[dedupWithinWatermark]] on an already-watermarked frame (see
    * [[tumblingAggWatermarked]]).
    */
  def dedupWatermarked(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dedup needs at least one key column")
    df.dropDuplicatesWithinWatermark(keys)
  }

  /** Dedup-at-the-door against a HISTORICAL corpus: drop every streaming
    * row whose fingerprint already exists in a static fingerprint table —
    * the ingest-time companion of [[dedupWithinWatermark]] (which only sees
    * duplicates inside the watermark window; this sees the accumulated
    * past). A stream-static LEFT ANTI join: the static side needs no state
    * store and no watermark — Spark re-plans it per micro-batch, so at
    * scale the fingerprint table should be a broadcast-sized digest or a
    * bucketed table, not raw history.
    */
  def dedupAgainstHistory(stream: DataFrame, historyFp: DataFrame,
                          fpCol: String): DataFrame =
    stream.join(historyFp.select(fpCol).distinct(), Seq(fpCol), "left_anti")

  /** The SELF-MAINTAINING ingest-dedup loop that [[dedupAgainstHistory]]
    * leaves to the caller: per micro-batch, drop rows whose `fpCol`
    * already exists in the parquet digest at `historyDir` (or earlier in
    * the same batch — keep-any, deterministic for byte-identical
    * duplicate payloads), hand the survivors to `sink`, then APPEND their
    * fingerprints to the digest — so the history grows exactly by what
    * was admitted and the next batch dedups against it. foreachBatch runs
    * batches sequentially, so the read-check-append cycle is race-free.
    *
    * Scale notes: the digest holds one row per admitted fingerprint —
    * periodically compact it (or store it bucketed by fpCol) so the
    * per-batch anti-join plans a digest-side scan, not a small-files
    * storm; the anti-join itself is re-planned per batch and broadcasts
    * or shuffles by size as usual.
    *
    * REPLAY SAFETY (exactly-once under crash/restart): the digest is a
    * per-batch-keyed parquet layout (`historyDir/batch=<id>`), and each
    * batch (a) first DELETES its own delta dir — discarding any partial
    * write a crashed prior attempt of the same batchId left behind —
    * then (b) recomputes `fresh` against the committed batches only, and
    * (c) writes its delta with overwrite. A replayed batch therefore
    * reproduces the exact same `fresh` set and converges the digest to
    * the same state no matter where the previous attempt died. The SINK
    * must uphold its half of the contract: it receives `batchId`
    * precisely so it can write idempotently (the standard foreachBatch
    * recipe — e.g. [[batchOutputPath]] + overwrite); an append-only sink
    * degrades to at-least-once for the batch that crashed between the
    * sink write and the digest append. Reading the digest directory
    * yields an extra `batch` partition column — digest consumers should
    * select the fingerprint columns explicitly (this function does).
    */
  def dedupAndRecordHistory(
      stream: DataFrame, fpCol: String, historyDir: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        requireNoCompactionDebris(spark, historyDir)
        dropBatchDelta(spark, historyDir, batchId)
        val hist =
          try spark.read.parquet(historyDir).select(fpCol)
          catch {
            // first batch: no digest yet — empty frame with the right schema
            // (an interrupted compaction cannot masquerade as this case:
            // the debris check above fails first)
            case _: org.apache.spark.sql.AnalysisException => batch.select(fpCol).limit(0)
          }
        // JOIN DIRECTION is the steady-state contract (digest ≫ batch after
        // enough drains): a direct `batch ANTI JOIN digest` can only ever
        // build/broadcast the DIGEST side (anti joins build right), so at
        // steady state it would hash the whole history per batch. Instead the
        // digest is STREAMED once through an inner join whose build side is
        // the (small, distinct) batch fingerprint set, and only the matched
        // fingerprints — bounded by batch size — feed the anti join. The
        // digest is also never `.distinct()`ed here: multiplicity cannot
        // change the matched set, and deduplicating it would shuffle the
        // full history every batch (compaction owns digest hygiene).
        // HistoryJoinDirectionSpec pins the executed plan.
        val batchFps = batch.select(fpCol).where(col(fpCol).isNotNull).distinct()
        val dupFps = hist.join(batchFps, Seq(fpCol)).select(fpCol).distinct()
        val fresh = batch
          .join(dupFps, Seq(fpCol), "left_anti")
          .dropDuplicates(fpCol)
          .persist()
        try {
          sink(fresh, batchId)
          fresh.select(fpCol).write.mode("overwrite")
            .parquet(batchOutputPath(historyDir, batchId))
        } finally { fresh.unpersist(); () }
      }
      .start()

  /** The batchId-keyed subdirectory (`dir/batch=<id>`) used for idempotent
    * per-micro-batch writes — both by the ingest-dedup digests and as the
    * documented recipe for their SINKS: writing each batch's output under
    * this path with overwrite mode makes a replayed batch converge instead
    * of duplicating (Hive-style naming, so reading the parent directory
    * discovers the parts and adds a `batch` partition column).
    */
  def batchOutputPath(dir: String, batchId: Long): String =
    s"${dir.stripSuffix("/")}/batch=$batchId"

  /** Remove a batch's digest delta if a crashed prior attempt of the same
    * batchId left one (possibly partial — a torn parquet file there would
    * otherwise poison the digest read).
    */
  private def dropBatchDelta(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(batchOutputPath(dir, batchId))
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true); ()
  }

  /** The NEAR-duplicate twin of [[dedupAndRecordHistory]]: per
    * micro-batch, (1) drop within-batch near-duplicates with the full
    * verified batch semantics ([[minietl.dedup.Dedup.minhashDedup]]:
    * banded MinHash-LSH candidates, exact-Jaccard ≥ `threshold` verify,
    * keep-min-id), then (2) drop every survivor whose signature collides
    * with the historical BAND DIGEST in any band, hand the remainder to
    * `sink`, and (3) append the admitted documents' (band, key) rows to
    * the digest.
    *
    * `portable = true` swaps the whole hash family to the replayable
    * variants (md5-60-bit shingle hashes, raw-slice band keys —
    * [[minietl.dedup.Dedup.minhashDedupPortable]] /
    * [[minietl.dedup.Dedup.lshBandKeysPortable]]) so an independent SQL
    * engine replays every drain bit-for-bit
    * ([[minietl.dedup.Dedup.nearDupHistoryOracleSql]]); the xxhash64
    * family stays the production default (same plan shape, cheaper
    * hashing, one folded long per band key instead of k/bands lanes).
    *
    * Cross-history check, three `crossBatch` modes — a digest-size vs
    * drop-precision dial; the layouts are not interchangeable, pick a
    * mode per digest and keep it:
    *  - `"collision"` (default): the digest stores 16 bytes per band per
    *    admitted doc, never text or shingles, so a historical match
    *    cannot re-verify similarity. The standard recall/precision dial
    *    of banded LSH: P(collision) ≈ 1-(1-j^r)^b for true Jaccard j
    *    with r = k/bands rows per band; size k/bands so that false drops
    *    (j ≪ threshold colliding anyway) are acceptably rare.
    *  - `"estimate"`: the digest also stores each admitted doc's k-lane
    *    MinHash signature (~k×8 bytes per doc, still never text) under
    *    `historyDir/sigs`, band rows under `historyDir/bands`; band
    *    collisions only nominate candidates and the drop requires
    *    minhashEstimate ≥ `threshold` (±O(1/√k)), so dissimilar docs
    *    cannot false-drop on an unlucky bucket — but the estimator can
    *    still mis-rank a pair whose true Jaccard sits within the
    *    estimator error of the threshold.
    *  - `"exact"`: the digest stores each admitted doc's sorted distinct
    *    shingle HASHES (~8 bytes per shingle, still never text) under
    *    `historyDir/shingles`; nominated candidates are re-verified with
    *    exact Jaccard over the hash sets — the identical decision rule
    *    the within-batch pass applies, at the price of the largest
    *    digest of the three.
    * Within-batch semantics stay exact in every mode.
    *
    * Scale shape per batch: signature + banding are scan-side; one
    * shuffle for the within-batch bucket self-join; the history check is
    * a (band, key) semi-join against the digest (broadcast or shuffled by
    * size); digest growth is bands × admitted rows. Compact the digest
    * between drains with [[compactHistoryCols]]. foreachBatch runs
    * batches sequentially, so read-check-append is race-free.
    *
    * REPLAY SAFETY: same contract as [[dedupAndRecordHistory]] — every
    * digest dir (flat band digest, or bands + sigs/shingles in the
    * verified modes) is written as batchId-keyed deltas (`…/batch=<id>`,
    * delete-then-overwrite), so a crashed batch replays to the identical admitted
    * set and digest state; the sink receives `batchId` and must write
    * idempotently by it ([[batchOutputPath]]) for end-to-end
    * exactly-once.
    */
  def nearDupDedupAndRecordHistory(
      stream: DataFrame, idCol: String, textCol: String,
      historyDir: String, checkpoint: String,
      shingleN: Int = 3, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8,
      crossBatch: String = "collision",
      portable: Boolean = false,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("collision", "estimate", "exact")(crossBatch),
      s"crossBatch must be collision, estimate or exact, got '$crossBatch'")
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verified = crossBatch != "collision"
        val exact = crossBatch == "exact"
        val bandsDir = s"$historyDir/bands"
        val payloadDir = if (exact) s"$historyDir/shingles" else s"$historyDir/sigs"
        requireNoCompactionDebris(spark, historyDir)
        if (verified) {
          requireNoCompactionDebris(spark, bandsDir)
          requireNoCompactionDebris(spark, payloadDir)
          dropBatchDelta(spark, bandsDir, batchId)
          dropBatchDelta(spark, payloadDir, batchId)
        } else dropBatchDelta(spark, historyDir, batchId)
        import minietl.dedup.Dedup
        // ONE signature computation per batch (guide §1.2 — don't compute
        // things twice): the (id, hsh, sig) base is persisted once and
        // feeds BOTH the within-batch dedup pass and the digest
        // banding/payloads. The previous shape recomputed the shingle
        // hashes + k-lane signature from the text a second time for the
        // digest bands (and a third time for the "exact" payload) — at the
        // portable md5 family that hashing is the dominant per-batch
        // compute. Values are identical by construction (same text, same
        // hash family, same k/seed), so the admitted set and digest are
        // byte-identical; seed stays the dedup pass's own default so the
        // digest bands are the family the within-batch pass used.
        val base = Dedup.minhashBase(batch, textCol, idCol, shingleN, k,
          seed = 42L, portable).persist()
        // (1) within-batch: full verified near-dup semantics. `portable`
        // swaps the whole hash family to the md5-60-bit / slice-band
        // variants so an independent engine can replay the ENTIRE loop —
        // Dedup.nearDupHistoryOracleSql generates that SQL, and
        // q_stream_neardup_history hash-gates it per round.
        val dupWithin = Dedup.minhashPairsFromSigBase(
            base, bands, k, threshold, Dedup.DefaultMaxBucket, portable)
          .select(col("id_b").as("__dup")).distinct()
        val withinDeduped = batch
          .join(dupWithin, batch(idCol) === col("__dup"), "left_anti")
        // (id, band, key) of ALL batch docs (slim proxy rows off the cached
        // base — recomputing the explode is cheap; the hashing is not);
        // survivors filter by semi-join where needed
        val bandsAll = Dedup.bandRows(base, bands, k, portable)
        val survivorBands = bandsAll
          .join(withinDeduped.select(col(idCol).as("id")), Seq("id"), "left_semi")
          .select(col("id").as("__id"), col("band"), col("key"))
        try {
          def emptyLike(df: DataFrame): DataFrame = df.limit(0)
          if (!verified) {
            // collision mode: digest = flat (band, key); any-band collision
            // with history drops the row (see scaladoc dial)
            val hist =
              try spark.read.parquet(historyDir).select("band", "key")
              catch {
                case _: org.apache.spark.sql.AnalysisException =>
                  emptyLike(survivorBands.select("band", "key"))
              }
            // digest STREAMED, batch bands built (same join-direction
            // contract as dedupAndRecordHistory — a semi join with the
            // digest on the right could only build the digest side, and a
            // digest-side distinct would shuffle the whole history per
            // batch; the inner join's matched rows are bounded by
            // batch bands × collisions, then collapsed to ids)
            val dupIds = hist
              .join(survivorBands, Seq("band", "key"))
              .select("__id").distinct()
            val fresh = withinDeduped
              .join(dupIds, withinDeduped(idCol) === dupIds("__id"), "left_anti")
              .persist()
            try {
              sink(fresh, batchId)
              bandsAll
                .join(fresh.select(col(idCol).as("id")), Seq("id"), "left_semi")
                .select("band", "key")
                .write.mode("overwrite")
                .parquet(batchOutputPath(historyDir, batchId))
            } finally { fresh.unpersist(); () }
          } else {
            // VERIFIED modes: digest = $historyDir/bands (band, key, id) +
            // one per-doc payload table. Band collisions only NOMINATE
            // candidates; the drop decision re-checks similarity against
            // the payload — minhashEstimate ≥ threshold over the k-lane
            // signature ("estimate", ~k×8 B/doc), or exact Jaccard over
            // the sorted shingle-hash set ("exact", ~8 B/shingle, the
            // same decision rule as the within-batch pass) — so an
            // unlucky band collision between dissimilar docs cannot
            // false-drop. Payloads come straight off the cached base: the
            // "exact" shingle-hash set IS base.hsh, the "estimate"
            // signature IS base.sig.
            val payloadCol = if (exact) "sh" else "sig"
            val payload = base.select(col("id"),
              (if (exact) col("hsh") else col("sig")).as("__pay"))
            val histBands =
              try spark.read.parquet(bandsDir)
              catch {
                case _: org.apache.spark.sql.AnalysisException =>
                  emptyLike(survivorBands
                    .select(col("band"), col("key"), col("__id").as("id")))
              }
            val histPayload =
              try spark.read.parquet(payloadDir)
              catch {
                case _: org.apache.spark.sql.AnalysisException =>
                  emptyLike(payload.select(col("id"), col("__pay").as(payloadCol)))
              }
            def similar(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
              if (exact) minietl.functions.vec.jaccardSorted(a, b) >= threshold
              else Dedup.minhashEstimate(a, b) >= threshold
            // digest bands on the STREAMED side, batch bands on the build
            // side (join-direction contract, as in collision mode)
            val cand = histBands
              .join(survivorBands, Seq("band", "key"))
              .select(col("__id"), col("id").as("__hist_id")).distinct()
            val dupIds = cand
              .join(payload.select(col("id").as("__id"), col("__pay")), "__id")
              .join(histPayload.select(col("id").as("__hist_id"),
                col(payloadCol).as("__hist_pay")), "__hist_id")
              .where(similar(col("__pay"), col("__hist_pay")))
              .select("__id").distinct()
            val fresh = withinDeduped
              .join(dupIds, withinDeduped(idCol) === dupIds("__id"), "left_anti")
              .persist()
            try {
              sink(fresh, batchId)
              bandsAll
                .join(fresh.select(col(idCol).as("id")), Seq("id"), "left_semi")
                .select(col("band"), col("key"), col("id"))
                .write.mode("overwrite").parquet(batchOutputPath(bandsDir, batchId))
              payload
                .join(fresh.select(col(idCol).as("id")), Seq("id"), "left_semi")
                .select(col("id"), col("__pay").as(payloadCol))
                .write.mode("overwrite").parquet(batchOutputPath(payloadDir, batchId))
            } finally { fresh.unpersist(); () }
          }
        } finally { base.unpersist(); () }
      }
      .start()
  }

  /** Perceptual-hash INGEST-DEDUP loop over binary media (VERDICT r15
    * Next #6) — the media twin of [[dedupAndRecordHistory]] /
    * [[nearDupDedupAndRecordHistory]]: per micro-batch, hash every payload
    * through the REAL decoder (`kind` = "image" → dHash56, "audio" →
    * energy-contour-56), drop rows whose hash duplicates the parquet
    * digest at `historyDir` — equality at `maxDist` 0, banded Hamming at
    * 1..3, VERIFIED against the digest's stored 8-byte hashes, so unlike
    * minhash collision mode a band collision alone can never false-drop —
    * or an earlier row of the same batch (within-batch semantics =
    * [[minietl.multimodal.PerceptualHash.dedupNearFromHashes]]'s exact
    * groups → banded pairs → transitive components, canonical = minimum
    * id). Survivors go to `sink`, then their digest rows are appended so
    * the next batch dedups against them. Undecodable payloads (null hash)
    * are always admitted and never recorded — a dedup stage must not drop
    * what it cannot read.
    *
    * Digest: 4 × 16-byte (band, key, hash) rows per admitted row (near
    * mode) or one 8-byte hash (exact mode) — never payload bytes; the full
    * hash rides along precisely because it IS the similarity object, which
    * buys exact verification at collision-mode digest prices. Compact
    * between drains with [[compactHistoryCols]]. The history check keeps
    * the streamed-digest/built-batch join direction contract of the text
    * loops. REPLAY SAFETY: the identical batchId-keyed
    * delete-then-overwrite digest contract as [[dedupAndRecordHistory]];
    * the sink receives `batchId` and must write idempotently by it.
    */
  def mediaHashDedupAndRecordHistory(
      stream: DataFrame, idCol: String, contentCol: String, kind: String,
      maxDist: Int, historyDir: String, checkpoint: String,
      maxBucketSize: Int = minietl.dedup.Dedup.DefaultMaxBucket,
      trigger: Trigger = Trigger.AvailableNow())(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    require(Set("image", "audio")(kind), s"kind must be image or audio, got '$kind'")
    require(maxDist >= 0 && maxDist <= 3,
      s"maxDist must be 0 (exact) or 1..3 (4x14-bit banded Hamming), got $maxDist")
    stream.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        requireNoCompactionDebris(spark, historyDir)
        dropBatchDelta(spark, historyDir, batchId)
        import minietl.multimodal.{PerceptualAudio, PerceptualHash}
        val hashFrame =
          if (kind == "image")
            PerceptualHash.dHashFrame(batch, idCol, contentCol)
              .withColumnRenamed("dhash", "__mh")
          else
            PerceptualAudio.energyHashFrame(batch, idCol, contentCol)
              .withColumnRenamed("ahash", "__mh")
        val withHash = batch.join(hashFrame, Seq(idCol)).persist()
        def bandsOf(df: DataFrame): DataFrame = df
          .where(col("__mh").isNotNull)
          .select(col(idCol).as("__id"), col("__mh"),
            explode(sequence(lit(0), lit(3))).as("__b"))
          .withColumn("key", expr("shiftright(__mh, 14 * __b) & 16383"))
          .select(col("__id"), col("__mh"), col("__b").as("band"), col("key"))
        try {
          // (1) within-batch: exact groups always; banded pairs + CC at
          // maxDist >= 1 (the shared hash-agnostic fold)
          val within =
            if (maxDist == 0) {
              val keep = withHash.where(col("__mh").isNotNull)
                .groupBy("__mh").agg(min(col(idCol)).as(idCol)).select(idCol)
                .union(withHash.where(col("__mh").isNull).select(idCol))
              withHash.join(keep, Seq(idCol), "left_semi")
            } else PerceptualHash.dedupNearFromHashes(withHash, idCol,
              withHash.select(col(idCol), col("__mh")), "__mh", maxDist,
              maxBucketSize)
          // (2) cross-history: digest streamed, batch built
          def emptyDigest(cols: DataFrame): DataFrame = cols.limit(0)
          val dupIds =
            if (maxDist == 0) {
              val hist =
                try spark.read.parquet(historyDir).select("hash")
                catch {
                  case _: org.apache.spark.sql.AnalysisException =>
                    emptyDigest(withHash.select(col("__mh").as("hash")))
                }
              hist.join(
                within.where(col("__mh").isNotNull)
                  .select(col(idCol).as("__id"), col("__mh").as("hash")),
                Seq("hash")).select("__id").distinct()
            } else {
              val hist =
                try spark.read.parquet(historyDir).select("band", "key", "hash")
                catch {
                  case _: org.apache.spark.sql.AnalysisException =>
                    emptyDigest(bandsOf(withHash)
                      .select(col("band"), col("key"), col("__mh").as("hash")))
                }
              hist.join(bandsOf(within), Seq("band", "key"))
                .where(expr(s"bit_count(hash ^ __mh) <= $maxDist"))
                .select("__id").distinct()
            }
          val fresh = within
            .join(dupIds, within(idCol) === dupIds("__id"), "left_anti")
            .persist()
          try {
            sink(fresh.drop("__mh"), batchId)
            val digestRows =
              if (maxDist == 0)
                fresh.where(col("__mh").isNotNull).select(col("__mh").as("hash"))
              else bandsOf(fresh)
                .select(col("band"), col("key"), col("__mh").as("hash"))
            digestRows.write.mode("overwrite")
              .parquet(batchOutputPath(historyDir, batchId))
          } finally { fresh.unpersist(); () }
        } finally { withHash.unpersist(); () }
      }
      .start()
  }

  /** Maintenance companion of [[dedupAndRecordHistory]]: rewrite the
    * fingerprint digest as one deduplicated, right-sized parquet set.
    * Every drained micro-batch appends a file, so a long-lived loop turns
    * the digest into a small-files storm that each batch's anti-join then
    * pays to list and scan — compaction collapses it to
    * `ceil(n / rowsPerPartition)` files. SINGLE-WRITER contract: run
    * between drains, never concurrently with an active ingest query (the
    * swap is delete-then-rename, and a concurrent append would be lost) —
    * and only after the previous drain TERMINATED GRACEFULLY: compacting
    * while a crashed query still has an unreplayed batch would absorb
    * that batch's delta into the merged set, so the replay would see its
    * own fingerprints as history and hand the sink an empty batch.
    * The compacted set lands under `batch=-1` to keep the digest's
    * batchId-keyed partition layout uniform. Returns the digest's
    * distinct-fingerprint count.
    */
  def compactHistory(spark: SparkSession, historyDir: String, fpCol: String,
                     rowsPerPartition: Long = 4000000L): Long =
    compactHistoryCols(spark, historyDir, Seq(fpCol), rowsPerPartition)

  /** [[compactHistory]] for multi-column digests (e.g. the (band, key)
    * digest of [[nearDupDedupAndRecordHistory]]).
    */
  def compactHistoryCols(spark: SparkSession, historyDir: String, fpCols: Seq[String],
                         rowsPerPartition: Long = 4000000L): Long = {
    require(rowsPerPartition > 0, "rowsPerPartition must be positive")
    require(fpCols.nonEmpty, "need at least one digest column")
    val distinctFps = spark.read.parquet(historyDir)
      .select(fpCols.map(col): _*).distinct()
    val n = distinctFps.count()
    val parts = math.max(1L, (n + rowsPerPartition - 1) / rowsPerPartition).toInt
    val tmp = historyDir.stripSuffix("/") + "__compact_tmp"
    val old = historyDir.stripSuffix("/") + "__compact_old"
    // batch=-1 keeps the layout partition-uniform with the per-batch deltas
    // (mixing bare files and batch= dirs would break partition discovery)
    distinctFps.repartition(parts).write.mode("overwrite")
      .parquet(batchOutputPath(tmp, -1L))
    val conf = spark.sessionState.newHadoopConf()
    val histPath = new org.apache.hadoop.fs.Path(historyDir)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(old)
    val fs = histPath.getFileSystem(conf)
    // recoverable swap: old digest is moved ASIDE (not deleted) before the
    // compacted set moves in, so no failure leaves the loop digest-less —
    // a missing digest would make the next drain re-admit everything as
    // "first batch" (dedupAndRecordHistory refuses to run while either
    // marker dir exists, so a half-swap is caught, not silently absorbed)
    fs.delete(oldPath, true)
    if (!fs.rename(histPath, oldPath))
      throw new java.io.IOException(
        s"compaction: could not move $historyDir aside to $old; digest untouched")
    if (!fs.rename(tmpPath, histPath)) {
      fs.rename(oldPath, histPath) // roll back
      throw new java.io.IOException(
        s"compaction: could not move $tmp into place; original digest restored")
    }
    fs.delete(oldPath, true)
    n
  }

  /** Throw if a digest path has compaction marker siblings — evidence of
    * an interrupted [[compactHistory]] swap that must be resolved by hand
    * (restore `__compact_old` or promote `__compact_tmp`) before more
    * batches are admitted against a possibly-partial digest.
    */
  private[minietl] def requireNoCompactionDebris(
      spark: SparkSession, historyDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    Seq("__compact_tmp", "__compact_old").foreach { sfx =>
      val p = new org.apache.hadoop.fs.Path(historyDir.stripSuffix("/") + sfx)
      if (p.getFileSystem(conf).exists(p))
        throw new IllegalStateException(
          s"ingest-dedup digest $historyDir has a leftover compaction dir " +
            s"($p) from an interrupted compactHistory swap — resolve it " +
            "before draining, or the loop may dedup against a partial digest")
    }
  }

  /** Stream-stream inner equi-join bounded by an event-time interval: a
    * right row matches a left row with the same keys when its timestamp is
    * within [leftTs - lookback, leftTs + lookahead]. Both sides carry
    * watermarks, so join state for either side is dropped once the
    * watermark passes the interval bound — state size tracks the interval
    * and the delay, not stream history; this is the unbounded analog of the
    * batch `Joins.rangeJoin`/`Joins.asof` family (clickstream enrichment at
    * ingest). Timestamp columns must be named differently on the two sides
    * (Spark's stream-stream join needs the range condition to reference
    * both by name).
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String],
      leftTs: String, rightTs: String,
      watermarkDelay: String,
      lookback: String, lookahead: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    require(leftTs != rightTs,
      "leftTs and rightTs must be distinct column names (the range " +
        "predicate references both sides)")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val range =
      r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $lookahead")
    val joined = l.join(r, keyCond && range, "inner")
    // drop the right-side duplicate key columns (equi-join keys are equal)
    keys.foldLeft(joined)((df, k) => df.drop(r(k)))
  }

  /** Reference Scheduler intervals ("30s", "5m", "2h", "1d" —
    * core/scheduler.py:110-149) → a processing-time trigger.
    */
  def intervalTrigger(interval: String): Trigger =
    Trigger.ProcessingTime(minietl.scheduler.IntervalParser.toMillis(interval),
      java.util.concurrent.TimeUnit.MILLISECONDS)

  /** "Catch up on everything then stop" — the analog of one scheduled
    * bounded pipeline run.
    */
  def availableNowTrigger: Trigger = Trigger.AvailableNow()

  /** Per-micro-batch callback sink (the reference's CallbackLoader /
    * per-chunk callback analog). Returns a started query; callers manage
    * lifecycle.
    */
  def foreachBatchSink(
      df: DataFrame,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime(0L, java.util.concurrent.TimeUnit.MILLISECONDS),
      outputMode: OutputMode = OutputMode.Update())(
      f: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(f)
      .start()

  /** File-stream source: the unbounded version of the batch readers — new
    * files appearing under `path` become micro-batches.
    */
  def fileStream(spark: SparkSession, format: String, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).format(format).load(path)
}
