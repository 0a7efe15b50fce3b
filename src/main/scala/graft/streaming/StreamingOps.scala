package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.10 extension): the same
  * filter/agg operators the batch engine exposes, over an event
  * stream with event-time semantics.
  *
  * Design: transforms are written against an unbounded DataFrame —
  * identical code path batch vs stream (`readStream` swaps in). At
  * scale: watermarking bounds state; the windowed aggregate shuffles
  * once on (window, key); state lives in the default HDFS-backed /
  * RocksDB state store.
  */
object StreamingOps {

  /** Schema of the events table as a stream source under the
    * TIMESTAMP(NANOS) testdata generation (ts as long nanos — see
    * nanosAsLong note in [[graft.GraftSession]]). [[readEventStream]]
    * no longer hard-codes it: it infers the schema from the files, so
    * both the nanos-long and timestamp[us] generations stream. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Event-time timestamp column, dtype-adaptive (nanos-long and
    * timestamp[us] testdata generations both occur — see
    * [[graft.Tables.eventTime]]). µs-exact on every dtype: the
    * nanos-long branch uses integer `div`, not `/` (IEEE double
    * division of epoch nanos > 2^53 can land 1 µs off, which breaks
    * µs-exact oracle comparisons (q_stream_join) and could flip an
    * event sitting exactly on a window boundary). */
  def tsCol(df: DataFrame, c: String = "ts") =
    graft.Tables.eventTime(df, c).as("event_time")

  /** Tumbling-window counts+sums per event_type with a watermark for
    * late data. Works on a batch OR streaming DataFrame. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", tsCol(events))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window counts+sums per event_type: each event lands in
    * `windowLen / slide` overlapping windows. Same batch/stream duality
    * as [[windowedAgg]]; at scale the fan-out factor is the window
    * ratio, applied before the single (window, key) shuffle. */
  def slidingAgg(events: DataFrame, windowLen: String = "2 hours",
                 slide: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", tsCol(events))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native event-time session windows: per-key sessions close after
    * `gap` of inactivity (`session_window` merges state incrementally —
    * the streaming-correct form of [[graft.operators.Windows
    * .sessionize]]'s batch lag/cumsum). Emits one row per closed
    * session: (user_id, session_start, n, sum_value). */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
                       watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("event_time", tsCol(events))
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(28, 6))).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"), col("user_id"),
        col("n"), col("sum_value"))

  /** Stream-stream inner join — the funnel/attribution primitive:
    * attach to every left event the right-side events of the SAME user
    * whose event time falls in `[left, left + within]` (e.g. purchases
    * within the hour after a view). Works on batch OR streaming
    * DataFrames; in streaming BOTH sides carry watermarks and the
    * bounded time-range condition is exactly what lets Spark expire
    * buffered join state (without it, stream-stream state grows
    * forever). Inner matches emit as soon as both sides arrive; state
    * eviction trails by the watermark.
    *
    * Scale shape: the equi-key (user_id) drives the shuffle — the
    * range condition is a post-join filter on co-located rows, never a
    * nested-loop; per-key buffered state is bounded by `within` +
    * `watermark` of traffic. */
  def followWithinJoin(left: DataFrame, right: DataFrame,
                       within: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val l = left
      .withColumn("l_time", tsCol(left, "ts"))
      .withWatermark("l_time", watermark)
      .select(col("user_id"), col("event_id").as("l_event"),
        col("event_type").as("l_type"), col("l_time"))
    val r = right
      .withColumn("r_time", tsCol(right, "ts"))
      .withWatermark("r_time", watermark)
      .select(col("user_id").as("_r_user"), col("event_id").as("r_event"),
        col("event_type").as("r_type"), col("r_time"))
    l.join(r,
      col("user_id") === col("_r_user") &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("l_event"), col("r_event"),
        col("l_type"), col("r_type"), col("l_time"), col("r_time"))
  }

  /** Read the events parquet as a (bounded) stream — used by tests to
    * drive the streaming operators synchronously via the memory sink.
    * Streaming sources need an explicit schema; it is inferred from
    * the files present at start (one driver-side footer read), so the
    * nanos-long and timestamp[us] testdata generations both work. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)

  /** Stateful per-user session counting via `mapGroupsWithState`
    * (SURVEY §2.10: custom state beyond windowed aggs). State = (last
    * event second, sessions so far); a gap > `gapSeconds` opens a new
    * session. Emits one (user_id, n_sessions, n_events) row per user
    * per micro-batch — `update` output mode. State is per-key and
    * bounded (two longs), so it scales to any user cardinality;
    * real deployments add a state timeout for user churn. */
  private[graft] case class SessionState(lastSec: Long, sessions: Long, events: Long)

  /** Streaming exact dedup: drop rows whose content fingerprint was
    * already seen, keyed per fingerprint with `flatMapGroupsWithState`
    * — the streaming face of [[graft.operators.Dedup.applyExact]] for
    * continuous ingestion. First arrival of a fingerprint passes
    * through; every later duplicate is swallowed. State per key is one
    * boolean, so memory is ∝ distinct contents; production deployments
    * put a TTL on it (or run against a compacted batch fingerprint
    * table) to bound state over unbounded streams.
    *
    * Built-in `dropDuplicates` covers the windowed case; this keeps the
    * kept-row choice (arrival order) and the fingerprint function
    * (md5-of-normalized-text) identical to the batch operator so batch
    * and stream agree row-for-row. */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"),
        graft.functions.Text.fingerprintMd5(col(textCol)).as("fp"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          if (state.exists) { rows.foreach(_ => ()); Iterator.empty }
          else {
            // first micro-batch with this fingerprint: keep the min-id
            // row (deterministic, matches Dedup.exact's keep rule)
            val kept = rows.minBy(_._1)
            state.update(true)
            Iterator((kept._1, kept._2))
          }
      }
      .toDF(idCol, textCol)
  }

  /** Bounded-state streaming dedup: drop rows whose content fingerprint
    * was already seen, with state expired by the event-time watermark —
    * the production answer to [[dedupExact]]'s unbounded fingerprint
    * state on an infinite stream. Correct under the standard streaming
    * dedup contract: duplicates are guaranteed dropped only when they
    * arrive within `delay` of the first occurrence's event time, which
    * is the right trade on a 100 TB/day firehose where near-in-time
    * duplicates dominate (cross-epoch dedup belongs to the batch
    * ledger, [[graft.operators.Dedup.applyExactIncremental]]). The kept
    * row is the first ARRIVAL (there is no min-id re-pick within a
    * micro-batch — use [[dedupExact]] for that rule); `eventTimeCol`
    * must already be a timestamp column (see [[tsCol]] for the
    * nanos-long conversion). */
  def dedupExactWatermarked(docs: DataFrame, textCol: String,
                            eventTimeCol: String, delay: String): DataFrame =
    docs
      .withColumn("fp", graft.functions.Text.fingerprintMd5(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Continuous DB load: drive a streaming aggregate into a database
    * table through `foreachBatch` → [[graft.pipelines.IngestionJob
    * .saveTables]] — the production composition of the reference's
    * `ingestion.py` orchestrator (ref `ingestion.py:29-38`) over a
    * live stream instead of batch extracts.
    *
    * Contract: `agg` runs in COMPLETE output mode (each micro-batch
    * carries the full aggregate state) and the writer is replace-mode
    * ([[graft.pipelines.IngestionJob.jdbcWriter]]), so every batch
    * REPLACES the table with the current snapshot — exactly
    * `to_sql(if_exists='replace')` semantics. Batch-id idempotence
    * falls out of that pairing: `foreachBatch` delivers at-least-once
    * (a batch can re-run after failure, same batchId), and a re-run
    * replace writes the identical snapshot instead of appending
    * duplicates. An append-mode writer would need the batchId ledger
    * instead — record it and skip batches already committed. */
  def streamToTable(agg: DataFrame, table: String,
                    writer: (DataFrame, String) => Unit,
                    checkpointDir: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      : org.apache.spark.sql.streaming.StreamingQuery =
    agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.pipelines.IngestionJob.saveTables(Seq(table -> batch), writer)
        ()
      }
      .start()

  /** Continuous NEAR-dup ingestion: the streaming face of
    * [[graft.operators.Dedup.applyMinhashIncremental]]. Each
    * micro-batch is deduped against the PERSISTED MinHash ledger
    * (signatures of every doc kept so far — numHashes longs per doc,
    * the history corpus is never rescanned), survivors' signatures are
    * appended to the ledger, and the kept rows are handed to `emit`.
    * This is the production shape of the batch ledger pipeline
    * (`q_dedup_minhash_inc`): a corpus that ingests continuously keeps
    * ONE ledger across micro-batches instead of re-deriving history.
    *
    * Durability/idempotence under foreachBatch's at-least-once
    * contract: each batch's signatures land in their own
    * `batch=<batchId>` partition dir, written overwrite-mode, and the
    * ledger read EXCLUDES the current batchId — so a re-run of a
    * failed batch (same batchId) neither dedups the batch against its
    * own half-written signatures nor appends them twice. State size is
    * ∝ kept docs × numHashes longs, on disk, not in executor memory —
    * the 100 TB-corpus answer (keyed-store state would pin the whole
    * history signature table into the state backend).
    *
    * `emit` receives the kept rows of each batch (write them to the
    * output table); signature write precedes emit so an emit-side
    * failure re-runs the whole batch cleanly. */
  def dedupMinhashStream(docs: DataFrame, idCol: String, textCol: String,
                         ledgerDir: String, checkpointDir: String,
                         emit: DataFrame => Unit,
                         w: Int = 3, numHashes: Int = 16, bands: Int = 8,
                         threshold: Double = 0.5,
                         trigger: org.apache.spark.sql.streaming.Trigger =
                           org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
                         maintainEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    ledgerStream(docs, ledgerDir, checkpointDir, trigger, emit, maintainEvery)(
      ledgerOf = b => Dedup.minhashLedgerOf(b, idCol, textCol, w, numHashes),
      dedup = (batch, ledger) => Dedup.applyMinhashIncremental(
        batch, idCol, textCol, ledger, w, numHashes, bands, threshold))
  }

  /** Continuous EXACT-dup ingestion: the streaming face of
    * [[graft.operators.Dedup.applyExactIncremental]], with the same
    * per-batch `batch=N` ledger layout, re-run idempotence, and
    * on-disk (not state-store) history as [[dedupMinhashStream]] —
    * the ledger rows are single md5 fingerprints instead of MinHash
    * signatures, so the anti-join shuffles ~32 bytes per historical
    * doc. Within a batch the min-id row per fingerprint is kept. */
  def dedupExactStream(docs: DataFrame, idCol: String, textCol: String,
                       ledgerDir: String, checkpointDir: String,
                       emit: DataFrame => Unit,
                       trigger: org.apache.spark.sql.streaming.Trigger =
                         org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
                       maintainEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Dedup
    ledgerStream(docs, ledgerDir, checkpointDir, trigger, emit, maintainEvery)(
      ledgerOf = b => Dedup.ledgerOf(b, textCol),
      dedup = (batch, ledger) =>
        Dedup.applyExactIncremental(batch, idCol, textCol, ledger))
  }

  /** Shared foreachBatch plumbing of the ledgered dedup streams:
    * dedup each micro-batch against all PRIOR batches' persisted
    * ledger partitions, write the survivors' ledger rows to this
    * batch's own `batch=<batchId>` dir (overwrite-mode + the
    * current-batch exclusion below make a re-run of a failed batch —
    * same batchId under foreachBatch's at-least-once contract —
    * neither dedup the batch against its own half-written rows nor
    * append them twice), then hand the kept rows to `emit`. The
    * signature write precedes emit so an emit-side failure re-runs
    * the whole batch cleanly. History lives on disk, never in the
    * state store — at 100 TB the ledger is a table, not keyed state;
    * long-lived streams periodically fold the closed per-batch dirs
    * with [[compactLedger]] so the history read stays O(few files). */
  private def ledgerStream(docs: DataFrame, ledgerDir: String,
                           checkpointDir: String,
                           trigger: org.apache.spark.sql.streaming.Trigger,
                           emit: DataFrame => Unit,
                           maintainEvery: Int = 0)(
                           ledgerOf: DataFrame => DataFrame,
                           dedup: (DataFrame, DataFrame) => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        // prior batches' ledger dirs — FS-agnostic listing (the ledger
        // can live on any Hadoop-visible store)
        val path = new org.apache.hadoop.fs.Path(ledgerDir)
        val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
        val prior: Seq[String] =
          if (!fs.exists(path)) Nil
          else fs.listStatus(path).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
            .filter(_.getPath.getName != s"batch=$batchId")
            .map(_.getPath.toString)
        // checkpoint/ledger coherence guard (r12 ADVICE): a fresh
        // checkpoint dir restarts batchIds at 0 — against a REUSED
        // ledger, the overwrite below would silently destroy the old
        // batch=0 partition while later batch=N dirs still count as
        // history (a corrupted half-old ledger). History covering ids
        // at or above the current batch can only mean that mismatch:
        // fail fast instead. (Plain batch=<batchId> itself is the
        // legitimate re-run-of-a-failed-batch case and is excluded
        // above; compacted dirs never cover a re-runnable batch.)
        val covered = prior.flatMap { p =>
          new org.apache.hadoop.fs.Path(p).getName match {
            case LedgerPlain(n)              => Some(n.toLong)
            case LedgerCompacted(_, hi, _)   => Some(hi.toLong)
            case _                           => None
          }
        }
        if (covered.nonEmpty && covered.max >= batchId)
          throw new IllegalStateException(
            s"ledger at $ledgerDir already covers batch=${covered.max} >= " +
              s"current batch $batchId: the checkpoint was reset without " +
              "resetting the ledger — ledgerDir and checkpointDir must be " +
              "reset (or kept) together")
        val ledger =
          if (prior.isEmpty) ledgerOf(batch.limit(0)) // typed-empty
          else s.read.parquet(prior: _*)
        val kept = dedup(batch, ledger)
          .localCheckpoint() // consumed twice: ledger write + emit
        ledgerOf(kept)
          .write.mode("overwrite").parquet(s"$ledgerDir/batch=$batchId")
        emit(kept)
        // auto-maintenance (round 14): fold the closed per-batch dirs
        // every `maintainEvery` batches so a long-lived stream's
        // ledger read stays O(few dirs) WITHOUT an operator having to
        // remember compactLedger. Placement AFTER emit: the data path
        // never waits on maintenance, and a crash anywhere re-runs the
        // batch into an idempotent compaction (tmp+rename). Safety:
        // upToBatch = batchId − 1 only covers batches already
        // committed by the checkpoint (foreachBatch re-runs at most
        // the CURRENT uncommitted id), so a re-run of batch N still
        // sees exactly the pre-N history in consolidated form.
        if (maintainEvery > 0 && batchId > 0 && batchId % maintainEvery == 0)
          compactLedger(s, ledgerDir, upToBatch = batchId - 1)
        ()
      }
      .start()

  // ledger partition-dir names: one plain dir per micro-batch, plus
  // consolidated dirs from compaction runs (the -g<gen> suffix keeps
  // successive compactions from colliding). Both start with "batch="
  // so the ledger read above picks them up unchanged.
  private val LedgerPlain = "batch=(\\d+)".r
  private val LedgerCompacted = "batch=(\\d+)-(\\d+)-g(\\d+)".r

  /** Compact the ledger's one-directory-per-batch layout: fold every
    * plain `batch=N` (and previously consolidated) partition with
    * covered ids ≤ `upToBatch` into ONE consolidated
    * `batch=<lo>-<hi>-g<gen>` directory of `targetFiles` files.
    * Without this, a long-lived ingestion stream's ledger read lists
    * one tiny directory per micro-batch forever (10⁵ batches = 10⁵
    * dirs of small files) — the r12 operational gap.
    *
    * Safety contract: `upToBatch` must only cover batches that can
    * never re-run — anything when the stream is stopped, or ids
    * strictly below the last COMMITTED batch while it runs
    * (foreachBatch re-runs at most the last uncommitted id). The
    * current-batch-exclusion idempotence rule is untouched: a
    * consolidated dir never carries a re-runnable batch's rows, so a
    * re-run of batch N still sees exactly the pre-N history.
    *
    * Crash safety: the consolidated dir is written to a `_compacting`
    * temp (invisible to the ledger read), PUBLISHED by rename, and
    * only then are the source dirs deleted — a crash at any point
    * leaves the ledger a SUPERSET of history, which dedup semantics
    * absorb (set membership: duplicate fingerprints/signatures
    * exclude the same docs), and a re-run of the compaction converges
    * (sources are re-folded with `distinct()`).
    *
    * Returns the number of source directories folded (0 = nothing to
    * do). */
  def compactLedger(spark: SparkSession, ledgerDir: String, upToBatch: Long,
                    targetFiles: Int = 1): Int = {
    require(targetFiles > 0, s"need targetFiles > 0, got $targetFiles")
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val dirs = fs.listStatus(root).toSeq.filter(_.isDirectory).map(_.getPath)
    // (name, coveredLo, coveredHi, gen) for every ledger partition dir
    val parsed = dirs.flatMap { p =>
      p.getName match {
        case LedgerPlain(n)             => Some((p, n.toLong, n.toLong, 0L))
        case LedgerCompacted(lo, hi, g) => Some((p, lo.toLong, hi.toLong, g.toLong))
        case _                          => None
      }
    }
    val sources = parsed.filter(_._3 <= upToBatch)
    if (sources.size <= 1) return 0
    val lo = sources.map(_._2).min
    val hi = sources.map(_._3).max
    val gen = parsed.map(_._4).max + 1
    val tmp = new org.apache.hadoop.fs.Path(root, "_compacting")
    fs.delete(tmp, true) // stray temp from a crashed pass
    spark.read.parquet(sources.map(_._1.toString): _*)
      .distinct() // absorbs duplicates a crashed prior pass left behind
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val published = new org.apache.hadoop.fs.Path(root, s"batch=$lo-$hi-g$gen")
    if (!fs.rename(tmp, published))
      throw new java.io.IOException(s"compactLedger: rename $tmp -> $published failed")
    sources.foreach(s => fs.delete(s._1, true))
    sources.size
  }

  // state snapshot dirs: one full per-key state table per micro-batch
  private val StateSnap = "state=(\\d+)".r

  /** Streaming incremental aggregate maintenance — the streaming face
    * of [[graft.operators.Sketches]]: each micro-batch folds into a
    * maintained per-key state table (count, decimal-exact sum,
    * min/max, HLL distinct sketch) via `Sketches.updateState`, and the
    * updated RENDERED state is handed to `emit`. Unlike the dedup
    * ledger (append-only history), aggregate state REPLACES itself, so
    * each batch writes a full `state=<batchId>` snapshot (tiny — one
    * row per key) and reads only the LATEST prior snapshot; raw
    * history is never rescanned. Re-run idempotence mirrors the
    * ledger: a re-run of batch N ignores its own half-written
    * `state=N` dir and rebuilds it from `state=<N−1>` + the batch.
    * Old snapshots are time-travel; bound them with
    * [[pruneStateSnapshots]], or set `maintainEvery` > 0 to have the
    * stream prune itself every that-many batches (keepLastN = 2 — the
    * minimum that keeps a re-runnable batch's predecessor, see the
    * pruner's contract). Fails fast when a fresh checkpoint reuses an
    * old state dir (same coherence guard as the ledger), INCLUDING
    * the orphaned-snapshot case: batchId > 0 with its own `state=N`
    * dir present but NO prior snapshot means history was lost (an
    * over-eager prune or a mixed-up dir) — rebuilding state from the
    * batch alone would silently discard everything accumulated. */
  def aggStateStream(rows: DataFrame, keyCols: Seq[String], valCol: String,
                     ndCol: String, stateDir: String, checkpointDir: String,
                     emit: DataFrame => Unit,
                     trigger: org.apache.spark.sql.streaming.Trigger =
                       org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
                     maintainEvery: Int = 0,
                     fullState: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.Sketches
        val s = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(stateDir)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val snaps: Seq[Long] =
          if (!fs.exists(root)) Nil
          else fs.listStatus(root).toSeq.filter(_.isDirectory)
            .flatMap(_.getPath.getName match {
              case StateSnap(n) => Some(n.toLong)
              case _            => None
            })
        if (snaps.exists(_ > batchId))
          throw new IllegalStateException(
            s"state dir $stateDir already holds state=${snaps.max} > " +
              s"current batch $batchId: the checkpoint was reset without " +
              "resetting the state dir — stateDir and checkpointDir must " +
              "be reset (or kept) together")
        val prior = snaps.filter(_ < batchId) // own dir = failed re-run
        // orphaned-snapshot guard (r13 ADVICE): a re-run of batch N>0
        // whose OWN snapshot survived while every predecessor is gone
        // (a keepLastN=1-style prune raced a failed batch) must not
        // quietly rebuild state from this batch alone — that discards
        // all accumulated history. Fail fast; the operator restores a
        // predecessor snapshot or resets state+checkpoint together.
        if (batchId > 0 && prior.isEmpty && snaps.contains(batchId))
          throw new IllegalStateException(
            s"state dir $stateDir holds state=$batchId but no prior " +
              s"snapshot: batch $batchId is re-running after its " +
              "predecessors were pruned — history would be silently " +
              "lost. Restore a prior snapshot or reset stateDir and " +
              "checkpointDir together")
        // same loss, other shape (r15): the checkpoint says batches
        // 0..batchId-1 already ran, but NO snapshot survives at all
        // (an over-prune or external wipe also took state=batchId) —
        // falling through would quietly rebuild state from this batch
        // alone, discarding all accumulated history
        if (batchId > 0 && snaps.isEmpty)
          throw new IllegalStateException(
            s"state dir $stateDir is empty but the checkpoint is at " +
              s"batch $batchId: accumulated state was wiped outside " +
              "the stream — restore a snapshot or reset stateDir and " +
              "checkpointDir together")
        // fullState: the r14 combined row (count/sum/extremes + HLL +
        // KLL + theta) instead of the HLL-only state — same snapshot
        // lifecycle, one reduction per batch either way
        val next = (prior.isEmpty, fullState) match {
          case (true, false)  => Sketches.aggState(batch, keyCols, valCol, ndCol)
          case (true, true)   => Sketches.aggStateFull(batch, keyCols, valCol, ndCol)
          case (false, false) => Sketches.updateState(
            s.read.parquet(s"$stateDir/state=${prior.max}"),
            batch, keyCols, valCol, ndCol)
          case (false, true)  => Sketches.updateStateFull(
            s.read.parquet(s"$stateDir/state=${prior.max}"),
            batch, keyCols, valCol, ndCol)
        }
        val staged = next.localCheckpoint() // consumed twice: write + emit
        staged.write.mode("overwrite").parquet(s"$stateDir/state=$batchId")
        emit(if (fullState) Sketches.readStateFull(staged)
             else Sketches.readState(staged))
        // auto-maintenance (round 14), after emit so the data path
        // never waits: keepLastN = 2 keeps this snapshot AND its
        // predecessor, so a re-run of the NEXT batch always finds
        // prior state even mid-prune
        if (maintainEvery > 0 && batchId % maintainEvery == 0)
          pruneStateSnapshots(s, stateDir, keepLastN = 2)
        ()
      }
      .start()

  /** Drop all but the newest `keepLastN` state snapshots — the
    * maintenance pass bounding [[aggStateStream]]'s one-dir-per-batch
    * time-travel history. Safe while the stream runs because
    * keepLastN ≥ 2 is REQUIRED (r13 ADVICE): if batch N fails after
    * writing its own `state=N` snapshot, keepLastN = 1 would keep only
    * `state=N` — which N's re-run must ignore (prior = snaps < N), so
    * the re-run would silently rebuild from the batch alone and drop
    * all history. Keeping ≥ 2 guarantees a re-runnable batch's
    * predecessor survives every prune; [[aggStateStream]] additionally
    * fails fast on the orphaned-snapshot state should it ever arise.
    * Returns the number deleted. */
  def pruneStateSnapshots(spark: SparkSession, stateDir: String,
                          keepLastN: Int = 2): Int = {
    require(keepLastN >= 2,
      s"need keepLastN >= 2 (a re-runnable batch's predecessor must " +
        s"survive every prune), got $keepLastN")
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val snaps = fs.listStatus(root).toSeq.filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case StateSnap(n) => Some((st.getPath, n.toLong))
        case _            => None
      }).sortBy(_._2)
    val stale = snaps.dropRight(keepLastN)
    stale.foreach(p => fs.delete(p._1, true))
    stale.size
  }

  def sessionCounts(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col("user_id").cast("long"), graft.Tables.epochSeconds(events).as("s"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state) =>
          val sorted = rows.map(_._2).toArray.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { s =>
            val newSession = st.lastSec == Long.MinValue || s - st.lastSec > gapSeconds
            st = SessionState(s, st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          (userId, st.sessions, st.events)
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
