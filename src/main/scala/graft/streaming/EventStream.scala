package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils

/** Structured Streaming operators (SURVEY §2.10: the reference is pure
  * batch; this is the streaming extension the builder brief asks for —
  * tracking-frame-shaped rows as an unbounded stream).
  *
  * Both transforms are written against plain DataFrames/Datasets so the
  * SAME code runs in batch (for the oracle/tests) and under
  * `readStream` (incremental): Spark's unified API guarantees identical
  * semantics, and the watermark clause only takes effect in streaming
  * mode.
  *
  * Scale: windowed aggregation is partial-aggregated per trigger and
  * keyed by (window, event_type) — state is bounded by the watermark
  * horizon. Sessionization keeps one small state object per key, and
  * event-time timeouts evict idle keys, so state size tracks ACTIVE
  * users, not history.
  */
object EventStream {

  /** Event time as MICROS — the exact resolution of Spark's
    * TimestampType. `Timestamp.getTime` (millis) silently truncates the
    * sub-ms component the corpus carries (TIMESTAMP(NANOS) parquet), and
    * any state logic comparing truncated times can disagree with its
    * batch twin exactly at a gap/tie boundary — so every stateful
    * operator below does its time arithmetic in micros. */
  private[streaming] def us(t: Timestamp): Long = DateTimeUtils.fromJavaTimestamp(t)

  /** Tumbling-window counts with a 10-minute watermark — the streaming
    * shape of A9/A11. */
  def windowedStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window counts (2 h window, 1 h slide) with a 10-minute
    * watermark — the overlap shape tumbling windows can't express
    * (every event contributes to the TWO hourly-aligned windows
    * covering it). The value sum is integer-quantized per row
    * (floor(value·1e6) — the Materialized partials rule) so the
    * cross-partition, cross-trigger aggregation is exact. */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000L).cast("long")).as("sum_q"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_q"))

  /** Streaming exact dedup — the incremental face of the dedup family
    * (llm.Dedup): drop re-deliveries of the same content key, with the
    * watermark bounding how long a key is remembered. State size tracks
    * the watermark window, not the stream's history — the property that
    * makes streaming dedup viable at ingest scale. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_key")

  /** Stream-static enrichment — the incremental face of the J5
    * broadcast dim join: each micro-batch joins against the (static,
    * broadcast) bounds ladder, so per-trigger cost is the batch size ×
    * a hash probe, with no streaming state at all. Unmatched categories
    * keep the S4 dead-letter semantics (null bounds). */
  def enrichWithBounds(events: DataFrame, boundsDim: DataFrame): DataFrame =
    events.join(broadcast(boundsDim), Seq("event_type"), "left")
      .select(col("user_id"), col("ts"), col("event_type"),
        col("value"), col("v_max"), col("a_max"))

  final case class PlayBuffer(frames: Seq[graft.pipelines.Yap.PlayFrame])

  /** Streaming YAP — the FLAGSHIP K4 pipeline made incremental: tracking
    * frames arrive as an unbounded stream; each (gameId, playId) group
    * buffers its frames in state until the carrier's stop event shows up
    * (play over), then runs the exact batch kernel
    * ([[graft.pipelines.Yap.processPlay]] — same code, same results) and
    * drops the state. A processing-time timeout flushes incomplete plays
    * through the kernel's own dead-letter branch ('no stop event' /
    * 'no start event'), so the error taxonomy matches batch exactly.
    *
    * Scale: state holds the frames of ACTIVE plays only (a play is ~60
    * frames × ~3 entities and lives a few seconds of event time), so
    * state size tracks concurrent live plays, not stream history.
    *
    * `timeout = Some(duration)` flushes stalled plays after that much
    * processing time (production default). `None` disables the timeout:
    * with ProcessingTimeTimeout registered, Spark schedules continuous
    * empty micro-batches to check expiries, which makes
    * `processAllAvailable`-style deterministic tests spin — the
    * stop-event path is identical either way. */
  def yapStream(spark: SparkSession,
      frames: Dataset[graft.pipelines.Yap.PlayFrame],
      rT: Double = 1.0,
      timeout: Option[String] = Some("30 seconds")): Dataset[graft.pipelines.Yap.Emit] = {
    import spark.implicits._
    val isStreaming = frames.isStreaming
    val stopEvs = graft.pipelines.Yap.stopEvents

    val fn = (key: (Long, Long), rows: Iterator[graft.pipelines.Yap.PlayFrame],
        state: GroupState[PlayBuffer]) => {
      val buf = state.getOption.map(_.frames).getOrElse(Seq.empty) ++ rows
      val playOver = buf.exists(f => f.role == "carrier" && f.event.exists(stopEvs))
      if (playOver || state.hasTimedOut || !isStreaming) {
        state.remove()
        graft.pipelines.Yap.processPlay(key._1, key._2, buf, rT)
      } else {
        state.update(PlayBuffer(buf))
        timeout.foreach(state.setTimeoutDuration)
        Iterator.empty
      }
    }

    frames.groupByKey(f => (f.gameId, f.playId))
      .flatMapGroupsWithState(OutputMode.Append,
        if (isStreaming && timeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** Watermarked stream-stream interval join — each click paired with
    * every view of the same user in the preceding 10 minutes (the
    * streaming face of the J8 range join). Both sides carry a
    * watermark and the join condition bounds event-time distance, so
    * Spark can EVICT state: a buffered view is dropped once the click
    * watermark passes v_ts + 10 min, and state size tracks the interval
    * width × arrival rate, never stream history — the property that
    * distinguishes a production stream-stream join from an unbounded
    * buffer. Batch semantics of the same plan are the plain interval
    * theta-join (the test checks the streamed result against it). */
  def clickViewJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))
      .withWatermark("v_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    views.join(clicks,
      expr("""user_id = c_user AND
             |v_ts <= c_ts AND v_ts >= c_ts - interval 10 minutes""".stripMargin))
      .select(col("c_id"), col("user_id"), col("c_ts"), col("v_id"), col("v_ts"))
  }

  /** The LEFT OUTER face of [[clickViewJoin]]: every click is
    * preserved; one with no view in its preceding 10 minutes emits
    * null-extended ONCE ITS STATE EXPIRES — the engine can only prove
    * "no view matched" after both watermarks pass the click's join
    * window, so unmatched results trail the inner results by the
    * watermark delay. That deferred-null semantics is the entire
    * difference from the inner join; matched rows are identical. State
    * stays bounded exactly as in the inner join: both sides evict
    * buffered rows once the 10-minute interval plus delay has passed. */
  def clickViewLeftJoin(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "10 minutes")
    clicks.join(views,
      expr("""v_user = user_id AND
             |v_ts <= c_ts AND v_ts >= c_ts - interval 10 minutes""".stripMargin),
      "leftOuter")
      .select(col("c_id"), col("user_id"), col("c_ts"), col("v_id"), col("v_ts"))
  }

  final case class AsofEv(event_id: Long, user_id: Long, ts: Timestamp,
      event_type: String, value: Double)
  final case class LatestView(ts_us: Long, id: Long, value: Double)
  final case class AsofHit(event_id: Long, user_id: Long, ts: Timestamp,
      asof_view_id: Option[Long], asof_value: Option[Double])

  /** Streaming as-of enrichment — the incremental face of the J7 as-of
    * join (ops.Relational `j7_asof`): each click is joined to the
    * latest view at or before it for the same user, as the stream
    * arrives. State per user is O(1) — just the latest (ts, id, value)
    * view triple, NOT a buffer of history — so state size tracks the
    * number of live users, the property that makes streaming enrichment
    * viable at ingest scale.
    *
    * Ordering semantics: within a micro-batch, rows are processed in
    * the batch operator's exact total order (ts, views-before-clicks,
    * id), so a stream delivered in event-time order reproduces the
    * batch as-of result row for row (pinned by the parity test). A view
    * arriving AFTER a click already emitted cannot retroactively change
    * it — inherent to streaming enrichment; the deterministic batch
    * j7_asof is the replay/repair path. A late view that is older than
    * the stored latest is correctly ignored (it could never win the
    * at-or-before race for any future click). */
  def asofStream(spark: SparkSession, events: Dataset[AsofEv]): Dataset[AsofHit] = {
    import spark.implicits._
    val fn = (userId: Long, rows: Iterator[AsofEv], state: GroupState[LatestView]) => {
      val out = Seq.newBuilder[AsofHit]
      var cur = state.getOption
      rows.toSeq
        .sortBy(e => (us(e.ts), if (e.event_type == "view") 0 else 1, e.event_id))
        .foreach { e =>
          if (e.event_type == "view") {
            val newer = cur.forall(c =>
              c.ts_us < us(e.ts) ||
                (c.ts_us == us(e.ts) && c.id < e.event_id))
            if (newer) cur = Some(LatestView(us(e.ts), e.event_id, e.value))
          } else {
            // a LATE click (older than the stored latest view) must not
            // be enriched from its future: only an at-or-before view is
            // eligible. The state keeps just the newest view, so a late
            // click whose true match was superseded degrades to null —
            // never to a wrong-direction join; batch j7_asof repairs.
            val eligible = cur.filter(_.ts_us <= us(e.ts))
            out += AsofHit(e.event_id, userId, e.ts,
              eligible.map(_.id), eligible.map(_.value))
          }
        }
      cur.foreach(state.update)
      out.result().iterator
    }
    events
      .filter(e => e.event_type == "view" || e.event_type == "click")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class AnomalyState(vals: List[Double])
  final case class AnomalyHit(event_id: Long, user_id: Long, value: Double,
      n_win: Long, zscore: Option[Double], w15_flag: String)

  /** Streaming rolling anomaly detection — the incremental face of the
    * W15 batch operator (ops.Events `w15_anomaly`): each event is
    * z-scored against the trailing 12 PRIOR events of its user, as the
    * stream arrives. State per user is O(1) — a bounded ring of ≤12
    * doubles — so state size tracks live users, never history (the
    * asofStream discipline). The arithmetic is the batch kernel's,
    * verbatim: integer-quantized frame sums (order-free by
    * construction), IEEE-exact mean/var/z, dround(4), the same
    * cold/normal/anomaly gate — so an event-time-ordered stream
    * reproduces the batch result ROW FOR ROW and the batch DuckDB
    * oracle gates the stream output directly. */
  def anomalyStream(spark: SparkSession, events: Dataset[AsofEv]): Dataset[AnomalyHit] = {
    import spark.implicits._
    def dr4(x: Double): Double = {
      val p = 1e4
      if (x >= 0) math.floor(x * p + 0.5) / p else -(math.floor(-x * p + 0.5) / p)
    }
    val fn = (userId: Long, rows: Iterator[AsofEv], state: GroupState[AnomalyState]) => {
      val out = Seq.newBuilder[AnomalyHit]
      var buf = state.getOption.map(_.vals).getOrElse(Nil)
      rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
        val n = buf.length
        val z: Option[Double] =
          if (n >= 6) {
            val sv = buf.foldLeft(0L)((a, v) => a + math.floor(v * 1000000.0).toLong)
            val sv2 = buf.foldLeft(0L)((a, v) => a + math.floor((v * v) * 1000000.0).toLong)
            val mean = (sv.toDouble / 1000000.0) / n
            val ex2 = (sv2.toDouble / 1000000.0) / n
            val vr = ex2 - (mean * mean)
            if (vr > 0) Some((e.value - mean) / math.sqrt(vr)) else None
          } else None
        val flag = z match {
          case Some(zz) => if (math.abs(zz) > 2.0) "anomaly" else "normal"
          case None => "cold"
        }
        out += AnomalyHit(e.event_id, userId, e.value, n.toLong, z.map(dr4), flag)
        buf = (buf :+ e.value).takeRight(12)
      }
      state.update(AnomalyState(buf))
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** One micro-batch of the idempotent sink: the batch lands in its own
    * `batch_id=<id>` partition with DYNAMIC partition overwrite, so
    * writing the same batch id twice replaces that partition instead of
    * appending a duplicate. Exposed so tests can replay a batch id
    * deterministically. */
  def writeBatch(batch: DataFrame, id: Long, path: String): Unit =
    batch.withColumn("batch_id", lit(id))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  /** Exactly-once-EFFECT parquet sink under Spark's at-least-once
    * foreachBatch contract: batch ids are stable across replays (they
    * come from the checkpointed offset log), and [[writeBatch]] makes
    * re-delivery of a batch id overwrite its own partition — so a crash
    * between "sink write" and "offset commit", which replays the batch
    * on restart, cannot duplicate rows. The partition column doubles as
    * output lineage. This is the production pattern for plain-parquet
    * sinks (a transactional table format does the same with a
    * txn-version column). */
  def idempotentParquetSink(events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        writeBatch(b.toDF(), id, path))
      .start()

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  /** All times MICROS (see [[us]]). */
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)
  final case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Int, total_value: Double)

  val sessionGapUs: Long = 30 * 60 * 1000000L

  /** Per-user sessionization with a 30-minute inactivity gap via
    * `flatMapGroupsWithState` — the custom-state shape the brief calls
    * for (W5's "whole ordered group" thinking, made incremental). */
  def sessionize(spark: SparkSession, events: Dataset[Ev]): Dataset[Session] = {
    import spark.implicits._
    // hoisted locals: the closure must capture only serializable values,
    // not the Dataset or the enclosing object
    val isStreaming = events.isStreaming
    val gap = sessionGapUs

    val fn = (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) => {
      val out = Seq.newBuilder[Session]
      var cur = state.getOption
      rows.toSeq.sortBy(e => us(e.ts)).foreach { e =>
        val t = us(e.ts)
        cur match {
          case Some(s) if t - s.last <= gap =>
            cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
          case Some(s) =>
            out += Session(userId, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur match {
        case Some(s) =>
          if (state.hasTimedOut) {
            out += Session(userId, s.start, s.last, s.n, s.total)
            state.remove()
          } else {
            state.update(s)
            if (isStreaming)
              // timeout API is millis — round UP, or the timeout could
              // fire up to 999 µs before the gap has actually elapsed
              // and close a session an in-gap event would have extended
              state.setTimeoutTimestamp((s.last + gap + 999L) / 1000L)
          }
        case None =>
          if (state.hasTimedOut) state.remove()
      }
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (isStreaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  final case class Scd2Ev(user_id: Long, event_id: Long, ts: Timestamp,
      event_type: String)
  final case class Scd2State(curType: String, curFromUs: Long, version: Long)
  final case class Scd2Row(user_id: Long, version: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long, is_current: Boolean)

  /** Flush barrier: a reserved event type that makes a group emit its
    * OPEN version (the streaming analogue of a dimension snapshot —
    * production would read closed versions from the stream and the
    * open tail from the state store / changelog). */
  val scd2Flush = " flush"

  /** Streaming SCD type-2 build — the incremental face of `w12_scd2`:
    * per user, consecutive same-value events collapse (CDC), each
    * TRANSITION immediately emits the previous version as a closed
    * interval [valid_from, valid_to), and state carries only the open
    * version — O(1) per user, the same property as [[asofStream]], so
    * state tracks live dimension keys, not event history. Within a
    * micro-batch rows are processed in the batch operator's total
    * order (ts, event_id); a stream delivered in event-time order
    * therefore reproduces the batch SCD2 relation row for row, with
    * version numbering continuing seamlessly ACROSS batches from the
    * checkpointed state. */
  def scd2Stream(spark: SparkSession, events: Dataset[Scd2Ev]): Dataset[Scd2Row] = {
    import spark.implicits._
    val flush = scd2Flush
    val fn = (userId: Long, rows: Iterator[Scd2Ev], state: GroupState[Scd2State]) => {
      val out = Seq.newBuilder[Scd2Row]
      var cur = state.getOption
      rows.toSeq.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
        if (e.event_type == flush) {
          cur.foreach(s => out += Scd2Row(userId, s.version, s.curType,
            s.curFromUs, -1L, is_current = true))
        } else cur match {
          case None =>
            cur = Some(Scd2State(e.event_type, us(e.ts), 1L))
          case Some(s) if s.curType != e.event_type =>
            out += Scd2Row(userId, s.version, s.curType, s.curFromUs,
              us(e.ts), is_current = false)
            cur = Some(Scd2State(e.event_type, us(e.ts), s.version + 1L))
          case _ => () // same value: CDC collapse
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }
}
