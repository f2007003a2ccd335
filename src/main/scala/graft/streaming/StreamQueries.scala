package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming operators promoted into the driver's CORRECTNESS gate
  * (VERDICT r5 next §2): each query here runs a REAL incremental
  * Structured Streaming job — MemoryStream source, micro-batches,
  * state store, event-time timeouts — to completion over the bounded
  * events table, and must hash-match the SAME DuckDB oracle as its
  * batch twin. Until r5 the streaming layer was pinned only by
  * ScalaTest parity specs; these rows put it under the stronger gate.
  *
  * The MemoryStream ingest necessarily stages the bounded input through
  * the driver — that is the sanctioned test-harness shape for gating a
  * stream (the production source is `readStream` over files/Kafka; the
  * operators under test are identical). Everything downstream of the
  * source — sessionization state, as-of state, the sink — runs
  * distributed, exactly as it would against an unbounded stream.
  */
object StreamQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Unique memory-sink names: Bench/Verify invoke each query several
    * times (warmup + rotated passes) in one session. */
  private val seq = new AtomicLong(0L)

  /** One forked session per parent (memoized, the j9 pattern) with a
    * state-appropriate shuffle width: a stateful micro-batch pays
    * per-partition state-store commit overhead EVERY batch, and 32
    * partitions for ~10k session keys is pure overhead — 8 roughly
    * halves both gates (measured at sf0.1: st_sessions 6.5 → 3.6 s,
    * st_asof 3.0 → 1.8 s). At production
    * scale this is the knob sized to state volume, not to the batch
    * compute width. */
  private def scoped(parent: SparkSession): SparkSession =
    graft.ops.ScopedSession(parent, "stream-narrow",
      "spark.sql.shuffle.partitions" -> "8")

  /** W8 as a stream: the custom-state sessionizer over the full events
    * table delivered through a MemoryStream, with every session FLUSHED
    * via the event-time-timeout path — two sentinel events from a
    * reserved user push the watermark past `last + gap` for all real
    * users (watermark advances between batches, so two hops: one to
    * carry it past the data, one to fire the timeouts), and the
    * sentinel user is excluded from the result. Session ids are
    * re-derived by per-user start-time order — the same numbering the
    * batch gaps-and-islands twin produces — so the oracle SQL is
    * `w8_sessions`' verbatim. */
  private val stSessions: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = graft.io.Sources.table(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.Ev].collect()
    val maxMs = if (evs.isEmpty) 0L else evs.iterator.map(_.ts.getTime).max
    val flushMs = maxMs + EventStream.sessionGapUs / 1000L + 3600000L
    val source = MemoryStream[EventStream.Ev]
    val name = s"st_sessions_${seq.incrementAndGet()}"
    val q = EventStream.sessionize(s,
        source.toDS().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rows = try {
      source.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      source.addData(EventStream.Ev(-1L, new Timestamp(flushMs), "click", 0.0))
      q.processAllAvailable()
      source.addData(EventStream.Ev(-1L, new Timestamp(flushMs + 3600000L), "click", 0.0))
      q.processAllAvailable()
      s.table(name).as[EventStream.Session].collect().filter(_.user_id >= 0L)
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("start_us")
    s.createDataset(rows.toIndexedSeq).toDF()
      .select(col("user_id"),
        row_number().over(w).cast("long").as("session_id"),
        expr("start_us DIV 1000000").as("start_s"),
        expr("end_us DIV 1000000").as("end_s"),
        col("n_events").cast("long").as("n_events"),
        graft.functions.Numeric.dround(col("total_value"), 4).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** The ONE bounded-ingest block every typed-event gate shares:
    * events (optionally view/click only) collected as [[EventStream.AsofEv]]. */
  private def eventRows(s: SparkSession, d: String,
      viewClickOnly: Boolean): Array[EventStream.AsofEv] = {
    import s.implicits._
    val base = graft.io.Sources.table(s, d, "events")
    (if (viewClickOnly) base.filter(col("event_type").isin("view", "click")) else base)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.AsofEv].collect()
  }

  /** J7 as a stream: the O(1)-state as-of enrichment over the real
    * view/click events, delivered across three micro-batches in
    * event-time order (ts micros, views before clicks at ties — the
    * batch operator's total order, so the incremental result is the
    * batch result row for row). No flush sentinel needed: clicks emit
    * the moment they are processed. Oracle: `j7_asof`'s correlated
    * twin, verbatim. */
  private val stAsof: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = true)
      .sortBy(e => (EventStream.us(e.ts), if (e.event_type == "view") 0 else 1, e.event_id))
    val source = MemoryStream[EventStream.AsofEv]
    val name = s"st_asof_${seq.incrementAndGet()}"
    val q = EventStream.asofStream(s, source.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rows = try {
      evs.grouped(math.max(1, (evs.length + 2) / 3)).foreach { chunk =>
        source.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      s.table(name).as[EventStream.AsofHit].collect()
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataset(rows.toIndexedSeq).toDF()
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_view_id"), col("asof_value"))
  }

  /** W12 as a stream: the SCD2 state machine over the full events
    * table, delivered across three event-time-ordered micro-batches so
    * version numbering must continue from checkpointed state across
    * batch boundaries. Closed versions emit the moment their successor
    * arrives; the OPEN versions are drained by one flush barrier per
    * user (the dimension-snapshot analogue). Oracle: `w12_scd2`'s
    * window twin, verbatim. */
  private val stScd2: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = false)
      .map(e => EventStream.Scd2Ev(e.user_id, e.event_id, e.ts, e.event_type))
      .sortBy(e => (EventStream.us(e.ts), e.event_id))
    val maxMs = if (evs.isEmpty) 0L else evs.iterator.map(_.ts.getTime).max
    val source = MemoryStream[EventStream.Scd2Ev]
    val name = s"st_scd2_${seq.incrementAndGet()}"
    val q = EventStream.scd2Stream(s, source.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val rows = try {
      evs.grouped(math.max(1, (evs.length + 2) / 3)).foreach { chunk =>
        source.addData(chunk.toIndexedSeq)
        q.processAllAvailable()
      }
      val users = evs.map(_.user_id).distinct
      source.addData(users.map(u => EventStream.Scd2Ev(u, Long.MaxValue,
        new Timestamp(maxMs + 3600000L), EventStream.scd2Flush)).toIndexedSeq)
      q.processAllAvailable()
      s.table(name).as[EventStream.Scd2Row].collect()
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataset(rows.toIndexedSeq).toDF()
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from_us"), col("valid_to_us"), col("is_current"))
      .orderBy("user_id", "version")
  }

  /** The watermarked tumbling-window aggregate as a stream: hour
    * windows over the full events table, every window FLUSHED by two
    * watermark-advancing sentinel batches (append mode emits a window
    * only once the watermark passes its end; the sentinel event_type is
    * excluded from the result). The batch twin is the plain
    * date_trunc-hour GROUP BY — windowed streaming aggregation must
    * reproduce it exactly on bounded input. */
  private val stWindowed: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = graft.io.Sources.table(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStream.Ev].collect()
    val maxMs = if (evs.isEmpty) 0L else evs.iterator.map(_.ts.getTime).max
    val source = MemoryStream[EventStream.Ev]
    val name = s"st_windowed_${seq.incrementAndGet()}"
    val q = EventStream.windowedStats(source.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val (schema, rows) = try {
      source.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      source.addData(EventStream.Ev(-1L, new Timestamp(maxMs + 7200000L), "sentinel__", 0.0))
      q.processAllAvailable()
      source.addData(EventStream.Ev(-1L, new Timestamp(maxMs + 10800000L), "sentinel__", 0.0))
      q.processAllAvailable()
      val tbl = s.table(name)
      // null-safe exclusion: a NULL event_type is a real group the
      // oracle's GROUP BY keeps; =!= would silently drop it
      (tbl.schema, tbl.filter(!(col("event_type") <=> "sentinel__")).collect())
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .select(col("win_start"), col("event_type"), col("n"),
        graft.functions.Numeric.dround(col("total_value"), 4).as("total_value"))
      .orderBy("win_start", "event_type")
  }

  /** Streaming exact dedup under the gate: every event delivered once
    * in batch 1, then a PLANTED re-delivery (event_id % 10 == 3) in
    * batch 2 — the at-least-once ingest failure dedup exists for. A
    * re-delivered key still in state is dropped by the state match; one
    * already past the watermark horizon is dropped as late data — both
    * paths land on the same answer, so the gate is the strongest kind:
    * the output must equal the PLAIN events table row for row (a leaked
    * duplicate fails on row count; a wrongly-dropped first delivery
    * fails on content). */
  private val stDedup: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = false)
    val source = MemoryStream[EventStream.AsofEv]
    val name = s"st_dedup_${seq.incrementAndGet()}"
    val q = EventStream.dedupStream(
        source.toDF().withColumnRenamed("event_id", "content_key"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val (schema, rows) = try {
      source.addData(evs.toIndexedSeq)
      q.processAllAvailable()
      source.addData(evs.filter(_.event_id % 10 == 3).toIndexedSeq) // re-delivery
      q.processAllAvailable()
      val tbl = s.table(name)
      (tbl.schema, tbl.collect()) // sink's own schema: name-safe binding
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .select(col("content_key").as("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
  }

  /** The exactly-once-EFFECT parquet sink under the gate: the events
    * stream lands in batch_id partitions via foreachBatch + dynamic
    * partition overwrite, then the FIRST batch the stream actually
    * wrote is RE-DELIVERED with identical content (the crash-between-
    * write-and-offset-commit replay, applied through the same
    * [[EventStream.writeBatch]] the sink uses — the id and rows are
    * read back from the output, so the gate does not assume how Spark
    * assigns micro-batch ids). The read-back — batch_id dropped — must
    * equal the plain events table row for row: an appending
    * (non-idempotent) sink fails on row count, a lossy one on content.
    * (Checkpoint-restart id stability itself is the spec's concern —
    * EventStreamSpec replays against a live checkpointed query.)
    *
    * One FIXED output root per process, wiped at entry: a per-call
    * temp dir would leak a full events copy + checkpoint into /tmp on
    * every bench pass. */
  private val stSink: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = false)
    // pid-scoped root (ADVICE r6): one fixed per-user path let two
    // concurrent graft processes (a bench overlapping a verify) wipe
    // each other's sink + checkpoint mid-query; still deleted at entry
    // so repeated in-process invocations don't accumulate in /tmp
    val root = s"/tmp/graft_stsink_${sys.props.getOrElse("user.name", "u")}" +
      s"_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val out = s"$root/out"
    val half = evs.length / 2
    val source = MemoryStream[EventStream.AsofEv]
    val q = EventStream.idempotentParquetSink(source.toDF(), out, s"$root/ckpt")
    try {
      source.addData(evs.take(half).toIndexedSeq)
      q.processAllAvailable()
      source.addData(evs.drop(half).toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    // crash-replay: re-deliver the first written batch, content read
    // back from the sink itself (no assumption on id assignment)
    val written = s.read.parquet(out)
    // partition-column values are re-inferred on read (int, not long)
    val firstId = written.agg(min(col("batch_id").cast("long"))).head.getLong(0)
    val firstRows = written.filter(col("batch_id") === firstId).drop("batch_id").collect()
    EventStream.writeBatch(
      s.createDataFrame(java.util.Arrays.asList(firstRows: _*),
        written.drop("batch_id").schema), firstId, out)
    s.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
  }

  /** Genuine restart-from-checkpoint under the gate (VERDICT r6 §7 —
    * until r7 the restart path was exercised only by specs): the first
    * half of the events stream lands through the checkpointed
    * idempotent parquet sink, the query is STOPPED (planned shutdown —
    * st_sink covers the crash-between-write-and-commit replay), the
    * remainder arrives while NO query is running, and a NEW query
    * started from the same checkpoint + source must resume from the
    * offset log and deliver exactly the backlog. The read-back —
    * batch_id dropped — must equal the plain events table row for row:
    * a restart that re-reads committed offsets without the idempotent
    * overwrite fails on row count, one that loses the backlog fails on
    * content. */
  private val stRestart: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = false)
    val root = s"/tmp/graft_strestart_${sys.props.getOrElse("user.name", "u")}" +
      s"_${ProcessHandle.current().pid()}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val out = s"$root/out"
    val half = evs.length / 2
    val source = MemoryStream[EventStream.AsofEv]
    val q1 = EventStream.idempotentParquetSink(source.toDF(), out, s"$root/ckpt")
    try {
      source.addData(evs.take(half).toIndexedSeq)
      q1.processAllAvailable()
    } finally q1.stop()
    // the backlog arrives while the query is down; the restarted query
    // finds it via the source's offsets, not via any live trigger
    source.addData(evs.drop(half).toIndexedSeq)
    val q2 = EventStream.idempotentParquetSink(source.toDF(), out, s"$root/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    s.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
  }

  /** The watermarked stream-stream interval join under the gate: every
    * click paired with the same user's views in the preceding 10
    * minutes, streamed across two batches plus a sentinel pair that
    * pushes both watermarks past the data (defensive flush — inner
    * joins emit eagerly, the sentinel guarantees no buffered residue),
    * with the sentinel user excluded. Oracle: the plain interval
    * theta-join. */
  private val stInterval: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = true)
      .sortBy(e => (EventStream.us(e.ts), e.event_id))
    val maxMs = if (evs.isEmpty) 0L else evs.iterator.map(_.ts.getTime).max
    val source = MemoryStream[EventStream.AsofEv]
    val name = s"st_interval_${seq.incrementAndGet()}"
    val q = EventStream.clickViewJoin(source.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val (schema, rows) = try {
      val half = evs.length / 2
      source.addData(evs.take(half).toIndexedSeq)
      q.processAllAvailable()
      source.addData(evs.drop(half).toIndexedSeq)
      q.processAllAvailable()
      source.addData(IndexedSeq(
        EventStream.AsofEv(-1L, -1L, new Timestamp(maxMs + 3600000L), "view", 0.0),
        EventStream.AsofEv(-2L, -1L, new Timestamp(maxMs + 3600000L), "click", 0.0)))
      q.processAllAvailable()
      val tbl = s.table(name)
      (tbl.schema, tbl.filter(col("user_id") >= 0L).collect())
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The watermarked stream-stream LEFT OUTER interval join under the
    * gate: clicks with no view in their preceding 10 minutes must still
    * emit, null-extended — which the engine can only do after BOTH
    * watermarks pass the click's join window, so the sentinel pair is
    * load-bearing here (not defensive as in st_interval): without it
    * every unmatched click near the end of the bounded stream would
    * stay buffered forever and the row-count gate would fail. Two
    * sentinel hops, as in st_sessions: one to carry the watermark past
    * the data, one to trigger the state eviction that emits the nulls.
    * Oracle: the plain batch LEFT JOIN. */
  private val stLeftouter: Q = (parent, d) => {
    val s = scoped(parent)
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val evs = eventRows(s, d, viewClickOnly = true)
      .sortBy(e => (EventStream.us(e.ts), e.event_id))
    val maxMs = if (evs.isEmpty) 0L else evs.iterator.map(_.ts.getTime).max
    val source = MemoryStream[EventStream.AsofEv]
    val name = s"st_leftouter_${seq.incrementAndGet()}"
    val q = EventStream.clickViewLeftJoin(source.toDF())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    val (schema, rows) = try {
      val half = evs.length / 2
      source.addData(evs.take(half).toIndexedSeq)
      q.processAllAvailable()
      source.addData(evs.drop(half).toIndexedSeq)
      q.processAllAvailable()
      Seq(1L, 2L).foreach { hop =>
        source.addData(IndexedSeq(
          EventStream.AsofEv(-hop, -1L,
            new Timestamp(maxMs + hop * 3600000L), "view", 0.0),
          EventStream.AsofEv(-hop - 10L, -1L,
            new Timestamp(maxMs + hop * 3600000L), "click", 0.0)))
        q.processAllAvailable()
      }
      val tbl = s.table(name)
      (tbl.schema, tbl.filter(col("user_id") >= 0L).collect())
    } finally {
      q.stop()
      s.catalog.dropTempView(name)
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  val queries: Map[String, Q] = Map(
    "st_sessions" -> stSessions,
    "st_asof" -> stAsof,
    "st_scd2" -> stScd2,
    "st_windowed" -> stWindowed,
    "st_dedup" -> stDedup,
    "st_sink" -> stSink,
    "st_restart" -> stRestart,
    "st_interval" -> stInterval,
    "st_leftouter" -> stLeftouter)

  /** The batch twins' oracles apply UNCHANGED — that is the point: the
    * incremental operators must reproduce the batch semantics exactly. */
  val oracle: Map[String, String] = Map(
    "st_sessions" -> graft.ops.Events.oracle("w8_sessions"),
    "st_asof" -> graft.ops.Relational.oracle("j7_asof"),
    "st_scd2" -> graft.ops.Events.oracle("w12_scd2"),
    "st_windowed" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
        | count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the planted re-delivery must vanish: output == the plain table
    "st_dedup" ->
      "SELECT event_id, user_id, ts, event_type, value FROM events",
    // the replayed batch must overwrite, not append: output == the table
    "st_sink" ->
      "SELECT event_id, user_id, ts, event_type, value FROM events",
    // restart from checkpoint must deliver exactly the backlog
    "st_restart" ->
      "SELECT event_id, user_id, ts, event_type, value FROM events",
    "st_interval" ->
      """SELECT c.event_id AS c_id, v.user_id, c.ts AS c_ts,
        | v.event_id AS v_id, v.ts AS v_ts
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE""".stripMargin,
    // every click survives; unmatched ones null-extended — the batch
    // LEFT JOIN the deferred-null streaming semantics must land on
    "st_leftouter" ->
      """SELECT c.event_id AS c_id, c.user_id, c.ts AS c_ts,
        | v.event_id AS v_id, v.ts AS v_ts
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON v.user_id = c.user_id
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 10 MINUTE""".stripMargin)
}
