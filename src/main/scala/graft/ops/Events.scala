package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Sources.table
import graft.functions.Numeric.dround

/** The reference's ordered/time-series operators (SURVEY.md §2.5) over the
  * `events` table: event-boundary detection, first-crossing, time
  * normalization, running prefixes, region splice, and the EP2
  * "max params between boundaries" pipeline that is the flagship query.
  *
  * All of these are single-shuffle shapes: one `groupBy(user_id)` (or one
  * window partitioned the same way) computes the per-entity boundaries as
  * conditional aggregates — `min(when(...))` — instead of the reference's
  * per-entity numpy index scans (optimal_pursuit.py:112-121,222-226).
  * At 100 TB the boundary table is tiny relative to the fact table and the
  * join back is on the same key the fact table already shuffled on, so AQE
  * plans it as a broadcast or co-partitioned join.
  *
  * Per-row outputs (W4/W6/W7/S4) are not globally sorted — the compare
  * harness sorts before hashing, and an output `orderBy` at 100 TB is a
  * full range exchange (see the policy note in [[Relational]]). Small
  * per-entity aggregates keep their ordering.
  */
object Events {

  type Q = (SparkSession, String) => DataFrame

  private val startTypes = Seq("signup", "click")
  private val fallbackType = "view"
  private val stopType = "error"

  /** W1 start boundary with fallback — first frame with a start event,
    * else first ball_snap (optimal_pursuit.py:112-117). */
  private[graft] def startBoundaries(e: DataFrame): DataFrame =
    e.groupBy("user_id").agg(
      coalesce(
        min(when(col("event_type").isin(startTypes: _*), col("event_id"))),
        min(when(col("event_type") === fallbackType, col("event_id"))))
        .as("start_id"))

  private val w1Start: Q = (s, d) =>
    startBoundaries(table(s, d, "events")).orderBy("user_id")

  /** W2 stop boundary — first frame with a stop event
    * (optimal_pursuit.py:119). */
  private val w2Stop: Q = (s, d) =>
    table(s, d, "events").groupBy("user_id")
      .agg(min(when(col("event_type") === stopType, col("event_id"))).as("stop_id"))
      .orderBy("user_id")

  /** W3 first crossing after start — earliest frame with dist < R_t and
    * frame > start (optimal_pursuit.py:222-226,495-499). Boundary agg,
    * join back on the grouping key, then a second conditional agg. */
  private val w3Crossing: Q = (s, d) => {
    // single-shuffle form: the boundary comes from a window over the
    // same key the final aggregate groups on, so the groupBy reuses the
    // window's hash partitioning instead of re-shuffling a joined plan
    val w = Window.partitionBy("user_id")
    table(s, d, "events")
      .withColumn("start_id", coalesce(
        min(when(col("event_type").isin(startTypes: _*), col("event_id"))).over(w),
        min(when(col("event_type") === fallbackType, col("event_id"))).over(w)))
      .filter(col("value") > 150 && col("event_id") > col("start_id"))
      .groupBy("user_id")
      .agg(min(col("event_id")).as("crossing_id"))
      .orderBy("user_id")
  }

  /** W4 time normalization to the series origin — seconds since each
    * entity's first frame (optimal_pursuit.py:290-291,446-447). */
  private val w4TimeNorm: Q = (s, d) => {
    val sec = col("ts").cast("double")
    table(s, d, "events")
      .select(col("event_id"), col("user_id"),
        dround(sec - min(sec).over(Window.partitionBy("user_id")), 6).as("t_rel"))
  }

  /** Array column → oracle-hashable string: round each element with the
    * DuckDB-parity `dround` (after which the double's shortest repr is
    * its exact 4-decimal form in BOTH engines) and join with ','. Raw
    * array<double> output broke the driver's pandas compare — arrays are
    * unhashable as sort keys (VERDICT r2 §wrong 1). */
  private def joined(arr: Column): Column =
    array_join(transform(arr, x => dround(x, 4).cast("string")), ",")

  /** W6 running path prefix — cumulative trajectory per entity
    * (optimal_pursuit.py:375,404), serialized for the oracle compare.
    * The element is stringified BEFORE the window (codegen'd, once per
    * input row); a transform() after collect_list would run its
    * interpreted lambda over the O(n²) prefix elements instead.
    *
    * HOT-KEY GUARD (VERDICT r8 next §5): prefix width is O(n²) per
    * user, so a power-user key at 100× could materialize an unbounded
    * window array. Users above [[w6MaxSeqLen]] events skip the window
    * entirely — their rows emit a NULL path (the w14 span-cap rule:
    * bad units degrade explicitly, never blow up a stage) — mirrored
    * in the oracle so the gate stays exact on any data. The count
    * pre-pass shares the user_id shuffle family with the window. */
  private[ops] val w6MaxSeqLen = 4096L

  private[ops] def w6PrefixImpl(ev: DataFrame, cap: Long): DataFrame = {
    val base = ev.select(col("event_id"), col("user_id"),
      dround(col("value"), 4).cast("string").as("vs"))
    val counts = base.groupBy("user_id").agg(count(lit(1)).as("nu"))
    val ok = base.join(counts.filter(col("nu") <= cap).select("user_id"),
      Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"),
        array_join(collect_list(col("vs")).over(
          Window.partitionBy("user_id").orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), ",").as("path"))
    val overflow = base.join(counts.filter(col("nu") > cap).select("user_id"),
      Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"),
        lit(null).cast("string").as("path"))
    ok.unionByName(overflow)
  }

  private val w6Prefix: Q = (s, d) => w6PrefixImpl(table(s, d, "events"), w6MaxSeqLen)

  /** P2 per-group ordered vector extract — `DF['x'].to_numpy()` per play
    * (optimal_pursuit.py:195-196): the whole series as one (serialized)
    * array row. */
  private val p2Series: Q = (s, d) =>
    table(s, d, "events")
      .groupBy("user_id")
      .agg(joined(transform(
        array_sort(collect_list(struct(col("event_id"), col("value")))),
        x => x.getField("value"))).as("series"))
      .orderBy("user_id")

  /** W7 region overwrite — splice a computed segment over an ordered
    * range, keep the original elsewhere (optimal_pursuit.py:532-552).
    * Here: zero out the 10 frames after the start boundary. */
  private val w7Splice: Q = (s, d) => {
    val e = table(s, d, "events")
    e.join(startBoundaries(e), Seq("user_id"))
      .select(col("event_id"), col("user_id"),
        when(col("event_id").between(col("start_id"), col("start_id") + 10), lit(0.0))
          .otherwise(col("value")).as("value_patched"))
  }

  /** A12 first-index-where reduction — `np.nonzero(cond)[0][0]`
    * (optimal_pursuit.py:222-226) as `min(when(...))`. */
  private val a12FirstWhere: Q = (s, d) =>
    table(s, d, "events").groupBy("user_id")
      .agg(min(when(col("event_type") === stopType, col("event_id"))).as("first_error_id"))
      .orderBy("user_id")

  /** EP2 flagship — max pursuit params between event boundaries
    * (optimal_pursuit.py:193-259): per entity, start = first start-event
    * time (fallback first view), stop = first error AFTER start; emit
    * max(value) and the frame count over [start, stop). Three aggregates
    * over the same key and two key-equi joins — a single shuffle family. */
  private[graft] def rangeMax(e: DataFrame): DataFrame = {
    val sec = col("ts").cast("double")
    val starts = e.groupBy("user_id").agg(
      coalesce(
        min(when(col("event_type").isin(startTypes: _*), sec)),
        min(when(col("event_type") === fallbackType, sec)))
        .as("start_s"))
    val stops = e.join(starts, Seq("user_id"))
      .filter(col("event_type") === stopType && sec > col("start_s"))
      .groupBy("user_id").agg(min(sec).as("stop_s"))
    e.join(starts, Seq("user_id")).join(stops, Seq("user_id"))
      .filter(sec >= col("start_s") && sec < col("stop_s"))
      .groupBy("user_id")
      .agg(dround(max(col("value")), 4).as("max_value"), count(lit(1)).as("n_between"))
  }

  private val ep2RangeMax: Q = (s, d) =>
    rangeMax(table(s, d, "events")).orderBy("user_id")

  /** S4 dead-letter — rows whose category has no entry in the bounds
    * ladder (optimal_pursuit.py:458-477 has no else branch; unlisted
    * positions raise and land in run_errors_*.csv). Expressed as an
    * anti-join against the broadcast dim. */
  private val s4DeadLetter: Q = (s, d) =>
    table(s, d, "events")
      .join(broadcast(Relational.boundsDim(s)), Seq("event_type"), "left_anti")
      .select("event_id", "user_id", "event_type")

  /** W8 batch sessionization — the gaps-and-islands form of the
    * streaming `EventStream.sessionize` (same 30-minute gap): a lag
    * window flags session starts, a running sum numbers the islands,
    * one groupBy rolls each island up. Every stage rides the SAME
    * (user_id) partitioning — one shuffle, two window passes, one agg.
    * This query is the ORACLE GATE for the custom-state streaming
    * sessionizer: `EventStreamSpec` asserts the flatMapGroupsWithState
    * output equals these rows (minus each user's unclosed tail
    * session), so the hand-written state machine is pinned to
    * SQL-recomputable semantics, not just to itself. */
  private[graft] def sessions(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sec = col("ts").cast("double")
    val newSession = when(
      lag(col("ts"), 1).over(byTime).isNull ||
        sec - lag(col("ts"), 1).over(byTime).cast("double") > 1800d, 1L)
      .otherwise(0L)
    e.select(col("user_id"), col("ts"), col("event_id"), col("value"),
        newSession.as("is_start"))
      .select(col("user_id"), col("ts"), col("value"),
        sum(col("is_start")).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_id"))
      .groupBy("user_id", "session_id")
      .agg(
        // floor, not cast: Spark's double→long cast truncates while
        // DuckDB's rounds — floor is identical in both engines
        floor(min(col("ts").cast("double"))).as("start_s"),
        floor(max(col("ts").cast("double"))).as("end_s"),
        count(lit(1)).as("n_events"),
        dround(sum(col("value")), 4).as("total_value"))
  }

  private val w8Sessions: Q = (s, d) =>
    sessions(table(s, d, "events")).orderBy("user_id", "session_id")

  /** W9 inter-event deltas — lag over (user, ts): the telemetry op
    * behind gap detection (the same lag the sessionizer flags on,
    * gated directly). One shuffle on user_id, same family as W3/W4. */
  private val w9Deltas: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    table(s, d, "events").select(
      col("event_id"), col("user_id"),
      dround(col("ts").cast("double") - lag(col("ts"), 1).over(w).cast("double"), 6)
        .as("delta_s"),
      lag(col("event_type"), 1).over(w).as("prev_type"))
  }

  /** W18 multi-touch attribution (extension): each purchase credits
    * the user's click touchpoints in the preceding 24 h under the
    * three standard models — FIRST-touch, LAST-touch, LINEAR — with
    * the click's UTC hour-of-day as the channel dimension (the
    * campaign stand-in this corpus affords); purchases with no touch
    * land on channel −1, so total credited value is conserved under
    * every model. Money never rides an order-dependent double sum:
    * purchase value micro-quantizes to a long, the linear split is
    * integer DIV per touch (remainder dropped deterministically), and
    * the display divides back at the end — the st_sliding discipline.
    *
    * Shuffle shape: the touch join is the j8 bucketized range join —
    * clicks key on (user_id, epoch-day), each purchase explodes into
    * its 2 covering day buckets, so the time inequality never plans a
    * nested loop; per-purchase first/last are one struct-min/max agg
    * and the rollup is 25 channel keys. */
  private val w18Attribution: Q = (s, d) => {
    val dayUs = 86400000000L
    val ev = table(s, d, "events").select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("t"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("t").as("pt"),
        floor(col("value") * 1000000L).cast("long").as("q"))
      .persist() // touch join + the unattributed anti-join
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("cid"), col("t").as("ct"),
        expr(s"CAST((t % $dayUs) DIV 3600000000 AS INT)").as("channel"))
      .withColumn("db", expr(s"ct DIV $dayUs")) // exact integer bucket, same idiom as the purchase side
    val pb = purch.withColumn("db",
      explode(array(expr(s"pt DIV $dayUs"), expr(s"pt DIV $dayUs - 1"))))
    val touches = pb.join(clicks, Seq("user_id", "db"))
      .filter(col("ct") >= col("pt") - dayUs && col("ct") < col("pt"))
      .select(col("pid"), col("q"), col("cid"), col("ct"), col("channel"))
      .persist() // per-purchase agg + the linear rollup
    val perP = touches.groupBy("pid", "q")
      .agg(count(lit(1)).as("n"),
        min(struct(col("ct"), col("cid"), col("channel"))).as("f"),
        max(struct(col("ct"), col("cid"), col("channel"))).as("l"))
      .persist() // three rollups + the anti-join
    val firstC = perP.select(col("f.channel").as("channel"), col("q"))
      .groupBy("channel").agg(sum(col("q")).as("first_q"),
        count(lit(1)).as("n_first"))
    val lastC = perP.select(col("l.channel").as("channel"), col("q"))
      .groupBy("channel").agg(sum(col("q")).as("last_q"),
        count(lit(1)).as("n_last"))
    val linear = touches.join(perP.select("pid", "n"), Seq("pid"))
      // floor division (DuckDB `//` semantics), not Spark DIV's
      // truncate-toward-zero: identical for the nonnegative purchase
      // values on current corpora, but refund-style negative q must
      // not split the engine from the twin. n > 0 always (a count),
      // so (q - pmod(q, n)) is the largest multiple of n ≤ q.
      .groupBy("channel").agg(sum(expr("(q - pmod(q, n)) DIV n")).as("lin_q"))
    val unattr = purch.join(perP.select("pid"), Seq("pid"), "left_anti")
      .agg(sum(col("q")).as("uq"), count(lit(1)).as("un"))
      .select(lit(-1).cast("int").as("channel"),
        col("un").as("n_first"), col("un").as("n_last"),
        col("uq").as("first_q"), col("uq").as("last_q"), col("uq").as("lin_q"))
    firstC.join(lastC, Seq("channel"), "full")
      .join(linear, Seq("channel"), "full")
      .select(col("channel"), col("n_first"), col("n_last"),
        col("first_q"), col("last_q"), col("lin_q"))
      .unionByName(unattr)
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        graft.functions.Numeric.dround(
          coalesce(col("first_q"), lit(0L)) / 1000000.0, 4).as("first_value"),
        graft.functions.Numeric.dround(
          coalesce(col("last_q"), lit(0L)) / 1000000.0, 4).as("last_value"),
        graft.functions.Numeric.dround(
          coalesce(col("lin_q"), lit(0L)) / 1000000.0, 4).as("linear_value"))
      .orderBy("channel")
  }

  /** W10 ordered funnel (extension): view → click → purchase per
    * user, each step the EARLIEST event strictly after the previous
    * step (greedy-first semantics, declared; micros-precision longs so
    * the strict inequalities replay exactly cross-engine). Three tiny
    * per-step aggregates chained by user_id equi-joins — every shuffle
    * keys on user_id and the step relations are aggregate-small, so
    * AQE broadcasts them back against the big scan; nothing ever
    * shuffles the full events table more than once. −1 sentinels keep
    * the step columns non-null BIGINT on both engines. */
  private val w10Funnel: Q = (s, d) => {
    val ev = table(s, d, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t").as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("t") > col("t_view"))
      .groupBy("user_id").agg(min("t").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("t") > col("t_click"))
      .groupBy("user_id").agg(min("t").as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
          + when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("steps"),
        col("t_view").as("t_view_us"),
        coalesce(col("t_click"), lit(-1L)).as("t_click_us"),
        coalesce(col("t_purchase"), lit(-1L)).as("t_purchase_us"))
      .orderBy("user_id")
  }

  /** W11 weekly cohort retention (extension): cohort = the Monday
    * week of each user's first signup; a cohort's week-k retention is
    * the distinct users active (any event) in cohort-week + k. Both
    * engines truncate weeks to Monday and the week starts are exact
    * 7-day multiples apart, so the day-diff ÷ 7 offset replays
    * exactly. Shuffles: one distinct on (user, week), one cohort
    * aggregate, rollups on the tiny (cohort, k) key — the user-keyed
    * join sides are aggregate-small, AQE broadcasts. */
  private val w11Retention: Q = (s, d) => {
    val ev = table(s, d, "events")
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cw"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("aw"))
      .distinct()
    // cohort is one row per user_id already — a plain count avoids the
    // two-phase distinct aggregate a countDistinct would plan
    val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_cohort"))
    active.join(cohort, Seq("user_id"))
      .filter(col("aw") >= col("cw"))
      .withColumn("week_k", (datediff(col("aw"), col("cw")) / 7).cast("long"))
      .groupBy("cw", "week_k")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, Seq("cw"))
      .select(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_k"), col("n_cohort"), col("n_active"),
        dround(col("n_active").cast("double") / col("n_cohort"), 4).as("rate"))
      .orderBy("cohort_week", "week_k")
  }

  /** W12 SCD type-2 dimension build (extension): the warehouse op that
    * turns a change-event stream into versioned validity intervals —
    * per user, collapse consecutive events with the SAME event_type
    * (change-data-capture collapse: only transitions survive), then
    * number the surviving versions and close each interval at the next
    * version's start (the open current version carries a −1 sentinel
    * and is_current = true, the w10 non-null-BIGINT discipline).
    * Timestamps ride as micros-exact longs so the cross-engine
    * comparison is integer-exact. Both windows share one (user_id →
    * ts, event_id) sort, so the whole op is ONE shuffle on user_id —
    * at 100 TB this is the partitioning the events table already has
    * (s2's layout), making the dimension build exchange-free on a
    * date-partitioned, user-bucketed lake. */
  private val w12Scd2: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("t", "event_id")
    val ev = table(s, d, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
    ev.filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .select(col("user_id"),
        row_number().over(w).cast("long").as("version"),
        col("event_type"),
        col("t").as("valid_from_us"),
        coalesce(lead(col("t"), 1).over(w), lit(-1L)).as("valid_to_us"),
        lead(col("t"), 1).over(w).isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** W14 gap-fill resample (extension): regularize each user's event
    * series onto an hourly grid with forward fill — the feature-store
    * prep every time-series model consumes (training frames need
    * fixed-frequency features, telemetry arrives irregularly). Three
    * deterministic stages, all partitioned on user_id so the whole op
    * is ONE shuffle family: (1) per (user, hour) keep the LATEST
    * observation — a row_number pick by (ts, event_id), never a float
    * aggregate, so there is nothing to accumulate cross-engine; (2)
    * explode each user's own [first, last] hour span into the grid
    * (scan-local from the span aggregate — grid size tracks activity
    * span, not corpus size); (3) left-join observations onto the grid
    * and forward-fill via last(ignoreNulls) over the hour order. The
    * first grid hour always has an observation, so the filled column
    * is never null.
    *
    * SPAN GUARD (VERDICT r7 next §5): "grid tracks activity span" has
    * one pathological input — a single user with a years-long sparse
    * span explodes `sequence(h0, h1)` into millions of rows. Spans
    * wider than [[w14MaxSpanHours]] are excluded from the grid and
    * routed to a dead-letter relation instead (the S4 pattern: bad
    * units become error rows, never a blown-up stage), mirrored in the
    * oracle so the gate stays exact on any data. */
  private[ops] val w14MaxSpanHours = 24L * 365

  /** (resampled grid input spans, dead-letter overflow rows). */
  private[ops] def w14Spans(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val spans = table(s, d, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .groupBy("user_id")
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .withColumn("span_hours",
        expr("(unix_timestamp(h1) - unix_timestamp(h0)) div 3600"))
    (spans.filter(col("span_hours") <= w14MaxSpanHours),
      spans.filter(col("span_hours") > w14MaxSpanHours)
        .select(col("user_id"), col("span_hours"),
          lit("span_exceeds_cap").as("reason")))
  }

  /** W15 rolling anomaly detection (extension): per-user z-score of
    * each event's value against the trailing frame of its 12 PRIOR
    * events — the frame excludes the current row, so a point never
    * judges itself. The frame moments are exact-integer window sums of
    * 1e-6-quantized values (the Classifier gradient discipline applied
    * to window frames), and the z itself is IEEE-exact (+ − × ÷ sqrt
    * only), so scores are bit-identical cross-engine on any
    * partitioning. Rows with under 6 priors or a degenerate frame are
    * flagged `cold`, keeping the gate falsifiable in all three flag
    * states. Scale shape: ONE user_id shuffle shared by all three
    * window sums; everything else is scan-local. */
  private val w15Anomaly: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-12, -1)
    val q6 = lit(1000000.0)
    val cnt = count(lit(1)).over(w)
    val sv = sum(floor(col("value") * q6)).over(w)
    val sv2 = sum(floor((col("value") * col("value")) * q6)).over(w)
    val mean = (sv.cast("double") / q6) / cnt.cast("double")
    val ex2 = (sv2.cast("double") / q6) / cnt.cast("double")
    val variance = ex2 - (mean * mean)
    val z = (col("value") - mean) / sqrt(variance)
    table(s, d, "events").select(
      col("event_id"), col("user_id"), col("value"),
      cnt.as("n_win"),
      when(cnt >= 6 && variance > 0, dround(z, 4)).as("zscore"),
      when(cnt >= 6 && variance > 0 && abs(z) > 2.0, "anomaly")
        .when(cnt >= 6 && variance > 0, "normal")
        .otherwise("cold").as("w15_flag"))
      .orderBy("event_id")
  }

  /** W16 behavior transition matrix (extension): first-order Markov
    * statistics over each user's event-type sequence — the session-
    * modeling prior (next-action prediction, funnel leak analysis)
    * derived as one lag window + one count agg. 'start' marks the
    * sequence head so initial-state mass is explicit. p_trans is a
    * SINGLE int/int IEEE division of two exact counts (cnt over the
    * from-state total), deterministic cross-engine unrounded; dround(4)
    * only formats it. Scale: one user_id shuffle for the lag, then a
    * (from,to)-keyed agg whose width is |event_type|² — constant. */
  private val w16Markov: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val bi = table(s, d, "events")
      .select(coalesce(lag(col("event_type"), 1).over(w), lit("start")).as("from_type"),
        col("event_type").as("to_type"))
    val cnt = bi.groupBy("from_type", "to_type").agg(count(lit(1)).as("n_trans"))
    val tot = Window.partitionBy("from_type")
    cnt.select(col("from_type"), col("to_type"), col("n_trans"),
      dround(col("n_trans").cast("double") / sum(col("n_trans")).over(tot), 4)
        .as("p_trans"))
      .orderBy("from_type", "to_type")
  }

  /** W17 exponential smoothing (extension): per-user EWMA of the value
    * series — the telemetry-baseline primitive next to w15's z-score.
    * The recursion s_i = (α·x_i) + ((1−α)·s_{i−1}) is inherently
    * sequential per user, so it runs as ONE ordered fold per user
    * (sort_array of (ts_us, event_id, value) triples → aggregate HOF
    * seeded with the first value), after a single user_id shuffle —
    * scan-local, no window, no per-row prefix arrays. Both engines
    * fold the identical ordered list with the identical IEEE
    * multiply-add association, so the result is bit-deterministic;
    * dround(7) only formats.
    *
    * HOT-KEY GUARD (VERDICT r8 next §5): the per-user collect_list is
    * bounded by per-user activity today, but a power-user key at 100×
    * would materialize an unbounded array. Users above
    * [[w17MaxSeqLen]] events are EXCLUDED from the collect (semi-join
    * on a count pre-pass, same shuffle key) and emitted as explicit
    * overflow rows with NULL fold results — the w14 dead-letter rule,
    * mirrored in the oracle. The tail slice is sized by the array's
    * own length, not a magic positional cap. */
  private[ops] val w17MaxSeqLen = 65536L

  private[ops] def w17EwmaImpl(ev: DataFrame, cap: Long): DataFrame = {
    val tri = struct(
      unix_micros(col("ts")).as("t"), col("event_id").as("e"), col("value").as("v"))
    val counts = ev.groupBy("user_id").agg(count(lit(1)).as("nu"))
    val grouped = ev
      .join(counts.filter(col("nu") <= cap).select("user_id"), Seq("user_id"), "left_semi")
      .groupBy("user_id")
      .agg(sort_array(collect_list(tri)).as("seq"))
    val vals = expr("transform(seq, x -> x.v)")
    val ewma = expr(
      "aggregate(slice(transform(seq, x -> x.v), 2, greatest(size(seq) - 1, 0)), " +
        "element_at(transform(seq, x -> x.v), 1), " +
        "(acc, x) -> (0.2 * x) + (0.8 * acc))")
    val ok = grouped.select(
      col("user_id"),
      size(col("seq")).cast("long").as("n_events"),
      dround(element_at(vals, size(col("seq"))), 4).as("last_value"),
      dround(ewma, 7).as("ewma"))
    val overflow = counts.filter(col("nu") > cap)
      .select(col("user_id"), col("nu").as("n_events"),
        lit(null).cast("double").as("last_value"),
        lit(null).cast("double").as("ewma"))
    ok.unionByName(overflow).orderBy("user_id")
  }

  private val w17Ewma: Q = (s, d) => w17EwmaImpl(table(s, d, "events"), w17MaxSeqLen)

  private val w14Resample: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = table(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("hour", date_trunc("hour", col("ts")))
    val pick = Window.partitionBy("user_id", "hour")
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev.withColumn("pick", row_number().over(pick))
      .filter(col("pick") === 1)
      .select(col("user_id"), col("hour"), col("value"))
    val grid = w14Spans(s, d)._1
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour"))
    val fill = Window.partitionBy("user_id").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), unix_timestamp(col("hour")).as("hour_s"),
        dround(last(col("value"), ignoreNulls = true).over(fill), 4)
          .as("value_ffill"),
        col("value").isNull.as("filled"))
      .orderBy("user_id", "hour_s")
  }

  val queries: Map[String, Q] = Map(
    "w8_sessions" -> w8Sessions,
    "w9_deltas" -> w9Deltas,
    "w18_attribution" -> w18Attribution,
    "w10_funnel" -> w10Funnel,
    "w11_retention" -> w11Retention,
    "w12_scd2" -> w12Scd2,
    "w14_resample" -> w14Resample,
    "w15_anomaly" -> w15Anomaly,
    "w16_markov" -> w16Markov,
    "w17_ewma" -> w17Ewma,
    "w1_start" -> w1Start,
    "w2_stop" -> w2Stop,
    "w3_crossing" -> w3Crossing,
    "w4_timenorm" -> w4TimeNorm,
    "w6_prefix" -> w6Prefix,
    "w7_splice" -> w7Splice,
    "p2_series" -> p2Series,
    "a12_first_where" -> a12FirstWhere,
    "ep2_range_max" -> ep2RangeMax,
    "s4_deadletter" -> s4DeadLetter)

  private val startSql =
    """SELECT user_id,
      | coalesce(min(CASE WHEN event_type IN ('signup','click') THEN event_id END),
      |          min(CASE WHEN event_type = 'view' THEN event_id END)) AS start_id
      |FROM events GROUP BY user_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // SCD2 twin: the same CDC-collapse → version-window derivation in
    // DuckDB's own window syntax over micros-exact longs.
    "w12_scd2" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |            CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
        | m AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY t, event_id) AS prev_type FROM e),
        | ch AS (SELECT user_id, event_type, t, event_id FROM m
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  event_type,
        |  t AS valid_from_us,
        |  coalesce(lead(t) OVER w, -1) AS valid_to_us,
        |  (lead(t) OVER w IS NULL) AS is_current
        |FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
        |ORDER BY user_id, version""".stripMargin,
    // Resample twin: same latest-pick, per-user hour grid, and
    // IGNORE NULLS forward fill in DuckDB's own window engine.
    "w14_resample" ->
      """WITH e AS (SELECT user_id, ts, event_id, value,
        |            date_trunc('hour', ts) AS hour FROM events),
        | hourly AS (SELECT user_id, hour, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hour
        |      ORDER BY ts DESC, event_id DESC) AS pick FROM e)
        |   WHERE pick = 1),
        | spans AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |           FROM e GROUP BY user_id
        |           HAVING date_diff('hour', min(hour), max(hour)) <= 8760),
        | grid AS (SELECT user_id,
        |            unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |          FROM spans),
        | j AS (SELECT g.user_id, g.hour, h.value
        |       FROM grid g LEFT JOIN hourly h USING (user_id, hour))
        |SELECT user_id, CAST(floor(epoch(hour)) AS BIGINT) AS hour_s,
        |  round(last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS value_ffill,
        |  (value IS NULL) AS filled
        |FROM j ORDER BY user_id, hour_s""".stripMargin,
    // Independent retention twin: Monday-truncated weeks, integer
    // day-diff // 7 offsets, distinct-user counts re-derived.
    "w11_retention" ->
      """WITH cohort AS (SELECT user_id, date_trunc('week', min(ts)) AS cw
        |                FROM events WHERE event_type = 'signup'
        |                GROUP BY user_id),
        | active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS aw
        |            FROM events),
        | j AS (SELECT a.user_id, c.cw,
        |         CAST(date_diff('day', c.cw, a.aw) // 7 AS BIGINT) AS week_k
        |       FROM active a JOIN cohort c ON c.user_id = a.user_id
        |       WHERE a.aw >= c.cw),
        | sizes AS (SELECT cw, count(DISTINCT user_id) AS n_cohort
        |           FROM cohort GROUP BY cw),
        | act AS (SELECT cw, week_k, count(DISTINCT user_id) AS n_active
        |         FROM j GROUP BY cw, week_k)
        |SELECT strftime(act.cw, '%Y-%m-%d') AS cohort_week, act.week_k,
        |  sizes.n_cohort, act.n_active,
        |  round(CAST(act.n_active AS DOUBLE) / sizes.n_cohort, 4) AS rate
        |FROM act JOIN sizes ON sizes.cw = act.cw
        |ORDER BY cohort_week, week_k""".stripMargin,
    // attribution twin: the inequality join runs NATIVELY in DuckDB
    // (no bucketing needed oracle-side), first/last via windowed
    // row_number with the (ct, cid) tiebreak mirroring the engine's
    // struct-min; all money stays in micro-quantized integer algebra
    "w18_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |            CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
        | p AS (SELECT event_id AS pid, user_id, t AS pt,
        |         CAST(floor(value * 1000000) AS BIGINT) AS q
        |       FROM e WHERE event_type = 'purchase'),
        | c AS (SELECT user_id, event_id AS cid, t AS ct,
        |         CAST((t % 86400000000) // 3600000000 AS INT) AS channel
        |       FROM e WHERE event_type = 'click'),
        | touch AS (SELECT p.pid, p.q, c.cid, c.ct, c.channel
        |           FROM p JOIN c ON c.user_id = p.user_id
        |            AND c.ct >= p.pt - 86400000000 AND c.ct < p.pt),
        | pp AS (SELECT pid, q, count(*) AS n FROM touch GROUP BY pid, q),
        | rk AS (SELECT pid, channel,
        |          row_number() OVER (PARTITION BY pid ORDER BY ct, cid) AS rf,
        |          row_number() OVER (PARTITION BY pid ORDER BY ct DESC, cid DESC) AS rl
        |        FROM touch),
        | firstc AS (SELECT rk.channel, sum(pp.q) AS first_q, count(*) AS n_first
        |            FROM rk JOIN pp ON pp.pid = rk.pid WHERE rk.rf = 1 GROUP BY rk.channel),
        | lastc AS (SELECT rk.channel, sum(pp.q) AS last_q, count(*) AS n_last
        |           FROM rk JOIN pp ON pp.pid = rk.pid WHERE rk.rl = 1 GROUP BY rk.channel),
        | lin AS (SELECT t.channel, sum(t.q // pp.n) AS lin_q
        |         FROM touch t JOIN pp ON pp.pid = t.pid GROUP BY t.channel),
        | unat AS (SELECT CAST(-1 AS INT) AS channel,
        |            count(*) AS n_first, count(*) AS n_last,
        |            sum(q) AS uq FROM p
        |          WHERE pid NOT IN (SELECT pid FROM pp)),
        | merged AS (
        |   SELECT coalesce(f.channel, l.channel, li.channel) AS channel,
        |     f.n_first, l.n_last, f.first_q, l.last_q, li.lin_q
        |   FROM firstc f FULL JOIN lastc l ON l.channel = f.channel
        |   FULL JOIN lin li ON li.channel = coalesce(f.channel, l.channel)
        |   UNION ALL
        |   SELECT channel, n_first, n_last, uq, uq, uq FROM unat)
        |SELECT channel,
        |  CAST(coalesce(n_first, 0) AS BIGINT) AS n_first,
        |  CAST(coalesce(n_last, 0) AS BIGINT) AS n_last,
        |  round(CAST(coalesce(first_q, 0) AS BIGINT) / 1000000.0, 4) AS first_value,
        |  round(CAST(coalesce(last_q, 0) AS BIGINT) / 1000000.0, 4) AS last_value,
        |  round(CAST(coalesce(lin_q, 0) AS BIGINT) / 1000000.0, 4) AS linear_value
        |FROM merged ORDER BY channel""".stripMargin,
    // Independent funnel twin: same greedy-first semantics derived
    // with DuckDB's own step CTEs over micros-exact longs.
    "w10_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |            CAST(epoch_us(ts) AS BIGINT) AS t FROM events),
        | v AS (SELECT user_id, min(t) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        | c AS (SELECT e.user_id, min(e.t) AS t_click FROM e
        |       JOIN v ON v.user_id = e.user_id
        |       WHERE e.event_type = 'click' AND e.t > v.t_view
        |       GROUP BY e.user_id),
        | p AS (SELECT e.user_id, min(e.t) AS t_purchase FROM e
        |       JOIN c ON c.user_id = e.user_id
        |       WHERE e.event_type = 'purchase' AND e.t > c.t_click
        |       GROUP BY e.user_id)
        |SELECT v.user_id,
        |  CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END
        |       AS BIGINT) AS steps,
        |  v.t_view AS t_view_us,
        |  coalesce(c.t_click, -1) AS t_click_us,
        |  coalesce(p.t_purchase, -1) AS t_purchase_us
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "w8_sessions" ->
      """WITH o AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |          OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_start
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        | s AS (SELECT user_id, ts, value,
        |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM o)
        |SELECT user_id, session_id,
        |  CAST(floor(min(epoch(ts))) AS BIGINT) AS start_s,
        |  CAST(floor(max(epoch(ts))) AS BIGINT) AS end_s,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    // same ordered fold: list() collected per user, struct-sorted on
    // (t, e, v), list_reduce seeds with the first element — DuckDB's
    // fold and Spark's aggregate-over-slice are the same association
    "w17_ewma" ->
      s"""WITH g AS (SELECT user_id,
         |  list_sort(list(struct_pack(t := epoch_us(ts), e := event_id, v := value))) AS seq
         | FROM events GROUP BY user_id)
         |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
         | CASE WHEN len(seq) <= $w17MaxSeqLen
         |   THEN round(list_transform(seq, x -> x.v)[len(seq)], 4) END AS last_value,
         | CASE WHEN len(seq) <= $w17MaxSeqLen
         |   THEN round(list_reduce(list_transform(seq, x -> x.v),
         |     (acc, x) -> (0.2 * x) + (0.8 * acc)), 7) END AS ewma
         |FROM g ORDER BY user_id""".stripMargin,
    "w16_markov" ->
      """WITH bi AS (SELECT
        |  coalesce(lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), 'start') AS from_type,
        |  event_type AS to_type
        | FROM events),
        | c AS (SELECT from_type, to_type, count(*) AS n_trans
        |       FROM bi GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n_trans,
        | round(CAST(n_trans AS DOUBLE) /
        |   sum(n_trans) OVER (PARTITION BY from_type), 4) AS p_trans
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // the mean/variance sub-expressions are spelled out from the same
    // quantized window sums in the same association as the engine
    "w15_anomaly" -> {
      val mean = "((CAST(sv AS DOUBLE) / 1000000.0) / CAST(n_win AS DOUBLE))"
      val vr = s"(((CAST(sv2 AS DOUBLE) / 1000000.0) / CAST(n_win AS DOUBLE)) - ($mean * $mean))"
      val z = s"((value - $mean) / sqrt($vr))"
      s"""WITH b AS (SELECT event_id, user_id, value,
         |  count(*) OVER w AS n_win,
         |  sum(CAST(floor(value * 1000000.0) AS BIGINT)) OVER w AS sv,
         |  sum(CAST(floor((value * value) * 1000000.0) AS BIGINT)) OVER w AS sv2
         | FROM events
         | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING))
         |SELECT event_id, user_id, value, n_win,
         | CASE WHEN n_win >= 6 AND $vr > 0 THEN round($z, 4) END AS zscore,
         | CASE WHEN n_win >= 6 AND $vr > 0 AND abs($z) > 2.0 THEN 'anomaly'
         |      WHEN n_win >= 6 AND $vr > 0 THEN 'normal' ELSE 'cold' END AS w15_flag
         |FROM b ORDER BY event_id""".stripMargin
    },
    "w9_deltas" ->
      """SELECT event_id, user_id,
        | round(epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id)), 6) AS delta_s,
        | lag(event_type) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev_type
        |FROM events""".stripMargin,
    "w1_start" -> (startSql + " ORDER BY user_id"),
    "w2_stop" ->
      """SELECT user_id, min(CASE WHEN event_type = 'error' THEN event_id END) AS stop_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w3_crossing" ->
      s"""WITH s AS ($startSql)
         |SELECT e.user_id, min(e.event_id) AS crossing_id
         |FROM events e JOIN s ON e.user_id = s.user_id
         |WHERE e.value > 150 AND e.event_id > s.start_id
         |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "w4_timenorm" ->
      """SELECT event_id, user_id,
        | round(epoch(ts) - min(epoch(ts)) OVER (PARTITION BY user_id), 6) AS t_rel
        |FROM events""".stripMargin,
    "w6_prefix" ->
      s"""WITH c AS (SELECT event_id, user_id, value,
         |  count(*) OVER (PARTITION BY user_id) AS nu FROM events)
         |SELECT event_id, user_id,
         | CASE WHEN nu <= $w6MaxSeqLen THEN array_to_string(list_transform(
         |   list(value) OVER (PARTITION BY user_id ORDER BY event_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |   x -> CAST(round(x, 4) AS VARCHAR)), ',') END AS path
         |FROM c""".stripMargin,
    "w7_splice" ->
      s"""WITH s AS ($startSql)
         |SELECT e.event_id, e.user_id,
         | CASE WHEN e.event_id BETWEEN s.start_id AND s.start_id + 10 THEN 0.0 ELSE e.value END AS value_patched
         |FROM events e JOIN s ON e.user_id = s.user_id""".stripMargin,
    "p2_series" ->
      """SELECT user_id,
        | array_to_string(list_transform(list(value ORDER BY event_id),
        |   x -> CAST(round(x, 4) AS VARCHAR)), ',') AS series
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "a12_first_where" ->
      """SELECT user_id, min(CASE WHEN event_type = 'error' THEN event_id END) AS first_error_id
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ep2_range_max" ->
      """WITH s AS (
        |  SELECT user_id,
        |   coalesce(min(CASE WHEN event_type IN ('signup','click') THEN epoch(ts) END),
        |            min(CASE WHEN event_type = 'view' THEN epoch(ts) END)) AS start_s
        |  FROM events GROUP BY user_id),
        | t AS (
        |  SELECT e.user_id, min(epoch(e.ts)) AS stop_s
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'error' AND epoch(e.ts) > s.start_s
        |  GROUP BY e.user_id)
        |SELECT e.user_id, round(max(e.value), 4) AS max_value, count(*) AS n_between
        |FROM events e JOIN s ON e.user_id = s.user_id JOIN t ON e.user_id = t.user_id
        |WHERE epoch(e.ts) >= s.start_s AND epoch(e.ts) < t.stop_s
        |GROUP BY e.user_id ORDER BY e.user_id""".stripMargin,
    "s4_deadletter" ->
      """SELECT event_id, user_id, event_type FROM events
        |WHERE event_type NOT IN ('click','view','purchase','signup')""".stripMargin)
}
