package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.dround
import graft.functions.TextHashes
import graft.functions.TextHashes.rollHash
import graft.io.Sinks
import graft.io.Sources.table

/** Sketch-based approximate aggregation — the 100 TB answer to "how
  * many distinct / what percentile" when an exact answer would shuffle
  * the full key set. Spark's built-ins are already the right
  * distributed shape: `approx_count_distinct` is HLL++ with map-side
  * partial sketches merged on the reduce side (constant bytes per
  * partition, vs `count(DISTINCT)`'s expand+reshuffle of every key),
  * and `approx_percentile` is a mergeable quantile summary with bounded
  * rank error — so these queries compose the primitives rather than
  * reimplement them.
  *
  * Verification follows the fixture-oracle pattern (VERDICT r3/r4): a
  * sketch estimate is engine-specific, so the query DUMPS its estimates
  * and computes the exact answer alongside; the DuckDB twin recomputes
  * the exact side independently and re-derives the error column from
  * the dumped estimates. The committed artifact then *documents* the
  * sketch's accuracy (err columns), and the gate falsifies both the
  * exact arithmetic and any fabricated error claim.
  */
object Sketches {

  type Q = (SparkSession, String) => DataFrame

  /** HLL++ distinct users per event type, against the exact count. At
    * scale only the sketch side survives (the exact column here exists
    * to be graded); rsd 0.02 → ~1.5 KB sketches. */
  private val skHll: Q = (s, d) => {
    // persisted: the fixture dump and the returned frame both consume
    // the agg — without it the sketch pass runs twice
    val est = table(s, d, "events")
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"),
        countDistinct(col("user_id")).as("n_exact"))
      .persist()
    Sinks.dumpFixture(est.select("event_type", "n_approx"), "sk_hll_est")
    est.select(col("event_type"), col("n_approx"), col("n_exact"),
      dround(abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact"), 4)
        .as("err_rel"))
      .orderBy("event_type")
  }

  /** Mergeable quantile summary (approx_percentile, accuracy 10k) per
    * return flag, against the exact interpolated percentile. Both
    * percentile pairs use the ARRAY form: one summary/value-map state
    * per group serves every requested quantile — four scalar
    * TypedImperativeAggregates in one groupBy built four independent
    * states over the same 600 k doubles and ran 1.8× slower (measured
    * 2.74 s vs 1.56 s at sf0.1). */
  private val skQuantile: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val est = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.95)), lit(10000)).as("pa"),
        expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("pe"))
      .select(col("l_returnflag"),
        col("pa").getItem(0).as("p50_approx"), col("pa").getItem(1).as("p95_approx"),
        col("pe").getItem(0).as("p50_exact"), col("pe").getItem(1).as("p95_exact"))
      .persist() // dump + return both consume the agg (same as sk_hll)
    Sinks.dumpFixture(
      est.select("l_returnflag", "p50_approx", "p95_approx"), "sk_quantile_est")
    est.select(col("l_returnflag"),
      dround(col("p50_approx"), 4).as("p50_approx"),
      dround(col("p95_approx"), 4).as("p95_approx"),
      dround(col("p50_exact"), 4).as("p50_exact"),
      dround(col("p95_exact"), 4).as("p95_exact"),
      dround(abs(col("p50_approx") - col("p50_exact")) / col("p50_exact"), 4).as("p50_err"),
      dround(abs(col("p95_approx") - col("p95_exact")) / col("p95_exact"), 4).as("p95_err"))
      .orderBy("l_returnflag")
  }

  /** HLL set algebra: |clickers ∩ purchasers| by inclusion–exclusion
    * over THREE conditional HLL++ states built in ONE scan (A, B,
    * A∪B — `approx_count_distinct` ignores the `when` nulls, so the
    * union sketch costs nothing extra). This is how sketch stores
    * answer audience-overlap questions at 100 TB: no join, no distinct
    * shuffle — constant sketch state per partition, one merge. The
    * exact intersection (a distinct semi-join, the u3 shape) exists to
    * be graded: estimates are engine-specific (fixture-dumped), but
    * the exact side, the inclusion–exclusion arithmetic, and the error
    * column are all re-derived by the oracle.
    *
    * OPERATING ENVELOPE (measured, BASELINE.md §sk_setops-envelope):
    * inclusion–exclusion sums three ±2% sketches, so the absolute
    * error is ~2% of the UNION regardless of the intersection — trust
    * n_inter when it is ≳10% of n_union (measured 2.5% rel error at
    * ∩/∪ = 1/3), and fall back to the exact semi-join below that
    * (27% rel error at ∩/∪ = 1/25; pure noise, possibly negative, on
    * near-disjoint audiences). */
  private val skSetops: Q = (s, d) => {
    val e = table(s, d, "events")
    val est = e.agg(
        approx_count_distinct(
          when(col("event_type") === "click", col("user_id")), 0.02).as("n_a"),
        approx_count_distinct(
          when(col("event_type") === "purchase", col("user_id")), 0.02).as("n_b"),
        approx_count_distinct(
          when(col("event_type").isin("click", "purchase"), col("user_id")), 0.02)
          .as("n_union"))
      .persist()
    Sinks.dumpFixture(est, "sk_setops_est")
    val exact = e.filter(col("event_type") === "click")
      .select("user_id").distinct()
      .join(e.filter(col("event_type") === "purchase")
        .select("user_id").distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("x_inter"))
    // err_rel divides by the exact intersection; on a corpus where the
    // click∩purchase audience is empty Spark would produce Inf/NaN while
    // DuckDB errors differently — guard with nullif semantics on BOTH
    // sides so an empty overlap yields a clean null, not divergence.
    est.crossJoin(exact)
      .select(col("n_a"), col("n_b"), col("n_union"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_inter"),
        col("x_inter"),
        dround(abs(col("n_a") + col("n_b") - col("n_union") - col("x_inter"))
          .cast("double") /
          when(col("x_inter") === 0, lit(null)).otherwise(col("x_inter")),
          4).as("err_rel"))
  }

  // Planted skew for the heavy-hitter gate (ts_pii precedent): the
  // synthetic events are uniform per user, so every 4th event is routed
  // to one of 3 hot keys — a top-k over 150 near-tied keys would not be
  // a falsifiable sketch demonstration. Reproduced verbatim by the twin.
  private def hotKey = when(col("event_id") % 4 === 0,
      concat(lit("hot_"), (col("event_id") % 3).cast("string")))
    .otherwise(concat(lit("u"), col("user_id").cast("string")))

  /** Heavy hitters via `approx_top_k` (Spark 4.1's mergeable
    * frequent-items sketch): constant memory per partition (64 tracked
    * items here, fewer than the 153 live keys — the sketch is genuinely
    * approximate), map-side partials merged on one reduce — vs the
    * exact path's full groupBy + sort of every distinct key, which at
    * 100 TB shuffles the whole key universe to rank it. Fixture gate as
    * [[skHll]]: the estimated top-10 is dumped, DuckDB recounts those
    * items exactly and re-derives the error column — the exact side and
    * any fabricated error claim are both falsifiable; sketch recall is
    * additionally pinned by a planted-skew ScalaTest. */
  private val skTopk: Q = (s, d) => {
    // persisted: the fixture dump and the returned frame both consume
    // the sketch estimate — and an UNpersisted recompute could legally
    // return different estimates, silently desyncing dump and result
    val est = table(s, d, "events")
      .select(hotKey.as("k"))
      .agg(expr("approx_top_k(k, 10, 64)").as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").cast("long").as("n_est"))
      .persist()
    Sinks.dumpFixture(est, "sk_topk_est")
    val exact = table(s, d, "events")
      .select(hotKey.as("item"))
      .groupBy("item").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("item"), "left")
      .select(col("item"), col("n_est"), col("n_exact"),
        (col("n_est") - col("n_exact")).as("err_abs"))
      .orderBy("item")
  }

  // -------------------------------------------------------------------
  // sk_cms: count-min sketch — the mergeable point-frequency sketch
  // (Cormode & Muthukrishnan 2005). d×w counters: each key increments
  // one cell per row via d independent hashes; a point estimate is the
  // MIN over its d cells, an overestimate by construction (collisions
  // only ever ADD). Here d=4, w=64 — deliberately narrower than the
  // ~153 live keys so collisions are real and the error columns are a
  // falsifiable demonstration, not all zeros. The 100 TB shape: the
  // sketch build is a groupBy over ≤ d·w=256 cells — map-side partials
  // collapse every partition to ≤256 rows, so the shuffle is constant
  // bytes regardless of corpus size (THE reason CMS exists; an exact
  // per-key count shuffles the whole key universe) — and the probe join
  // broadcasts the 256-row sketch. The hash is the engine's native
  // FNV-1a roll_hash over "i:key", which the oracle replays byte for
  // byte in HUGEINT arithmetic: sketch, estimates, and error columns
  // are ALL re-derived independently — no fixture echo anywhere.
  // -------------------------------------------------------------------
  private val cmsDepth = 4
  private val cmsWidth = 64L

  /** The d cell indices of one key: pmod(fnv("i:key"), w) for each row
    * i. 64 divides 2^64, so pmod of the signed hash equals the unsigned
    * fold mod w — the oracle uses the unsigned form directly. */
  private def cmsCells(item: Column): Column =
    array((0 until cmsDepth).map(i =>
      pmod(rollHash(concat(lit(s"$i:"), item)), lit(cmsWidth))): _*)

  private val skCms: Q = (s, d) => {
    val keyed = table(s, d, "events").select(hotKey.as("item"))
    val cells = keyed.select(col("item"),
      posexplode(cmsCells(col("item"))).as(Seq("i", "cell")))
    val sketch = cells.groupBy("i", "cell").agg(count(lit(1)).as("n"))
    val exact = keyed.groupBy("item").agg(count(lit(1)).as("n_exact"))
    exact.select(col("item"), col("n_exact"),
        posexplode(cmsCells(col("item"))).as(Seq("i", "cell")))
      .join(broadcast(sketch), Seq("i", "cell"))
      .groupBy("item", "n_exact").agg(min(col("n")).as("n_est"))
      .select(col("item"), col("n_est"), col("n_exact"),
        (col("n_est") - col("n_exact")).as("err_abs"))
      .orderBy("item")
  }

  // -------------------------------------------------------------------
  // sk_theta: KMV/theta sketch over per-source shingle sets — the set
  // operation HLL cannot do. sk_setops estimates |A∩B| by
  // inclusion–exclusion over three HLL counts, whose relative error
  // EXPLODES as the true intersection shrinks (its own operating
  // envelope, BASELINE.md); a theta sketch (Bar-Yossef et al.'s KMV
  // distinct-counter, RANDOM 2002, generalized by the DataSketches
  // theta framework) intersects NATIVELY: keep each set's k smallest
  // hash values, θ = min over sets of the k-th value, and any set
  // expression evaluates on the sub-θ sample with error ~1/√|sample|.
  //
  // Scale shape: the sketch is k longs per set — the per-set top-k is
  // a WindowGroupLimit plan (map-side partial k-min per partition, one
  // k-row merge), so two 100 TB corpora compare through 2×256 longs,
  // never a shingle-set shuffle (dd_source_overlap's MinHash twin
  // estimates only jaccard; this one yields cardinalities of every set
  // op directly). Determinism: the hash is the repo's FNV-1a fold
  // (rollHash) shifted into 63 bits (sign-free ordering in BOTH
  // engines), every derived count is integer, and the two estimate
  // divisions are exact-integer-into-IEEE — so, like ann_hamming and
  // dq_dp_geo, the ORACLE REPLAYS THE SKETCH ITSELF end to end: no
  // fixture, the k-min selection is inside the hash gate.
  private val thetaK = 256
  private[ops] def thetaSets(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source").as("set_id"),
        explode(graft.functions.ArrayFns.shingles3(col("text"))).as("g3"))
      .dropDuplicates("set_id", "g3")
      .select(col("set_id"),
        shiftrightunsigned(rollHash(col("g3")), 1).as("u"))
      .dropDuplicates("set_id", "u")

  private val skTheta: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // persisted: the k-min ranks and the exact-side counts both read it
    val u = thetaSets(s, d).persist()
    val rk = u.withColumn("r",
        row_number().over(Window.partitionBy("set_id").orderBy("u")))
      .filter(col("r") <= thetaK).persist() // θ extraction + the θ-cut
    val th = rk.filter(col("r") === thetaK).groupBy()
      .agg(min(when(col("set_id") === "src0", col("u"))).as("th_a"),
        min(when(col("set_id") === "src1", col("u"))).as("th_b"))
    val cut = rk.crossJoin(broadcast(th)) // 1-row broadcast side
      .filter(col("u") < least(col("th_a"), col("th_b")))
      .groupBy("u").agg(count(lit(1)).as("nsets"))
      .groupBy().agg(count(lit(1)).as("n_union_sketch"),
        sum(when(col("nsets") === 2, 1L).otherwise(0L)).as("n_inter_sketch"))
    val exact = u.groupBy("u").agg(count(lit(1)).as("ns"))
      .groupBy().agg(count(lit(1)).as("x_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).as("x_inter"))
    val xab = u.groupBy().agg(
      sum(when(col("set_id") === "src0", 1L).otherwise(0L)).as("x_a"),
      sum(when(col("set_id") === "src1", 1L).otherwise(0L)).as("x_b"))
    val two63 = lit(9.223372036854775808e18) // 2^63, exactly representable
    val theta = least(col("th_a"), col("th_b"))
    cut.crossJoin(broadcast(th)).crossJoin(broadcast(exact))
      .crossJoin(broadcast(xab))
      .select(
        lit(thetaK.toLong).as("k"),
        theta.as("theta"),
        col("n_union_sketch"), col("n_inter_sketch"),
        dround(lit((thetaK - 1).toDouble) * two63 / col("th_a"), 4).as("est_a"),
        dround(lit((thetaK - 1).toDouble) * two63 / col("th_b"), 4).as("est_b"),
        dround(col("n_union_sketch") * two63 / theta, 4).as("est_union"),
        dround(col("n_inter_sketch") * two63 / theta, 4).as("est_inter"),
        col("x_a"), col("x_b"), col("x_union"), col("x_inter"))
  }

  val queries: Map[String, Q] = Map(
    "sk_theta" -> skTheta,
    "sk_hll" -> skHll,
    "sk_quantile" -> skQuantile,
    "sk_topk" -> skTopk,
    "sk_cms" -> skCms,
    "sk_setops" -> skSetops)

  val oracle: Map[String, String] = Map(
    // END-TO-END theta-sketch twin, no fixture (the ann_hamming/dq_dp_geo
    // discipline): the k-min selection, θ extraction, θ-cut counts, and
    // exact-integer-into-IEEE estimates all replay from the raw table
    // via the shared FNV fold
    "sk_theta" -> {
      val fold = graft.functions.TextHashes.fnvFoldSql("g3")
      s"""WITH s AS (SELECT source AS set_id, string_split(text, ' ') AS tk
         |           FROM documents WHERE source IN ('src0', 'src1')),
         | g AS (SELECT DISTINCT set_id,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS g3
         |       FROM s, LATERAL unnest(generate_series(1, len(tk)-2)) t(i)),
         | hu AS (SELECT DISTINCT set_id, (($fold) // 2)::BIGINT AS u FROM g),
         | rk AS (SELECT set_id, u,
         |          row_number() OVER (PARTITION BY set_id ORDER BY u) AS r FROM hu),
         | sk AS (SELECT set_id, u, r FROM rk WHERE r <= 256),
         | th AS (SELECT min(CASE WHEN set_id = 'src0' AND r = 256 THEN u END) AS th_a,
         |               min(CASE WHEN set_id = 'src1' AND r = 256 THEN u END) AS th_b
         |        FROM sk),
         | cut AS (SELECT u, count(*) AS nsets FROM sk, th
         |         WHERE u < least(th.th_a, th.th_b) GROUP BY u),
         | mc AS (SELECT count(*) AS n_union_sketch,
         |          CAST(sum(CASE WHEN nsets = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_inter_sketch
         |        FROM cut),
         | ex AS (SELECT count(*) AS x_union,
         |          CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT) AS x_inter
         |        FROM (SELECT u, count(*) AS ns FROM hu GROUP BY u)),
         | xab AS (SELECT CAST(sum(CASE WHEN set_id = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
         |           CAST(sum(CASE WHEN set_id = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS x_b
         |         FROM hu)
         |SELECT CAST(256 AS BIGINT) AS k, least(th.th_a, th.th_b) AS theta,
         |  mc.n_union_sketch, mc.n_inter_sketch,
         |  round(255.0 * 9223372036854775808.0 / th.th_a, 4) AS est_a,
         |  round(255.0 * 9223372036854775808.0 / th.th_b, 4) AS est_b,
         |  round(mc.n_union_sketch * 9223372036854775808.0 / least(th.th_a, th.th_b), 4) AS est_union,
         |  round(mc.n_inter_sketch * 9223372036854775808.0 / least(th.th_a, th.th_b), 4) AS est_inter,
         |  xab.x_a, xab.x_b, ex.x_union, ex.x_inter
         |FROM mc, th, ex, xab""".stripMargin
    },
    // exact side recomputed from the raw table; estimates come from the
    // engine's dumped fixture; the error column is re-derived — a
    // mis-stated exact count or fabricated err goes red
    "sk_hll" ->
      """WITH ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
        |            FROM events GROUP BY event_type),
        | est AS (SELECT event_type, n_approx
        |         FROM read_parquet('/tmp/graft_fixtures/sk_hll_est/*.parquet'))
        |SELECT ex.event_type, est.n_approx, ex.n_exact,
        |  round(abs(est.n_approx - ex.n_exact)::DOUBLE / ex.n_exact, 4) AS err_rel
        |FROM ex JOIN est USING (event_type) ORDER BY event_type""".stripMargin,
    // exact intersection recomputed via DuckDB's own semi-join; the
    // estimates come from the fixture, but inclusion–exclusion AND the
    // error column are re-derived — fabricating any of the three
    // sketch counts breaks the n_inter/err arithmetic
    "sk_setops" ->
      """WITH ex AS (
        |  SELECT count(*) AS x_inter FROM (
        |    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |    INTERSECT
        |    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')),
        | est AS (SELECT n_a, n_b, n_union
        |         FROM read_parquet('/tmp/graft_fixtures/sk_setops_est/*.parquet'))
        |SELECT est.n_a, est.n_b, est.n_union,
        |  est.n_a + est.n_b - est.n_union AS n_inter,
        |  ex.x_inter,
        |  round(abs(est.n_a + est.n_b - est.n_union - ex.x_inter)::DOUBLE
        |        / nullif(ex.x_inter, 0), 4) AS err_rel
        |FROM est CROSS JOIN ex""".stripMargin,
    // exact counts for the DUMPED top-k items recomputed from events
    // (the planted hot-key routing replayed verbatim); err re-derived
    "sk_topk" ->
      """WITH k AS (SELECT CASE WHEN event_id % 4 = 0
        |    THEN 'hot_' || (event_id % 3)::VARCHAR
        |    ELSE 'u' || user_id::VARCHAR END AS item FROM events),
        | ex AS (SELECT item, count(*) AS n_exact FROM k GROUP BY item),
        | est AS (SELECT item, n_est
        |         FROM read_parquet('/tmp/graft_fixtures/sk_topk_est/*.parquet'))
        |SELECT est.item, est.n_est, ex.n_exact,
        |  est.n_est - ex.n_exact AS err_abs
        |FROM est LEFT JOIN ex USING (item) ORDER BY item""".stripMargin,
    // full independent replay: the planted hot-key routing, the FNV
    // cell hashes, the d×w sketch counts, the min-estimates, AND the
    // error columns are all re-derived from the raw events table — a
    // wrong cell hash, a lost counter, or an understating estimate all
    // go red. (CMS can only overestimate; err_abs < 0 is impossible by
    // construction and would fail the hash.)
    "sk_cms" ->
      s"""WITH k AS (SELECT CASE WHEN event_id % 4 = 0
         |    THEN 'hot_' || (event_id % 3)::VARCHAR
         |    ELSE 'u' || user_id::VARCHAR END AS item FROM events),
         | cells AS (SELECT item, u.i AS i,
         |     (${TextHashes.fnvFoldSql("(u.i::VARCHAR || ':' || item)")}
         |      % $cmsWidth)::BIGINT AS cell
         |   FROM k, LATERAL unnest([0, 1, 2, 3]) u(i)),
         | sk AS (SELECT i, cell, count(*) AS n FROM cells GROUP BY i, cell),
         | ex AS (SELECT item, count(*) AS n_exact FROM k GROUP BY item),
         | pr AS (SELECT DISTINCT item, i, cell FROM cells),
         | est AS (SELECT item, min(n) AS n_est
         |         FROM pr JOIN sk USING (i, cell) GROUP BY item)
         |SELECT est.item, est.n_est, ex.n_exact,
         |  est.n_est - ex.n_exact AS err_abs
         |FROM est JOIN ex USING (item) ORDER BY item""".stripMargin,
    "sk_quantile" ->
      """WITH ex AS (SELECT l_returnflag,
        |              quantile_cont(l_extendedprice, 0.5) AS p50_exact,
        |              quantile_cont(l_extendedprice, 0.95) AS p95_exact
        |            FROM lineitem GROUP BY l_returnflag),
        | est AS (SELECT l_returnflag, p50_approx, p95_approx
        |         FROM read_parquet('/tmp/graft_fixtures/sk_quantile_est/*.parquet'))
        |SELECT ex.l_returnflag,
        |  round(est.p50_approx, 4) AS p50_approx,
        |  round(est.p95_approx, 4) AS p95_approx,
        |  round(ex.p50_exact, 4) AS p50_exact,
        |  round(ex.p95_exact, 4) AS p95_exact,
        |  round(abs(est.p50_approx - ex.p50_exact) / ex.p50_exact, 4) AS p50_err,
        |  round(abs(est.p95_approx - ex.p95_exact) / ex.p95_exact, 4) AS p95_err
        |FROM ex JOIN est USING (l_returnflag) ORDER BY l_returnflag""".stripMargin)
}
