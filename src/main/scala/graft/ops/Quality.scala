package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Numeric.dround
import graft.io.Sources.table

/** Data-quality operators — the validation layer a production pipeline
  * runs BEFORE training-data jobs consume a drop: column profiling and
  * declarative constraint checks (Deequ-shaped), both as ordinary
  * aggregation plans.
  *
  * The constraint suite mixes checks that PASS and checks that FAIL on
  * this corpus (the synthetic lineitem's (orderkey, linenumber) is
  * genuinely non-unique; 13% of event values exceed the declared
  * range), so the oracle gate is falsifiable in both directions — a
  * broken counter can't hide behind all-zeroes.
  *
  * Scale shapes: each check is one aggregate over one scan (the FK
  * check is a left-anti broadcast join), and the profile computes every
  * metric for every column in a SINGLE pass — one scan, one reduce. The
  * exact `countDistinct` is the gradeable choice at sf0.01; at 100 TB
  * the same plan swaps in `approx_count_distinct` (see ops.Sketches)
  * and drops the expand. */
object Quality {

  type Q = (SparkSession, String) => DataFrame

  private val profCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  /** Column profile of lineitem's numeric measures: row count, nulls,
    * distincts, min/max — one scan, one aggregate row, unpivoted to a
    * row per column by a pure array expression. */
  private val dqProfile: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    val aggs = count(lit(1)).as("n") +: profCols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      countDistinct(col(c)).as(s"${c}_distinct"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    val one = li.agg(aggs.head, aggs.tail: _*)
    val rows = profCols.map(c => struct(
      lit(c).as("column"),
      col("n"),
      col(s"${c}_nulls").as("n_null"),
      col(s"${c}_distinct").as("n_distinct"),
      dround(col(s"${c}_min"), 4).as("min_v"),
      dround(col(s"${c}_max"), 4).as("max_v")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy("column")
  }

  /** Declarative constraint checks → (check, n_violations, status). */
  private val dqChecks: Q = (s, d) => {
    val li = table(s, d, "lineitem")
    // countDistinct over a STRUCT, not the bare column pair: the
    // multi-arg form drops rows where either key is null, while the
    // DuckDB twin's count(DISTINCT (a, b)) counts null-containing row
    // structs — a struct value is never null, so both engines agree
    // even if the corpus ever gains a null key (ADVICE r5).
    val pk = li.agg((count(lit(1)) -
        countDistinct(struct(col("l_orderkey"), col("l_linenumber")))).as("n_violations"))
      .select(lit("lineitem_pk_unique").as("check"), col("n_violations"))
    val fk = table(s, d, "orders")
      .join(table(s, d, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_custkey_fk").as("check"), col("n_violations"))
    val ev = table(s, d, "events").agg(
        sum(when(col("value") < 0 || col("value") > 100, 1L).otherwise(0L))
          .as("value_range"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("ts_null"))
    val evRows = ev.select(explode(array(
        struct(lit("events_value_in_0_100").as("check"),
          col("value_range").as("n_violations")),
        struct(lit("events_ts_nonnull").as("check"),
          col("ts_null").as("n_violations")))).as("c"))
      .select(col("c.*"))
    val docs = table(s, d, "documents")
      .agg(sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L))
        .as("n_violations"))
      .select(lit("documents_len_consistent").as("check"), col("n_violations"))
    pk.unionByName(fk).unionByName(evRows).unionByName(docs)
      .select(col("check"), col("n_violations"),
        when(col("n_violations") === 0, "pass").otherwise("fail").as("status"))
      .orderBy("check")
  }

  val queries: Map[String, Q] = Map(
    "dq_profile" -> dqProfile,
    "dq_checks" -> dqChecks)

  val oracle: Map[String, String] = Map(
    "dq_profile" -> {
      val selects = profCols.map(c =>
        s"""SELECT '$c' AS "column", count(*) AS n,
           | count(*) - count($c) AS n_null,
           | count(DISTINCT $c) AS n_distinct,
           | round(min($c), 4) AS min_v, round(max($c), 4) AS max_v
           |FROM lineitem""".stripMargin)
      selects.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    // status re-derived from the recomputed counts, so a fabricated
    // pass/fail column is impossible
    "dq_checks" ->
      """WITH v AS (
        |  SELECT 'lineitem_pk_unique' AS "check",
        |    count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_custkey_fk',
        |    -- NOT EXISTS, not NOT IN: NOT IN goes UNKNOWN-everywhere the
        |    -- moment any c_custkey is NULL, while the engine's left_anti
        |    -- (and NOT EXISTS) count real orphans regardless
        |    (SELECT count(*) FROM orders o
        |     WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                       WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'events_value_in_0_100',
        |    (SELECT count(*) FROM events WHERE value < 0 OR value > 100)
        |  UNION ALL
        |  SELECT 'events_ts_nonnull',
        |    (SELECT count(*) FROM events WHERE ts IS NULL)
        |  UNION ALL
        |  SELECT 'documents_len_consistent',
        |    (SELECT count(*) FROM documents WHERE n_chars != length(text)))
        |SELECT "check", n_violations,
        |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
        |FROM v ORDER BY "check"""".stripMargin)
}
