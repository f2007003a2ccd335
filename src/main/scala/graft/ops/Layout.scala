package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Sources.table

/** Z-order (Morton-curve) data layout — the multi-dimension scan-
  * pruning story at 100 TB. A table sorted on ONE key prunes row
  * groups perfectly on that key and not at all on any other; a
  * z-order-clustered layout interleaves the bits of several quantized
  * dimensions so that every written file covers a small RANGE OF EACH
  * dimension at once, and parquet min/max footer statistics then prune
  * most row groups for predicates on ANY of the clustered dimensions
  * (the Delta/Iceberg `ZORDER BY` mechanism, built here from plain
  * Spark expressions: rank-quantize → bit-interleave →
  * `repartitionByRange` + `sortWithinPartitions` on the z-value).
  *
  * Everything is distributed: the per-dimension min/max come from a
  * one-row aggregate broadcast back via crossJoin (the a15_equidepth
  * pattern), the z-value is a codegen'd integer expression, and the
  * write is a range shuffle on the z-value — no driver-side collect.
  *
  * Layout is semantics-free, so the gate is the j9 pattern: the
  * driver query writes the clustered copy, reads it back through a
  * two-dimension selective predicate, and must reproduce DuckDB's
  * answer on the RAW table byte-for-byte. The pruning itself is
  * measured by `tools/ZorderProbe` (parquet footer min/max overlap
  * counts per layout × predicate) and pinned by `LayoutSpec`'s
  * per-file span assertions.
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** Bits per dimension; 2 dims × 16 bits fill a 32-bit z-value. */
  private val zBits = 16
  private val zMax = (1L << zBits) - 1

  /** Quantize a long dimension into [0, 2^zBits) given its global
    * bounds (degenerate span → 0). */
  private[ops] def quantize(c: Column, mn: Column, mx: Column): Column = {
    val span = (mx - mn).cast("double")
    when(span <= 0d, lit(0L)).otherwise(
      least(lit(zMax),
        floor((c - mn).cast("double") / span * zMax).cast("long")))
  }

  /** Morton interleave of pre-quantized dims: bit b of dim i lands at
    * position b·d + i, so high bits alternate across dimensions and
    * nearby z-values are nearby in EVERY dimension. Unrolled fold —
    * 32 codegen'd shift/or terms for two dims. */
  private[ops] def interleave(q: Seq[Column]): Column = {
    val d = q.size
    (0 until zBits).foldLeft(lit(0L)) { (acc, b) =>
      q.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(
          shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * d + i))
      }
    }
  }

  /** Write a z-order-clustered parquet copy of `df` by the given
    * numeric/timestamp dimensions (timestamps cluster at second
    * granularity via the long cast). `files` bounds the range-shuffle
    * width — at 100 TB this is the job's output-file budget, and the
    * one-row stats aggregate + broadcast is unchanged. */
  def zorderWrite(df: DataFrame, dims: Seq[String], out: String,
      files: Int): Unit = {
    val aggs = dims.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__mn_$c"),
      max(col(c).cast("long")).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val q = dims.map(c =>
      quantize(col(c).cast("long"), col(s"__mn_$c"), col(s"__mx_$c")))
    df.crossJoin(broadcast(stats))
      .withColumn("__zv", interleave(q))
      .repartitionByRange(files, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop(dims.map(c => s"__mn_$c") ++ dims.map(c => s"__mx_$c") :+ "__zv": _*)
      .write.mode("overwrite").parquet(out)
  }

  /** The z-order layout op end-to-end: cluster `events` by
    * (user_id, ts), then answer a user-slice × time-slice predicate
    * from the clustered copy. Results must be layout-invariant — the
    * oracle runs the same predicate on the raw table. */
  private val zoEvents: Q = (s, d) => {
    // injective path derivation (VERDICT r6 §6): the sanitized dir
    // string itself keys the output — a hashCode collision between two
    // corpus dirs would have silently served the wrong clustered copy
    val key = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val out = s"/tmp/graft_zorder/$key/events.parquet"
    zorderWrite(table(s, d, "events"), Seq("user_id", "ts"), out, 8)
    s.read.parquet(out)
      .filter(col("user_id").between(3, 9) &&
        col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-14").cast("timestamp"))
      .select(col("event_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map("zo_events" -> zoEvents)

  val oracle: Map[String, String] = Map(
    // Layout is semantics-free: DuckDB answers the predicate on the
    // RAW events table; the engine must reproduce it from the
    // z-ordered copy exactly (a dropped row, a doubled row, or a
    // mangled value in the rewrite all turn the hash red).
    "zo_events" ->
      """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |  user_id, event_type, value
        |FROM events
        |WHERE user_id BETWEEN 3 AND 9
        |  AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-14'
        |ORDER BY event_id""".stripMargin)
}
