package graft.io

import org.apache.spark.sql.DataFrame

/** Result sinks (SURVEY §2.1 S3/S4).
  *
  * The reference appends one CSV row per play inside its loop with
  * header-on-create juggling (optimal_pursuit.py:256-259,568-571) —
  * which double-appends on rerun (SURVEY §7.4 gotcha 6). The engine
  * computes the whole result relation and writes it ONCE per run with
  * overwrite semantics: idempotent, atomic at the directory level, and
  * Spark owns header/partition semantics.
  */
object Sinks {

  /** S3 — result table as headered CSV (the reference's output format). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S3 — result table as parquet (the engine-native format; splittable,
    * column-pruned on re-read). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S4 — dead-letter sink (run_errors_*.csv analog): same overwrite
    * discipline; one relation per run. */
  def writeDeadLetters(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Soundness-oracle fixture dump: a query materializes an engine-
    * specific intermediate (LSH pair list, SimHash signatures) at a
    * fixed path so the DuckDB oracle can recompute the exact metric for
    * exactly those rows and re-apply the threshold — if the engine ever
    * emits an unsound row, the two result sets diverge and the gate
    * goes red (VERDICT r3 next-4 §6). Overwrite per invocation: content
    * is deterministic, so reruns are idempotent. */
  def dumpFixture(df: DataFrame, name: String): Unit =
    df.write.mode("overwrite").parquet(s"/tmp/graft_fixtures/$name")
}
