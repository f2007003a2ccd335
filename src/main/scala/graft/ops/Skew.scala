package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture.
  *
  * AQE's skew-join splitting handles most runtime skew; these are for
  * the cases AQE can't fix: a *logical* key whose fan-out explodes
  * inside one task (e.g. a 5-value language key carrying millions of
  * candidate pairs — the dd_jaccard lesson, solved there by banding)
  * or an aggregation whose per-key state is huge.
  *
  * Salting is deterministic: the salt derives from a hash of
  * non-key columns, never from RNG (reruns must produce identical
  * partitioning for the oracle gates).
  */
object Skew {

  /** Deterministic salt in [0, n) from the hash of `from` columns. */
  def saltCol(n: Int, from: Column*): Column = pmod(xxhash64(from: _*), lit(n.toLong)).cast("int")

  /** Skew-safe equi-join of a large skewed relation against a small
    * relation: the large side gets a deterministic salt, the small side
    * is replicated once per salt value, and the join key becomes
    * (key, salt) — splitting each hot key across `salts` tasks. Result
    * equals the plain inner join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int,
      saltFrom: Seq[String]): DataFrame = {
    val salted = large.withColumn("__salt", saltCol(salts, saltFrom.map(col): _*))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt), then merge per key. For algebraic aggregates this
    * equals the direct groupBy; use when one key dominates the input
    * and a single reducer's partial-merge stream becomes the straggler. */
  def saltedSum(df: DataFrame, key: String, valueCol: String, salts: Int,
      saltFrom: Seq[String]): DataFrame =
    df.withColumn("__salt", saltCol(salts, saltFrom.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))
}
