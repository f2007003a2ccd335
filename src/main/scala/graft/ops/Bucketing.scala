package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join technique for repeated
  * large⋈large joins (builder brief: "repartition()/bucketing for
  * co-located joins").
  *
  * Writing both sides bucketed (and sorted) by the join key means every
  * subsequent join on that key reads pre-partitioned, pre-sorted data:
  * the sort-merge join plans with NO Exchange and NO Sort — at 100 TB
  * that removes the single largest cost of a fact⋈fact join, paid once
  * at write time instead of per query. Verified exchange-free in
  * BucketingSpec.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedBy(df, table, buckets, Seq(key))

  /** Composite-key variant: bucket AND sort by `keys` (e.g. the
    * (gameId, playId) play key). All rows of one key value land in one
    * bucket file per writer task; the bucketed scan reassembles each
    * bucket into exactly one partition, so per-key work downstream can
    * run partition-local with no Exchange. */
  def writeBucketedBy(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key: co-located, shuffle-free. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
