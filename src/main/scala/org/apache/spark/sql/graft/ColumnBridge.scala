package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the Column internals
  * behind `private[sql]` (columns now wrap ColumnNodes); building a
  * Column from a custom Catalyst Expression goes through
  * `classic.ExpressionUtils`, which is only visible from inside the
  * `org.apache.spark.sql` package tree — hence this one-file shim
  * (the established extension-library pattern for Spark 4). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** LogicalPlan → DataFrame bridge for custom whole-operator nodes
  * (same rationale as [[ColumnBridge]]: `Dataset.ofRows` lives behind
  * `private[sql]` in the classic implementation). */
object PlanBridge {
  def dataset(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Materialize `df` hash-partitioned by `key` into EXACTLY `numParts`
    * partitions and wrap the stored rows in a LogicalRDD that DECLARES
    * that layout — a checkpoint whose partitioning downstream planning
    * can trust. Exists because neither alternative keeps the layout
    * visible (r19, measured in the LPA loops): `persist()` hides it
    * once AQE may re-partition cached plans
    * (`canChangeCachedPlanOutputPartitioning=true`, the engine's
    * config), and `localCheckpoint()` under AQE degrades to
    * `UnknownPartitioning` (the adaptive plan's partitioning does not
    * survive `LogicalRDD.fromDataset`'s rewrite) — so every consumer
    * re-exchanged rows that were already exactly where they belong.
    * The declared partitioning is correct BY CONSTRUCTION:
    * `repartition(numParts, col)` is a REPARTITION_BY_NUM shuffle,
    * which AQE never coalesces, so the physical layout is precisely
    * `HashPartitioning(key, numParts)` over the same attribute the
    * declaration references. Rows are copied out of the unsafe-row
    * reuse buffer and persisted eagerly (the localCheckpoint
    * discipline); the per-query unpersist hygiene of the bench/Verify
    * harnesses reclaims the RDD. */
  def partitionedCheckpoint(spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, key: String,
      numParts: Int): org.apache.spark.sql.DataFrame = {
    val cls = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rep = df.repartition(numParts, df(key))
    val qe = rep.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution
    val rdd = qe.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count() // eager materialization; also truncates lineage reuse
    val attrs = qe.analyzed.output
    val keyAttr = attrs.find(_.name == key).getOrElse(
      throw new IllegalArgumentException(s"partitionedCheckpoint: no column $key"))
    val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
      Seq(keyAttr), numParts)
    org.apache.spark.sql.classic.Dataset.ofRows(cls,
      org.apache.spark.sql.execution.LogicalRDD(
        attrs, rdd, part, Nil, false, None)(cls, None, None))
  }
}
