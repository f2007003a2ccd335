package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` — membership probe against a prebuilt
  * Bloom filter, as a native codegen'd Catalyst expression (SURVEY §7.3
  * preference order (b); the same shape Spark's own runtime-filter
  * `BloomFilterMightContain` uses: the DESERIALIZED filter rides the
  * codegen reference array, so the probe is one virtual call per row —
  * no UDF serialization, no per-row deserialize, stays inside
  * whole-stage codegen).
  *
  * The filter bytes are a constructor param (the [[TokensInSetCount]]
  * pattern), built once on the driver from the SMALL relation and
  * shipped with the plan — the big probe side stays scan-local: this is
  * the semi-join-to-map-side-filter rewrite that removes the big side's
  * shuffle entirely at 100 TB. Deserialization happens once per
  * instance via the transient lazy val (re-run lazily on each executor
  * after plan serialization).
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a bigint argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFns {

  /** Build a long-keyed Bloom filter over one column, distributed
    * (Spark's `stat.bloomFilter` treeAggregate: per-partition partial
    * filters OR-merged on the driver), serialized for shipment. */
  def buildLong(df: DataFrame, colName: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The probe as a Column over a bigint hash column. */
  def mightContainLong(c: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(c), bloomBytes))
}
