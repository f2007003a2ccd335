package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Snapshot immutability and time travel beyond the oracle hash: a
  * later append must not disturb an earlier version's readable
  * content, and reads must go through the manifest (a file group the
  * manifest doesn't list is invisible even though it sits in the same
  * tree). */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("v1 read through its manifest is stable after the v2 append") {
    val root = Snapshot.ensureTable(spark, sf)
    val v1 = Snapshot.readVersion(spark, root, 1)
      .agg(count(lit(1)), sum("value")).collect().head
    val expect = graft.io.Sources.table(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(10L)) =!= 0L)
      .agg(count(lit(1)), sum("value")).collect().head
    assert(v1 == expect, "v1 must equal the base slice even though v2 exists")
    val Seq(n1, n2) = Seq(1, 2).map(v =>
      Snapshot.readVersion(spark, root, v).count())
    assert(n2 > n1, "v2 sees the appended delta")
  }

  test("fs_changes plans from the manifest diff alone: no base-group bytes in the scan") {
    val changes = Snapshot.changesDf(spark, sf)
    val files = changes.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/files/delta")),
      s"incremental read leaked non-delta groups: ${files.mkString(",")}")
    val expect = graft.io.Sources.table(spark, sf, "events")
      .filter(pmod(col("event_id"), lit(10L)) === 0L).count()
    assert(changes.count() == expect)
  }

  test("an unlisted file group in the tree is invisible to manifest reads") {
    val root = Snapshot.ensureTable(spark, sf)
    val rogue = s"$root/files/rogue"
    graft.io.Sources.table(spark, sf, "events").limit(7)
      .write.mode("overwrite").parquet(rogue)
    val n2 = Snapshot.readVersion(spark, root, 2).count()
    val all = graft.io.Sources.table(spark, sf, "events").count()
    assert(n2 == all, s"manifest read must not pick up the rogue group ($n2 vs $all)")
  }
}
