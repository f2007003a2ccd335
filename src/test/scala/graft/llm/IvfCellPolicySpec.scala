package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r18 IVF cell-count policy (the NswShardPolicySpec shape for
  * the coarse quantizer): nlist = clamp(pow2floor(sqrt(n/8)), 16,
  * 4096) chosen at build time — the stored centroid relation is the
  * persisted form, so downstream serving reads whatever count was
  * built. Pinned: the policy algebra, that the floor keeps the gated
  * sf corpora on their historical 16-cell layout (fixtures, the
  * ann_tune knee, and the recall-gate pins unchanged by
  * construction), and that the built index agrees with the policy. */
class IvfCellPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("policy algebra: floor, sqrt scaling, pow2 steps, cap") {
    // the gated corpora sit under the floor: historical layout preserved
    assert(Similarity.ivfCellsFor(500) == 16)
    assert(Similarity.ivfCellsFor(2000) == 16)
    // the scale-probe corpora: 100x -> 128 cells, 1000x -> 256
    assert(Similarity.ivfCellsFor(200000) == 128)
    assert(Similarity.ivfCellsFor(2000000) == 256)
    // the cap binds at billion scale
    assert(Similarity.ivfCellsFor(1000000000L) == 4096)
    // monotone non-decreasing
    val curve = Seq(500L, 2000L, 50000L, 200000L, 2000000L, 100000000L)
      .map(Similarity.ivfCellsFor)
    assert(curve == curve.sorted, s"non-monotone cell curve: $curve")
    // pow2 counts only (stability under corpus drift)
    curve.foreach(c => assert((c & (c - 1)) == 0, s"$c is not a power of two"))
  }

  test("the built index's centroid count == the policy choice") {
    val idx = Similarity.ensureIvfIndexFor(spark, sf)
    val nCells = spark.read.parquet(s"$idx/centroids").count()
    val n = graft.io.Sources.table(spark, sf, "embeddings").count()
    assert(nCells == Similarity.ivfCellsFor(n),
      s"index has $nCells cells, policy says ${Similarity.ivfCellsFor(n)} for $n vectors")
    // and every assignment routes to a stored centroid
    val maxCl = spark.read.parquet(s"$idx/assignments")
      .agg(org.apache.spark.sql.functions.max("cl")).head.getInt(0)
    assert(maxCl < nCells)
  }
}
