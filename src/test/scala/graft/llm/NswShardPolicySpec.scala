package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The r18 shard-count policy (VERDICT r17 next §1): the r17 scale
  * probe measured per-shard NSW build cost growing ≈ n^1.4 under the
  * fixed 8-shard layout, so the engine now picks
  * shards = clamp(ceil(n / target), minShards, max(minShards, parallelism))
  * at build time and persists the choice as index metadata (the
  * routing function pmod(hash(vec_id), shards) must be shared by every
  * later insert, and the corpus size that chose it may have moved).
  * Pinned here: the policy algebra, that the floor keeps the gated sf
  * corpora on their historical 8-shard layout (so every NSW fixture
  * and routing spec is unchanged by construction), and that the
  * persisted meta agrees with both the policy and the stored rows. */
class NswShardPolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (minShards, _, _, _) = Similarity.nswTuning

  test("policy algebra: floor, target scaling, and parallelism cap") {
    // the gated corpora sit under the floor: historical layout preserved
    assert(Similarity.nswShardsFor(500, 32) == minShards)
    assert(Similarity.nswShardsFor(2000, 32) == minShards)
    // the r17 100x probe corpus (200k) still floors at 8
    assert(Similarity.nswShardsFor(200000, 32) == minShards)
    // the r17 1000x probe corpus (2M): exactly 32 shards at 62.5k target
    assert(Similarity.nswShardsFor(2000000, 32) == 32)
    // target binds below the cap
    assert(Similarity.nswShardsFor(2000000, 64) == 32)
    // cap binds once ceil(n/target) exceeds parallelism
    assert(Similarity.nswShardsFor(100000000L, 32) == 32)
    assert(Similarity.nswShardsFor(100000000L, 256) == 256)
    // monotone non-decreasing in n at fixed parallelism
    val curve = Seq(1L, 2000L, 62500L, 125000L, 500000L, 2000000L, 8000000L)
      .map(Similarity.nswShardsFor(_, 32))
    assert(curve == curve.sorted, s"non-monotone shard curve: $curve")
    // degenerate corpora still get the parallel floor, never zero
    assert(Similarity.nswShardsFor(0, 32) == minShards)
  }

  test("persisted meta == policy choice, and routing matches stored rows") {
    val idx = Similarity.ensureNswIndexFor(spark, sf)
    val stored = Similarity.nswShardCountFor(spark, sf)
    val n = spark.read.parquet(s"$idx/meta").select("n_vectors").head.getLong(0)
    assert(stored ==
      Similarity.nswShardsFor(n, spark.sparkContext.defaultParallelism))
    // every stored row's shard id IS pmod(hash(vec_id), meta count) —
    // the build partitioner and the insert router are the same function
    val mismatched = spark.read.parquet(s"$idx/graph")
      .filter(col("shard") =!=
        pmod(hash(col("vec_id")), lit(stored)).cast("int"))
      .count()
    assert(mismatched == 0, s"$mismatched rows route away from their shard")
  }
}
