package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_reshard (the shard policy's operational step — see
  * NswShardPolicySpec for the policy itself): the oracle hash-checks
  * scoring + ranking over the resharded serve's fixture; pinned here
  * is the reshard algebra — resharding the persisted graph to 2× the
  * count yields EXACTLY the graph a from-scratch build at that count
  * produces (same partitioner, same vec_id insertion order, same
  * stored unit vectors — the NswUpsertSpec independent-rebuild
  * pattern), the node set is preserved bit-for-bit, and the live
  * index is untouched. */
class NswReshardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (_, m, efB, _) = Similarity.nswTuning

  private lazy val served =
    Similarity.queries("ann_nsw_reshard")(spark, sf).collect()

  test("reshard == from-scratch build at the doubled count, row-exact") {
    served // drive the reshard; writes <idx>/reshard
    val idx = Similarity.nswIndexPathFor(sf)
    val target = Similarity.nswShardCountFor(spark, sf) * 2
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("shard", "pos", "vec_id", "ven", "adj").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getSeq[Double](3), r.getSeq[Int](4))).toSet
    val resharded = rowSet(spark.read.parquet(s"$idx/reshard/graph"))
    // independent plain-Scala rebuild at the new count: raw vectors +
    // the same shard routing, normalized and built per shard
    val rebuilt = graft.io.Sources.table(spark, sf, "embeddings")
      .select(pmod(hash(col("vec_id")), lit(target)).cast("int").as("shard"),
        col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("ve"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1).toSeq.flatMap { case (shard, rows) =>
        val sorted = rows.sortBy(_._2)
        val vecs = sorted.map(r => Similarity.NswKernel.normalize(r._3))
        val adj = Similarity.NswKernel.build(vecs, m, efB)
        sorted.indices.map(p => (shard, p, sorted(p)._2,
          vecs(p).toSeq, adj(p).toSeq))
      }.toSet
    assert(resharded.nonEmpty && resharded == rebuilt,
      s"reshard diverged from a fresh build at $target shards: " +
        s"only-reshard ${(resharded -- rebuilt).take(2).map(t => (t._1, t._2, t._3))}, " +
        s"only-rebuild ${(rebuilt -- resharded).take(2).map(t => (t._1, t._2, t._3))}")
  }

  test("node set preserved: same vec_ids, same unit vectors, more shards") {
    served
    val idx = Similarity.nswIndexPathFor(sf)
    val live = spark.read.parquet(s"$idx/graph")
    val rs = spark.read.parquet(s"$idx/reshard/graph")
    def nodes(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "ven").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1))).toSet
    assert(nodes(live) == nodes(rs), "reshard lost or altered vectors")
    val liveShards = live.select("shard").distinct().count()
    val rsShards = rs.select("shard").distinct().count()
    assert(rsShards > liveShards, s"$liveShards -> $rsShards shards")
    val meta = spark.read.parquet(s"$idx/reshard/meta").head
    assert(meta.getInt(0) == Similarity.nswShardCountFor(spark, sf) * 2)
  }

  test("the live index is untouched (reshard writes only the versioned sibling)") {
    val idx = Similarity.nswIndexPathFor(sf)
    val success = new java.io.File(s"$idx/graph/_SUCCESS")
    assert(success.exists)
    val t0 = success.lastModified
    Similarity.queries("ann_nsw_reshard")(spark, sf).collect()
    assert(success.lastModified == t0, "the reshard rewrote the live graph")
  }

  test("every probe answered at full k through the resharded serve") {
    val (_, _, nProbes, _, k) = Similarity.upsertConsts
    val byQ = served.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == nProbes)
    byQ.values.foreach(rows => assert(rows.length == k))
  }
}
