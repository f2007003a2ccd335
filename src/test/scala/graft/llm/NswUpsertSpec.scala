package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_upsert (incremental graph-index maintenance): the oracle
  * gate hash-checks scoring + ranking over the served fixture; pinned
  * here is the maintenance algebra itself — inserting the batch into
  * the persisted shards yields EXACTLY the graph a from-scratch build
  * over corpus ∪ batch produces (every batch id sorts after every
  * corpus id, so the insertion orders coincide; the equality also pins
  * the shard-routing assumption that pmod(hash(vec_id), shards) IS the
  * build partitioner), that the upsert never rebuilds the persisted
  * index, and that every freshly-upserted twin is reachable at rank 1
  * (cosine exactly 1.0 with its probe). */
class NswUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  // engine constants read THROUGH the engine (ADVICE r15): a retune of
  // the NSW parameters or the plant must retune this rebuild with it
  private val (_, m, efB, efS) = Similarity.nswTuning
  // routing replicates the PERSISTED graph's build shard count (the
  // r18 shard policy: count is index metadata, not a session constant)
  private lazy val shards = Similarity.nswShardCountFor(spark, sf)
  private val (plantNL, upsertOffset, nProbes, _, _) = Similarity.upsertConsts
  private val plantN = plantNL

  private lazy val served = Similarity.queries("ann_nsw_upsert")(spark, sf).collect()

  test("upsert == from-scratch rebuild over corpus ∪ batch, candidate-exact") {
    served // run the engine first (dumps the fixture)
    val engineCands = spark.read.parquet("/tmp/graft_fixtures/annnswup_cands")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent plain-Scala rebuild: vectors + the same shard routing
    val emb = graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("ve"))
    val all = emb.unionByName(
        emb.filter(col("vec_id") < plantN)
          .select((col("vec_id") + upsertOffset).as("vec_id"),
            transform(col("ve"), x => x * 2.0).as("ve")))
      .select(pmod(hash(col("vec_id")), lit(shards)).cast("int").as("shard"),
        col("vec_id"), col("ve"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val probes = all.filter(r => r._2 < nProbes).sortBy(_._2)
      .map(r => (r._2, Similarity.NswKernel.normalize(r._3)))
    val rebuilt = all.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      val ids = sorted.map(_._2)
      val vecs = sorted.map(r => Similarity.NswKernel.normalize(r._3))
      val adj = Similarity.NswKernel.build(vecs, m, efB)
      Similarity.NswKernel.serve(ids, vecs, adj, probes, efS)
    }.toSet
    assert(engineCands.nonEmpty && engineCands == rebuilt,
      s"upsert diverged from rebuild: only-engine ${(engineCands -- rebuilt).take(3)}, " +
        s"only-rebuild ${(rebuilt -- engineCands).take(3)}")
  }

  test("freshness: every probe's x2 twin surfaces at rank 1 with sim 1.0") {
    val rank1 = served.filter(_.getAs[Int]("rk") == 1)
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"), r.getAs[Double]("sim")))
    assert(rank1.length == nProbes)
    rank1.foreach { case (qid, cid, sim) =>
      assert(cid == qid + upsertOffset && sim == 1.0,
        s"probe $qid: rank-1 is ($cid, $sim), want its upserted twin at 1.0")
    }
  }

  test("maintenance, not rebuild: the persisted index is untouched") {
    val success = new java.io.File(
      Similarity.nswIndexPathFor(sf) + "/graph/_SUCCESS")
    assert(success.exists)
    val t0 = success.lastModified
    Similarity.queries("ann_nsw_upsert")(spark, sf).collect()
    assert(success.lastModified == t0, "the upsert rebuilt the persisted graph")
  }
}
