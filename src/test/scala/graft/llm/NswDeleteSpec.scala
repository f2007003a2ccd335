package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** ann_nsw_delete (tombstoned deletes for the persisted NSW graph —
  * VERDICT r15 next §3): the oracle gate hash-checks scoring + ranking
  * over the served fixture with the tombstone predicate re-applied;
  * pinned here is the delete algebra itself — (1) soundness: no dead id
  * ever surfaces, from the candidate fixture up; (2) falsifiability:
  * the tombstoned ids WERE in the pre-delete top-k, so the delete
  * demonstrably changes membership; (3) the mark-delete serve (dead
  * nodes route, never surface) returns exactly the top-k a from-scratch
  * rebuild over the live vectors serves — deletion loses nothing the
  * expensive path would keep; (4) the persisted graph is untouched
  * (O(1) metadata delete, the ann_ivf_delete discipline); (5) the
  * Column and scalar forms of the tombstone predicate agree. */
class NswDeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val (_, m, efB, efS) = Similarity.nswTuning
  // routing replicates the PERSISTED graph's build shard count (the
  // r18 shard policy: count is index metadata, not a session constant)
  private lazy val shards = Similarity.nswShardCountFor(spark, sf)
  private val (plantN, _, nProbes, _, kNeighbors) = Similarity.upsertConsts

  private lazy val served = Similarity.queries("ann_nsw_delete")(spark, sf).collect()

  test("tombstone predicate: Column and scalar forms agree") {
    import spark.implicits._
    val ids = (0L until plantN + 16L).toDF("id")
    val viaColumn = ids.filter(Similarity.isTombstoned(col("id")))
      .collect().map(_.getLong(0)).toSet
    val viaScalar = (0L until plantN + 16L).filter(Similarity.tombstonedId).toSet
    assert(viaColumn == viaScalar)
  }

  test("soundness: no tombstoned id in the top-k nor in the candidate fixture") {
    served // run the engine first (dumps the fixture)
    assert(served.nonEmpty)
    served.foreach { r =>
      assert(!Similarity.tombstonedId(r.getAs[Long]("cid")),
        s"dead id ${r.getAs[Long]("cid")} surfaced in the top-k")
    }
    val fixtureCids = spark.read.parquet("/tmp/graft_fixtures/annnswdel_cands")
      .collect().map(_.getAs[Long]("cid"))
    assert(fixtureCids.nonEmpty && !fixtureCids.exists(Similarity.tombstonedId),
      "a dead id leaked into the served candidate ring")
  }

  test("falsifiability: the delete changes pre-delete top-k membership") {
    val before = Similarity.queries("ann_nsw_serve")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
    val deadBefore = before.filter(p => Similarity.tombstonedId(p._2))
    assert(deadBefore.nonEmpty,
      "gate cannot fail: no tombstoned id was in the pre-delete top-k")
    val after = served.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))).toSet
    deadBefore.foreach { case (qid, cid) =>
      assert(!after.contains((qid, cid)))
    }
  }

  test("delete-serve top-k == from-scratch rebuild over the live vectors") {
    // PINNED MEASUREMENT, not a structural theorem (ADVICE r16): the
    // mark-delete graph and the live-only rebuild are DIFFERENT graphs,
    // so equal top-k is an empirical fact of the current nswTuning
    // (small shards, near-exhaustive ef) + this corpus — exactly the
    // configuration the gated query certifies. If a deliberate retune
    // (smaller ef, larger M, bigger corpus) flips this, relax to the
    // containment floor (rebuilt top-k ⊆ mark-delete candidates, which
    // CandsSpec-style checks pin) rather than chasing exact equality;
    // until then the exact pin is the strongest available regression
    // tripwire for the delete path.
    served
    // independent plain-Scala rebuild: live vectors only, same shard
    // routing (pmod(hash(vec_id), shards) — the build partitioner),
    // plain all-live beam serve, exact-cosine rerank
    val emb = graft.io.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("ve"))
    val rows = emb
      .select(pmod(hash(col("vec_id")), lit(shards)).cast("int").as("shard"),
        col("vec_id"), col("ve"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
    val byId = rows.map(r => r._2 -> r._3.toArray).toMap
    val probes = rows.filter(_._2 < nProbes).sortBy(_._2)
      .map(r => (r._2, Similarity.NswKernel.normalize(r._3)))
    val live = rows.filterNot(r => Similarity.tombstonedId(r._2))
    val cands = live.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      val ids = sorted.map(_._2)
      val vecs = sorted.map(r => Similarity.NswKernel.normalize(r._3))
      val adj = Similarity.NswKernel.build(vecs, m, efB)
      Similarity.NswKernel.serve(ids, vecs, adj, probes, efS)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val rebuiltTopk = cands.groupBy(_._1).toSeq.flatMap { case (qid, ps) =>
      ps.map(_._2).distinct
        .map(cid => (cid, cos(byId(qid), byId(cid))))
        .sortBy { case (cid, sim) => (-sim, cid) }
        .take(kNeighbors).zipWithIndex
        .map { case ((cid, _), i) => (qid, i + 1, cid) }
    }.toSet
    val engineTopk = served
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rk"), r.getAs[Long]("cid"))).toSet
    assert(engineTopk == rebuiltTopk,
      s"delete-serve diverged from live rebuild: only-engine " +
        s"${(engineTopk -- rebuiltTopk).take(3)}, only-rebuild " +
        s"${(rebuiltTopk -- engineTopk).take(3)}")
  }

  test("maintenance, not rebuild: the persisted graph is untouched") {
    val success = new java.io.File(
      Similarity.nswIndexPathFor(sf) + "/graph/_SUCCESS")
    served
    assert(success.exists)
    val t0 = success.lastModified
    Similarity.queries("ann_nsw_delete")(spark, sf).collect()
    assert(success.lastModified == t0, "the delete rebuilt the persisted graph")
  }
}
