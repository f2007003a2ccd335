package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Tombstone compaction for the persisted NSW graph (VERDICT r16 next
  * §2): the ledger's accounting, the ranking policy biting both ways,
  * storage actually shrinking, untouched shards staying byte-identical
  * — and the semantics claim: the identical mark-delete beam over the
  * pre- and post-compaction graphs returns the same candidates (the
  * NswDeleteSpec rebuild-equality discipline, which makes compaction
  * serve-neutral at the current nswTuning; like that spec, the
  * equality is a PINNED MEASUREMENT of this corpus + tuning, with the
  * containment relaxation documented there). */
class NswCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val census =
    Similarity.queries("ann_nsw_compact")(spark, sf).collect()
  private lazy val idx = Similarity.nswIndexPathFor(sf)
  private lazy val preRows = {
    census // the query lazily builds the base graph first
    spark.read.parquet(s"$idx/graph")
      .select("shard", "pos", "vec_id", "ven", "adj").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getSeq[Double](3), r.getSeq[Int](4)))
  }
  private lazy val postRows = {
    census
    spark.read.parquet(s"$idx/graph_compact")
      .select("shard", "pos", "vec_id", "ven", "adj").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getSeq[Double](3), r.getSeq[Int](4)))
  }
  private def dead(id: Long) = Similarity.tombstonedId(id)

  test("the ranking policy bites both ways") {
    assert(census.nonEmpty)
    assert(census.exists(_.getAs[Boolean]("compacted")),
      "no shard compacted — the threshold never bit")
    assert(census.exists(r => !r.getAs[Boolean]("compacted")),
      "every shard compacted — the ranking never spared one")
  }

  test("ledger accounting and real storage shrink") {
    census.foreach { r =>
      val after = r.getAs[Long]("n_after")
      val before = r.getAs[Long]("n_before")
      val nd = r.getAs[Long]("n_dead")
      if (r.getAs[Boolean]("compacted"))
        assert(after == before - nd, s"compacted shard kept garbage: $r")
      else assert(after == before, s"uncompacted shard changed size: $r")
    }
    assert(postRows.length < preRows.length,
      "the sweep wrote no smaller graph")
    assert(postRows.length ==
      census.map(_.getAs[Long]("n_after")).sum.toInt)
  }

  test("compacted shards: live-only, insertion order preserved, adjacency in range") {
    val compacted = census.filter(_.getAs[Boolean]("compacted"))
      .map(_.getAs[Int]("shard")).toSet
    val postBy = postRows.groupBy(_._1)
    val preBy = preRows.groupBy(_._1)
    compacted.foreach { sh =>
      val ps = postBy(sh).sortBy(_._2)
      assert(ps.forall(r => !dead(r._3)), s"dead node survived the sweep in shard $sh")
      // original insertion order: live ids in pre-pos order
      val wantIds = preBy(sh).sortBy(_._2).map(_._3).filterNot(dead)
      assert(ps.map(_._3).sameElements(wantIds),
        s"compacted shard $sh reordered its live nodes")
      assert(ps.map(_._2).sameElements(ps.indices), s"positions not reindexed in $sh")
      ps.foreach(r => assert(r._5.forall(p => p >= 0 && p < ps.length),
        s"adjacency out of range in rebuilt shard $sh"))
    }
  }

  test("untouched shards are row-identical to the base graph") {
    val spared = census.filter(r => !r.getAs[Boolean]("compacted"))
      .map(_.getAs[Int]("shard")).toSet
    val postBy = postRows.groupBy(_._1)
    val preBy = preRows.groupBy(_._1)
    spared.foreach { sh =>
      val a = preBy(sh).sortBy(_._2)
      val b = postBy(sh).sortBy(_._2)
      assert(a.length == b.length, s"spared shard $sh changed size")
      a.zip(b).foreach { case (x, y) =>
        assert(x._2 == y._2 && x._3 == y._3 && x._4 == y._4 && x._5 == y._5,
          s"spared shard $sh row diverged at pos ${x._2}")
      }
    }
  }

  test("serve-neutral: identical mark-delete beam over pre and post graphs") {
    census
    def serveSet(path: String) =
      Similarity.nswServeLiveCandsOn(spark, sf,
          spark.read.parquet(path), id => !Similarity.tombstonedId(id))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = serveSet(s"$idx/graph")
    val after = serveSet(s"$idx/graph_compact")
    assert(before == after,
      s"compaction changed the served candidates: only-pre " +
        s"${(before -- after).take(3)}, only-post ${(after -- before).take(3)}")
  }
}
