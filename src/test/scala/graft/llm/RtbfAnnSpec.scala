package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dq_rtbf_ann (erasure across the persisted ANN indexes, VERDICT r17
  * next §5): the oracle hash-checks the compliance ledger; pinned here
  * are the claims the ledger cannot carry — forgotten vec_ids are
  * neither STORED in nor SERVED from the scrubbed graph, the live
  * indexes other gates byte-compare stay untouched, the scrubbed
  * serve still answers (erasure must not brick the index), and the
  * scrub is idempotent. */
class RtbfAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def forgotten(id: Long): Boolean = id % 20 == 5

  private lazy val ledger =
    Similarity.queries("dq_rtbf_ann")(spark, sf).collect()

  test("ledger bites: touching-before counts the plant, touching-after is zero") {
    val emb = graft.io.Sources.table(spark, sf, "embeddings")
    val n = emb.count()
    val t = emb.filter(col("vec_id") % 20 === 5).count()
    assert(t > 0, "an empty deletion list would make every claim vacuous")
    assert(ledger.length == 3)
    ledger.foreach { r =>
      assert(r.getAs[Long]("n_before") == n, r.toString)
      assert(r.getAs[Long]("n_touching_before") == t, r.toString)
      assert(r.getAs[Long]("n_after") == n - t, r.toString)
      assert(r.getAs[Long]("n_touching_after") == 0L, r.toString)
    }
  }

  test("zero retention: no forgotten vec_id in any written relation") {
    ledger // run the scrub
    val ivf = Similarity.ensureIvfIndexFor(spark, sf)
    val pq = Similarity.ensurePqIndexFor(spark, sf)
    val nsw = Similarity.nswIndexPathFor(sf)
    Seq(s"$ivf/rtbf/assignments", s"$pq/rtbf/codes", s"$nsw/rtbf/graph")
      .foreach { p =>
        val kept = spark.read.parquet(p)
          .filter(col("vec_id") % 20 === 5).count()
        assert(kept == 0L, s"$p retains $kept forgotten vectors")
      }
    // the NSW scrub is a HARD removal, not a tombstone: the vector
    // bytes are gone from the written relation, and no adjacency can
    // point at a removed node (positions reindex on rebuild)
    val g = spark.read.parquet(s"$nsw/rtbf/graph")
    import spark.implicits._
    g.select(col("shard"), col("pos"), col("adj"))
      .as[(Int, Int, Seq[Int])].collect()
      .groupBy(_._1).foreach { case (shard, rows) =>
        val nShard = rows.length
        rows.foreach { case (_, _, adj) =>
          adj.foreach(p => assert(p >= 0 && p < nShard,
            s"shard $shard: adjacency points outside the rebuilt graph"))
        }
      }
  }

  test("live indexes are untouched (the scrub writes only versioned siblings)") {
    val nsw = Similarity.nswIndexPathFor(sf)
    val success = new java.io.File(s"$nsw/graph/_SUCCESS")
    assert(success.exists)
    val t0 = success.lastModified
    Similarity.queries("dq_rtbf_ann")(spark, sf).collect()
    assert(success.lastModified == t0, "the scrub rewrote the live graph")
  }

  test("the scrubbed graph serves, and never serves a forgotten id") {
    ledger
    val nsw = Similarity.nswIndexPathFor(sf)
    val scrubbed = spark.read.parquet(s"$nsw/rtbf/graph")
    val cands = Similarity.nswServeCandsOn(spark, sf, scrubbed).collect()
    assert(cands.nonEmpty, "erasure must not brick the index")
    cands.foreach { r =>
      assert(!forgotten(r.getAs[Long]("cid")),
        s"forgotten id served post-scrub: $r")
    }
  }

  test("idempotent: re-running the scrub reproduces the ledger exactly") {
    val first = ledger.map(_.toString).toSeq
    val second = Similarity.queries("dq_rtbf_ann")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(first == second)
  }
}
