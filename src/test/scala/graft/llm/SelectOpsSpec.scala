package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Invariants for the round-8 selection/maintenance operators beyond
  * the oracle hash: each Gopher rule must be individually live on the
  * corpus (a rule that never fires is untested code), the DSIR score
  * must actually separate the target domain from the raw pool, and the
  * IVF tombstone serve must both exclude every deleted id and surface
  * replacement neighbors from the same cells. */
class SelectOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ts_gopher: per-rule verdicts are live, consistent, and conjoin into the flag") {
    val rows = TextOps.queries("ts_gopher")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the word-count window must actually split this corpus (10..99
    // words straddle the 50 bound) — a rule that never fires is
    // untested code
    assert(rows.map(_.getAs[Boolean]("rule_words")).toSet == Set(true, false))
    rows.foreach { r =>
      val mwl = r.getAs[Double]("mean_wlen")
      val af = r.getAs[Double]("alpha_frac")
      assert(mwl > 0 && mwl < 50, r.toString)
      assert(af >= 0.0 && af <= 1.0, r.toString)
      assert(r.getAs[Double]("sym_ratio") == 0.0, "corpus has no #/ellipsis")
      assert(r.getAs[Long]("n_stop_kinds") <= 8)
      // this synthetic vocabulary carries only 'the' from Gopher's
      // stop set, so the stop rule rejects every doc here — the rule
      // column documents that instead of hiding it in the conjunction
      assert(!r.getAs[Boolean]("rule_stop"), r.toString)
      // rule columns must be consistent with the (rounded) stats; the
      // sf0.001 corpus sits nowhere near a 1e-4 rounding band
      assert(r.getAs[Boolean]("rule_words") ==
        (r.getAs[Long]("n_words") >= 50 && r.getAs[Long]("n_words") <= 100000), r.toString)
      assert(r.getAs[Boolean]("rule_wlen") == (mwl >= 3.0 && mwl <= 10.0), r.toString)
      assert(r.getAs[Boolean]("rule_alpha") == (af >= 0.8), r.toString)
      val conj = r.getAs[Boolean]("rule_words") && r.getAs[Boolean]("rule_wlen") &&
        r.getAs[Boolean]("rule_sym") && r.getAs[Boolean]("rule_alpha") &&
        r.getAs[Boolean]("rule_stop")
      assert((r.getAs[String]("gopher_flag") == "keep") == conj, r.toString)
    }
  }

  test("ds_dsir: target-domain docs score higher than the raw pool on average") {
    val rows = Curate.queries("ds_dsir")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (t, r) = rows.partition(_.getAs[String]("source") == "src0")
    assert(t.nonEmpty && r.nonEmpty)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val mt = mean(t.map(_.getAs[Double]("logw")))
    val mr = mean(r.map(_.getAs[Double]("logw")))
    assert(mt > mr, s"target mean $mt must exceed raw mean $mr")
    // and the keep flag is exactly the sign of the score
    rows.foreach { row =>
      assert((row.getAs[String]("dsir_flag") == "keep") == (row.getAs[Double]("logw") > 0),
        row.toString)
    }
  }

  test("ds_shuffle: each epoch is a full permutation and epochs reorder") {
    val rows = Curate.queries("ds_shuffle")(spark, sf).collect()
    val nDocs = graft.io.Sources.table(spark, sf, "documents").count()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1))
    byEpoch.foreach { case (_, rs) =>
      assert(rs.length == nDocs, "every doc exactly once per epoch")
      assert(rs.map(_.getAs[Long]("doc_id")).toSet.size == nDocs)
      // positions are contiguous 1..k within each shard
      rs.groupBy(_.getAs[Long]("shard")).foreach { case (_, ss) =>
        assert(ss.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to ss.length).toSeq)
      }
    }
    def order(e: Int) = byEpoch(e)
      .sortBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(order(0) != order(1), "epochs must produce different permutations")
  }

  test("ann_ivf_delete: no tombstoned id is served, replacements surface") {
    val del = Similarity.queries("ann_ivf_delete")(spark, sf).collect()
    val base = Similarity.queries("ann_ivf")(spark, sf).collect()
    assert(del.nonEmpty && base.nonEmpty)
    def l(r: org.apache.spark.sql.Row, c: String): Long =
      r.getAs[Number](c).longValue()
    del.foreach { r =>
      val cid = l(r, "cid")
      assert(!(cid < 64 && cid % 3 == 0), s"tombstoned id served: $r")
    }
    // the planted ids seed near-dup neighborhoods, so deleting a third
    // of them must change at least one (qid, rk) -> cid assignment
    val baseMap = base.map(r => (l(r, "qid"), l(r, "rk")) -> l(r, "cid")).toMap
    val changed = del.exists { r =>
      baseMap.get((l(r, "qid"), l(r, "rk"))).exists(_ != l(r, "cid"))
    }
    assert(changed, "top-k membership must change after deletes")
    // every query still gets a full top-k (the cells were not emptied)
    val perQ = del.groupBy(r => l(r, "qid")).map(_._2.length)
    assert(perQ.forall(_ == 3), perQ.toString)
  }
}
