package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** fs_vacuum / w17_ewma / ds_kcenter / s6_jsonl invariants beyond the
  * oracle hash. */
class LifecycleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("fs_vacuum: physical delete happened, rerun is identical, v3 survives") {
    val a = Snapshot.queries("fs_vacuum")(spark, sf).collect()
    val root = Snapshot.snapRoot(sf) + "_vac"
    // dead groups physically gone, live group present
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/files/base")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/files/delta")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/files/merged")))
    // expired manifests gone; v3 remains the readable pointer
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/manifest/v1.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/manifest/v3.json")))
    // a re-run after the delete reports the identical audit
    val b = Snapshot.queries("fs_vacuum")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val live = a.find(_.getAs[String]("grp") == "merged").get
    assert(live.getAs[Long]("n_rows") ==
      graft.io.Sources.table(spark, sf, "events").count())
  }

  test("w17_ewma: value lies in the per-user hull and matches a scalar replay") {
    val rows = Events.queries("w17_ewma")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent scalar replay for every user
    val evs = graft.io.Sources.table(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val seq = evs(u).sortBy(t => (t._2, t._3)).map(_._4)
      val expected = seq.tail.foldLeft(seq.head)((acc, x) => (0.2 * x) + (0.8 * acc))
      val got = r.getAs[Double]("ewma")
      assert(math.abs(got - expected) < 1e-6, s"user $u: $got vs $expected")
      assert(got >= seq.min - 1e-9 && got <= seq.max + 1e-9)
      assert(r.getAs[Long]("n_events") == seq.length)
    }
  }

  test("ds_kcenter: picks distinct, radius non-increasing, picks mutually spread") {
    val rows = graft.llm.Similarity.queries("ds_kcenter")(spark, sf).collect()
      .sortBy(_.getAs[Long]("sel_round"))
    assert(rows.length == 6)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
    val dists = rows.drop(1).map(_.getAs[Double]("dist_at_pick"))
    dists.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, dists.toSeq.toString)
      case _ =>
    }
    assert(dists.last > 0) // the corpus is not degenerate
  }

  test("s6_jsonl: the JSONL round trip is lossless") {
    val back = graft.io.IoQueries.queries("s6_jsonl")(spark, sf).collect()
    val orig = graft.io.Sources.table(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) => assert(b.toSeq == o.toSeq) }
  }
}
